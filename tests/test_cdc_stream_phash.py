"""Tests: streaming CDC apply (changelog_stream_sink) pinned against
batch compact_changelog, and the media_phash kernel."""

import hashlib

from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.merge import compact_changelog
from p2_mapreduce_spark.operators.multimodal import (
    attach_binary,
    media_phash,
)
from p2_mapreduce_spark.session import load_table
from p2_mapreduce_spark.streaming.sinks import (
    changelog_stream_sink,
    fold_changelog_batch,
    load_compacted,
)

LOG_SCHEMA = "k long, payload string, version int, op string"


def _batch_rows():
    # three "arrival waves" with a late lower-version upsert after a
    # delete (must stay dead) and a late higher-version upsert (revives)
    return [
        [(1, "a1", 1, "upsert"), (2, "b1", 1, "upsert"), (3, "c1", 1, "upsert")],
        [(1, "a2", 2, "upsert"), (2, "b-del", 3, "delete")],
        [(2, "late-low", 2, "upsert"), (3, "c2", 4, "upsert")],
    ]


class TestChangelogStreamSink:
    def test_stream_equals_batch_compaction(self, spark, tmp_path):
        waves = _batch_rows()
        src = str(tmp_path / "src")
        # one parquet file per wave + maxFilesPerTrigger=1 => one
        # micro-batch per wave in file order is NOT guaranteed; instead
        # drive the fold directly in wave order (the sink wiring itself
        # is exercised below)
        state = str(tmp_path / "state")
        for i, rows in enumerate(waves):
            fold_changelog_batch(
                spark.createDataFrame(rows, LOG_SCHEMA), i, state, ["k"]
            )
        got = sorted(
            map(tuple, load_compacted(spark, state).drop("op", "version").collect())
        )
        all_rows = [r for w in waves for r in w]
        want = sorted(
            map(
                tuple,
                compact_changelog(
                    spark.createDataFrame(all_rows, LOG_SCHEMA), ["k"]
                )
                .drop("op", "version")
                .collect(),
            )
        )
        assert got == want
        assert got == [(1, "a2"), (3, "c2")]  # 2 stays tombstoned

    def test_replay_overwrites_not_refolds(self, spark, tmp_path):
        waves = _batch_rows()
        state = str(tmp_path / "state")
        for i, rows in enumerate(waves):
            fold_changelog_batch(
                spark.createDataFrame(rows, LOG_SCHEMA), i, state, ["k"]
            )
        once = sorted(map(tuple, load_compacted(spark, state).collect()))
        # replay the last wave (crash between sink commit and checkpoint)
        fold_changelog_batch(
            spark.createDataFrame(waves[-1], LOG_SCHEMA), 2, state, ["k"]
        )
        twice = sorted(map(tuple, load_compacted(spark, state).collect()))
        assert once == twice

    def test_streaming_wiring_end_to_end(self, spark, tmp_path):
        # actual readStream -> foreachBatch -> state path; batch split
        # arbitrary (fold is associative, result must match regardless)
        all_rows = [r for w in _batch_rows() for r in w]
        df = spark.createDataFrame(all_rows, LOG_SCHEMA)
        src = str(tmp_path / "src")
        df.repartition(3).write.mode("overwrite").parquet(src)
        state = str(tmp_path / "state")
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = changelog_stream_sink(stream, state, str(tmp_path / "ckpt"), ["k"])
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(map(tuple, load_compacted(spark, state).drop("op", "version").collect()))
        assert got == [(1, "a2"), (3, "c2")]


class TestMediaPhash:
    def test_matches_python_kernel(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").limit(20)
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        got = {
            r["media_id"]: r["phash"]
            for r in media_phash(attach_binary(docs)).collect()
        }
        for mid, text in texts.items():
            base = hashlib.sha256(text.encode()).hexdigest()
            grid = hashlib.sha256((base + ":grid").encode()).digest()
            tot = sum(grid)
            exp = sum(1 << i for i, bv in enumerate(grid) if 32 * bv > tot)
            assert got[mid] == exp

    def test_equal_payloads_equal_phash(self, spark):
        rows = [
            (1, "same text", "en", "s", 9),
            (2, "same text", "en", "s", 9),
            (3, "other", "en", "s", 5),
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = {r["media_id"]: r["phash"] for r in media_phash(attach_binary(df)).collect()}
        assert out[1] == out[2] != out[3]
