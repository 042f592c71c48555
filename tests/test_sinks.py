"""Compaction + idempotent streaming-sink tests (sources/writers.py,
streaming/sinks.py)."""

import glob

from pyspark.sql import functions as F

from p2_mapreduce_spark.session import load_table
from p2_mapreduce_spark.sources.writers import compact_parquet
from p2_mapreduce_spark.streaming.sinks import windowed_upsert_sink


def test_compaction_collapses_small_files(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    src = str(tmp_path / "frag")
    li.repartition(40).write.mode("overwrite").parquet(src)
    assert len(glob.glob(f"{src}/part-*")) == 40

    dst = str(tmp_path / "compact")
    n = compact_parquet(spark, src, dst, target_file_mb=128)
    assert n == 1
    assert len(glob.glob(f"{dst}/part-*")) == 1
    assert spark.read.parquet(dst).count() == li.count()


def test_compaction_splits_to_target_and_sorts(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    big = li
    for _ in range(4):
        big = big.union(big)  # 16x rows → a few MB on disk
    src = str(tmp_path / "big")
    big.repartition(30).write.mode("overwrite").parquet(src)

    dst = str(tmp_path / "sorted")
    n = compact_parquet(spark, src, dst, target_file_mb=1, sort_by=["l_orderkey"])
    assert n >= 2
    assert len(glob.glob(f"{dst}/part-*")) == n
    out = spark.read.parquet(dst)
    assert out.count() == big.count()
    # range partitioning by the sort key → per-file key ranges are disjoint
    per_file = (
        out.select("l_orderkey", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next, f"overlapping file key ranges: {spans}"


def test_windowed_upsert_sink_rewrites_only_touched_buckets(spark, sf_dir, tmp_path):
    """Two micro-batches of hourly counts; the final table must equal the
    batch aggregate, arriving through per-bucket dynamic overwrites."""
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev_src")
    events.repartition(2).write.mode("overwrite").parquet(src)

    def agg(df):
        return (
            df.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.date_format(F.col("w.start"), "yyyyMMddHH").alias("bucket"),
                "n_events",
            )
        )

    out, ckpt = str(tmp_path / "mat"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    from p2_mapreduce_spark.streaming.events import as_event_time

    q = windowed_upsert_sink(
        agg(as_event_time(stream).withWatermark("ts", "0 seconds")), out, ckpt, "bucket"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # hive partition-column type inference reads the bucket back as int
    got = {
        str(r["bucket"]): r["n_events"] for r in spark.read.parquet(out).collect()
    }
    expected = {r["bucket"]: r["n_events"] for r in agg(events).collect()}
    assert got == expected


def test_audited_write_reports_metrics_in_one_pass(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.session import load_table
    from p2_mapreduce_spark.sources.writers import write_parquet_audited

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    want_rows = li.count()
    want_qty = li.agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
    ).collect()[0][0]
    out = str(tmp_path / "audited")
    got = write_parquet_audited(
        li,
        out,
        metrics={
            "n_rows": F.count(F.lit(1)),
            "sum_qty": F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast(
                "double"
            ),
        },
    )
    assert got["n_rows"] == want_rows
    assert got["sum_qty"] == want_qty
    assert spark.read.parquet(out).count() == want_rows


def test_schema_evolution_merge_read(spark, tmp_path):
    """Evolving a dataset by adding a column must not strand old files:
    mergeSchema reconciles v1 (no column) and v2 (new column) footers
    into one schema with NULLs for the missing values — the standard
    parquet schema-evolution contract a long-lived 100 TB dataset relies
    on (per-file footers differ; the union schema is computed at read)."""
    import pyspark.sql.functions as F

    base = str(tmp_path / "evolving")
    v1 = spark.range(3).select(F.col("id").alias("k"))
    v1.write.parquet(base + "/batch=1")
    v2 = spark.range(3, 6).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("extra")
    )
    v2.write.parquet(base + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"k", "extra", "batch"}
    rows = {r["k"]: r["extra"] for r in merged.collect()}
    assert rows[0] is None and rows[5] == 50
    assert merged.count() == 6


def test_read_table_csv_json_roundtrip_and_failfast(spark, sf_dir, tmp_path):
    """Format dispatch: CSV (schema-driven) and JSONL round-trip the same
    rows as parquet; malformed input FAILS the job rather than silently
    nulling (the refuse-don't-corrupt stance)."""
    import pytest as _pytest

    from p2_mapreduce_spark.sources.readers import read_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    want = {tuple(r) for r in orders.collect()}

    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    orders.write.option("header", True).csv(csv_dir)
    orders.write.json(json_dir)

    got_csv = read_table(
        spark, csv_dir, "csv",
        schema="o_orderkey long, o_custkey long, o_orderstatus string, "
               "o_totalprice double",
        header=True,
    )
    assert {tuple(r) for r in got_csv.collect()} == want
    got_json = read_table(
        spark, json_dir, "json",
        schema="o_orderkey long, o_custkey long, o_orderstatus string, "
               "o_totalprice double",
    )
    assert {tuple(r) for r in got_json.collect()} == want

    bad = str(tmp_path / "bad.csv")
    with open(bad, "w") as f:
        f.write("o_orderkey,o_custkey\n1,2\nnot_a_number,3\n")
    with _pytest.raises(Exception):
        read_table(
            spark, bad, "csv", schema="o_orderkey long, o_custkey long",
            header=True,
        ).collect()

    with _pytest.raises(ValueError):
        read_table(spark, csv_dir, "avro")


def test_read_table_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC is the remaining built-in columnar format: rows, schema, AND
    scan-level filter pushdown must survive the roundtrip (ORC carries
    stripe stats just like parquet footers)."""
    from p2_mapreduce_spark.sources.readers import read_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    want = {tuple(r) for r in orders.collect()}
    orc_dir = str(tmp_path / "orc")
    orders.write.orc(orc_dir)

    got = read_table(spark, orc_dir, "orc")
    assert got.schema == orders.schema
    assert {tuple(r) for r in got.collect()} == want

    plan = (
        got.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan.split(
        "PushedFilters"
    )[1][:120]


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Two tables bucketed on the same key with the same bucket count
    must join with ZERO exchanges — the write-once-shuffle-never story.
    An unbucketed twin of the same join DOES shuffle, proving the plan
    difference comes from the bucketing."""
    from p2_mapreduce_spark.session import load_table
    from p2_mapreduce_spark.sources.writers import bucketed_join, write_bucketed

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "ckey"), "b_orders", "ckey"
    )
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "ckey"), "b_cust", "ckey"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_cust", "ckey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # row parity with the plain join
        plain = orders.join(
            cust, orders.o_custkey == cust.c_custkey
        )
        assert joined.count() == plain.count()
        pplan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in pplan  # the unbucketed twin shuffles
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_bucketed_scan_prunes_on_key_equality(spark, sf_dir):
    """An equality predicate on the bucket key must scan a subset of
    bucket files (bucket pruning), visible as 'SelectedBucketsCount'."""
    from p2_mapreduce_spark.session import load_table
    from p2_mapreduce_spark.sources.writers import write_bucketed

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    write_bucketed(cust, "b_cust_prune", "c_custkey", buckets=8)
    # the planner's auto-bucketed-scan heuristic disables bucketed
    # reading for plans that gain nothing from the PARTITIONING (a bare
    # filter); pin it on so the scan keeps bucket identity and PRUNES
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        q = spark.table("b_cust_prune").filter("c_custkey = 7")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert q.count() == 1
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )
        spark.sql("DROP TABLE IF EXISTS b_cust_prune")


def test_binary_file_source_feeds_media_plane(spark, tmp_path):
    """`binaryFile` is the ingestion face of the multimodal plane: raw
    files land as (path, modificationTime, length, content) rows whose
    content column plugs straight into the media kernels. Pin the
    schema, the content round-trip, and the pathGlobFilter pushdown."""
    import os

    blobs = {"a.bin": b"\x00\x01\x02payload-a", "b.bin": b"b" * 64,
             "skip.txt": b"not-a-blob"}
    for name, data in blobs.items():
        with open(os.path.join(tmp_path, name), "wb") as f:
            f.write(data)
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(tmp_path))
    )
    assert {f.name for f in df.schema.fields} == {
        "path", "modificationTime", "length", "content"
    }
    got = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"])
           for r in df.collect()}
    assert got == {k: v for k, v in blobs.items() if k.endswith(".bin")}
    # content column drives the real header codec end-to-end
    import struct

    from p2_mapreduce_spark.operators.multimodal import decode_media

    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00"
           + b"\x00" * 4)
    with open(os.path.join(tmp_path, "img.bin"), "wb") as f:
        f.write(png)
    imgs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "img.bin")
        .load(str(tmp_path))
        .select(
            F.monotonically_increasing_id().alias("media_id"),
            F.lit("image").alias("modality"),
            F.col("content").alias("payload"),
        )
    )
    parsed = decode_media(imgs, decoder="headers").collect()
    assert len(parsed) == 1
    assert (parsed[0]["width"], parsed[0]["height"]) == (640, 480)


def test_read_table_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC (the other columnar built-in) round-trips the same rows and
    keeps exact types — the format-dispatch surface covers parquet, CSV,
    JSONL, text, binaryFile, and ORC."""
    from p2_mapreduce_spark.sources.readers import read_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    want = {tuple(r) for r in orders.collect()}
    orc_dir = str(tmp_path / "orc")
    orders.write.orc(orc_dir)
    got = read_table(spark, orc_dir, "orc")
    assert got.schema == orders.schema
    assert {tuple(r) for r in got.collect()} == want
