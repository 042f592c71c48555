"""Tests for the round-2 extension batch: sweep-line concurrency, SCD2
apply, SemDeDup, quality classifier, exact-k sampling, boilerplate
inventory."""

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.curation import (
    quality_classifier,
    sample_exact_k,
)
from p2_mapreduce_spark.operators.dedup import boilerplate_ngrams
from p2_mapreduce_spark.operators.merge import scd2_apply
from p2_mapreduce_spark.operators.similarity import semantic_dedup
from p2_mapreduce_spark.operators.timeseries import interval_concurrency

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(eid, typ, minute):
    return (eid, T0 + dt.timedelta(minutes=minute), 1, typ, 1.0, "{}")


class TestIntervalConcurrency:
    def test_overlap_peak(self, spark):
        # duration 60: [0,60) [30,90) [45,105) overlap during [45,60)
        rows = [_ev(0, "a", 0), _ev(1, "a", 30), _ev(2, "a", 45)]
        out = interval_concurrency(
            spark.createDataFrame(rows, EV_SCHEMA), 60
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r["peak_concurrency"] == 3
        assert r["peak_at"] == T0 + dt.timedelta(minutes=45)

    def test_half_open_no_false_overlap(self, spark):
        # back-to-back intervals [0,60) and [60,120): never concurrent
        rows = [_ev(0, "a", 0), _ev(1, "a", 60)]
        r = interval_concurrency(
            spark.createDataFrame(rows, EV_SCHEMA), 60
        ).collect()[0]
        assert r["peak_concurrency"] == 1
        # earliest instant achieving the peak
        assert r["peak_at"] == T0

    def test_types_independent_and_partition_invariant(self, spark):
        rows = [_ev(i, "a", i) for i in range(10)] + [_ev(99, "b", 0)]
        df = spark.createDataFrame(rows, EV_SCHEMA)
        out1 = {
            r["event_type"]: r["peak_concurrency"]
            for r in interval_concurrency(df, 60).collect()
        }
        out2 = {
            r["event_type"]: r["peak_concurrency"]
            for r in interval_concurrency(df.repartition(7), 60).collect()
        }
        assert out1 == out2 == {"a": 10, "b": 1}


HIST_SCHEMA = "k long, attr string, valid_from string, valid_to string"


class TestScd2Apply:
    def _hist(self, spark):
        rows = [
            (1, "red", "2020-01-01", None),
            (2, "blue", "2020-01-01", None),
            # key 3 already has history: one closed + one current version
            (3, "old", "2019-01-01", "2020-01-01"),
            (3, "green", "2020-01-01", None),
        ]
        return spark.createDataFrame(rows, HIST_SCHEMA)

    def test_changed_key_closed_and_versioned(self, spark):
        updates = spark.createDataFrame([(1, "crimson")], "k long, attr string")
        out = scd2_apply(
            self._hist(spark), updates, ["k"], ["attr"], "2024-06-01"
        )
        rows = sorted(
            [tuple(r) for r in out.collect()],
            key=lambda t: (t[0], t[2]),
        )
        assert (1, "red", "2020-01-01", "2024-06-01") in rows
        assert (1, "crimson", "2024-06-01", None) in rows
        # untouched keys pass through verbatim
        assert (2, "blue", "2020-01-01", None) in rows
        assert len(rows) == 5  # 4 history rows + 1 new version

    def test_noop_update_not_reversioned(self, spark):
        updates = spark.createDataFrame([(2, "blue")], "k long, attr string")
        out = scd2_apply(
            self._hist(spark), updates, ["k"], ["attr"], "2024-06-01"
        ).collect()
        assert len(out) == 4  # history unchanged
        cur2 = [r for r in out if r["k"] == 2]
        assert len(cur2) == 1 and cur2[0]["valid_to"] is None

    def test_closed_versions_never_touched(self, spark):
        updates = spark.createDataFrame([(3, "teal")], "k long, attr string")
        out = scd2_apply(
            self._hist(spark), updates, ["k"], ["attr"], "2024-06-01"
        ).collect()
        k3 = sorted(
            [(r["attr"], r["valid_from"], r["valid_to"]) for r in out if r["k"] == 3]
        )
        assert k3 == [
            ("green", "2020-01-01", "2024-06-01"),
            ("old", "2019-01-01", "2020-01-01"),
            ("teal", "2024-06-01", None),
        ]


class TestSemanticDedup:
    def test_near_dup_dropped_exact_kept(self, spark):
        # two near-identical vectors + one orthogonal: the higher-id twin
        # drops, the orthogonal vector and the lower-id twin survive
        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {r["vec_id"]: r["dropped"] for r in
               semantic_dedup(df, tau=0.9, n_cells=1).collect()}
        assert out == {1: False, 2: True, 3: False}

    def test_dominator_semantics_chain(self, spark):
        # chain a~b, b~c, a!~c: dominator variant drops BOTH b and c?
        # No — c is dropped only if similar to a LOWER-ID vector; b
        # dominates c, so c drops even though b itself dropped.  Pin it.
        rows = [
            (1, [1.0, 0.0]),
            (2, [0.95, 0.3122]),   # cos(1,2) ~ 0.95
            (3, [0.81, 0.59]),     # cos(2,3) ~ 0.95, cos(1,3) ~ 0.81
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {r["vec_id"]: r["dropped"] for r in
               semantic_dedup(df, tau=0.9, n_cells=1).collect()}
        assert out == {1: False, 2: True, 3: True}

    def test_partition_invariant(self, spark, sf_dir):
        from p2_mapreduce_spark.session import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        a = sorted(map(tuple, semantic_dedup(emb, tau=0.3).collect()))
        b = sorted(map(tuple, semantic_dedup(emb.repartition(13), tau=0.3).collect()))
        assert a == b


DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


class TestQualityClassifier:
    def test_margin_matches_hand_computation(self, spark):
        text = "the cat sat on the mat"
        df = spark.createDataFrame([(1, text, "en", "s", len(text))], DOC_SCHEMA)
        r = quality_classifier(df).collect()[0]
        # tokens: the cat sat on the mat -> 6, uniq 5, stop hits: the x2 + on? 'on' not in list -> 2
        assert r["n_tokens"] == 6 and r["n_uniq"] == 5 and r["n_stop"] == 2
        margin = -500 + 5 * 6 + 20 * 5 - 2 * len(text) + 100 * 2
        assert r["margin"] == margin
        assert r["keep"] == (margin > 0)

    def test_zero_shuffle_plan(self, spark, sf_dir):
        from p2_mapreduce_spark.session import load_table

        plan = quality_classifier(
            load_table(spark, sf_dir, "documents")
        )._jdf.queryExecution().executedPlan().toString()
        # spread()'s RoundRobin fan-out is the documented local-bench
        # concession (no-op at scale); what must NOT appear is any
        # key-shuffle — the classifier is a pure map
        assert "hashpartitioning" not in plan
        assert "rangepartitioning" not in plan


class TestSampleExactK:
    def test_exactly_k_and_deterministic(self, spark, sf_dir):
        from p2_mapreduce_spark.session import load_table

        docs = load_table(spark, sf_dir, "documents")
        s1 = sorted(r["doc_id"] for r in sample_exact_k(docs, 25).collect())
        s2 = sorted(
            r["doc_id"] for r in sample_exact_k(docs.repartition(9), 25).collect()
        )
        assert len(s1) == 25 and s1 == s2

    def test_matches_python_md5_order(self, spark):
        rows = [(i, f"t{i}", "en", "s", 2) for i in range(50)]
        df = spark.createDataFrame(rows, DOC_SCHEMA)
        got = [r["doc_id"] for r in sample_exact_k(df, 5).collect()]
        exp = sorted(
            range(50),
            key=lambda i: (hashlib.md5(f"s0:{i}".encode()).hexdigest(), i),
        )[:5]
        assert sorted(got) == sorted(exp)

    def test_salt_rotation_redraws(self, spark, sf_dir):
        from p2_mapreduce_spark.session import load_table

        docs = load_table(spark, sf_dir, "documents")
        a = set(r["doc_id"] for r in sample_exact_k(docs, 25, salt="s0").collect())
        b = set(r["doc_id"] for r in sample_exact_k(docs, 25, salt="s1").collect())
        assert a != b


class TestBoilerplateNgrams:
    def test_repeated_ngram_surfaces_with_spread(self, spark):
        boiler = "all rights reserved worldwide"
        rows = [
            (1, f"alpha beta gamma {boiler}", "en", "src0", 10),
            (2, f"delta epsilon zeta {boiler}", "en", "src1", 10),
            (3, f"eta theta iota {boiler}", "en", "src0", 10),
            (4, "unique text only here", "en", "src0", 10),
        ]
        df = spark.createDataFrame(rows, DOC_SCHEMA)
        out = {
            r["shingle"]: (r["df"], r["n_sources"])
            for r in boilerplate_ngrams(df, n=4, min_df=2, top_n=10).collect()
        }
        assert out[boiler] == (3, 2)
        assert "unique text only here" not in out

    def test_within_doc_repeat_counts_once(self, spark):
        # df is DISTINCT documents: a shingle repeated inside one doc
        # must not inflate df
        rows = [
            (1, "spam spam spam spam spam spam", "en", "s", 10),
            (2, "spam spam spam ham", "en", "s", 10),
        ]
        df = spark.createDataFrame(rows, DOC_SCHEMA)
        out = {
            r["shingle"]: r["df"]
            for r in boilerplate_ngrams(df, n=3, min_df=2, top_n=10).collect()
        }
        assert out["spam spam spam"] == 2


class TestScd2AsOf:
    def test_time_travel_reads_pre_batch_state(self, spark):
        from p2_mapreduce_spark.operators.merge import scd2_apply, scd2_as_of

        hist = spark.createDataFrame(
            [
                (1, "red", "2020-01-01", None),
                (2, "blue", "2020-01-01", None),
            ],
            HIST_SCHEMA,
        )
        updates = spark.createDataFrame([(1, "crimson")], "k long, attr string")
        applied = scd2_apply(hist, updates, ["k"], ["attr"], "2024-06-01")
        before = {
            r["k"]: r["attr"]
            for r in scd2_as_of(applied, "2022-01-01").collect()
        }
        after = {
            r["k"]: r["attr"]
            for r in scd2_as_of(applied, "2024-07-01").collect()
        }
        assert before == {1: "red", 2: "blue"}
        assert after == {1: "crimson", 2: "blue"}

    def test_before_first_version_is_empty(self, spark):
        from p2_mapreduce_spark.operators.merge import scd2_as_of

        hist = spark.createDataFrame(
            [(1, "red", "2020-01-01", None)], HIST_SCHEMA
        )
        assert scd2_as_of(hist, "2019-01-01").count() == 0
