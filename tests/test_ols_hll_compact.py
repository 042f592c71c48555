"""Tests for grouped_ols2 (Cramer normal equations), hll_overlap
(sketch algebra), and compact_changelog (CDC log compaction)."""

import math

from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.merge import compact_changelog
from p2_mapreduce_spark.operators.profile import hll_overlap
from p2_mapreduce_spark.operators.timeseries import grouped_ols2

LI_SCHEMA = (
    "l_returnflag string, l_quantity double, l_discount double, "
    "l_extendedprice double"
)


class TestGroupedOls2:
    def test_recovers_exact_plane(self, spark):
        # y = 200 + 3*q + 0.5*d exactly (in dollars), three+ points of
        # full rank per group -> exact recovery up to float rounding
        rows = []
        for q, d in [(1, 0), (2, 10), (3, 5), (4, 20), (7, 3)]:
            rows.append(("A", float(q), float(d), 200.0 + 3.0 * q + 0.5 * d))
        df = spark.createDataFrame(rows, LI_SCHEMA)
        r = grouped_ols2(df).collect()[0]
        assert r["n_obs"] == 5
        assert math.isclose(r["beta0"], 200.0, rel_tol=1e-9)
        assert math.isclose(r["beta1"], 3.0, rel_tol=1e-9)
        assert math.isclose(r["beta2"], 0.5, rel_tol=1e-9)

    def test_singular_design_yields_null(self, spark):
        # discount constant -> X'X singular -> NULL betas, not a crash
        rows = [("A", 1.0, 5.0, 10.0), ("A", 2.0, 5.0, 20.0)]
        r = grouped_ols2(spark.createDataFrame(rows, LI_SCHEMA)).collect()[0]
        assert r["beta0"] is None and r["beta1"] is None and r["beta2"] is None

    def test_partition_invariant(self, spark, sf_dir):
        from p2_mapreduce_spark.session import load_table

        li = load_table(spark, sf_dir, "lineitem")
        a = sorted(map(tuple, grouped_ols2(li).collect()))
        b = sorted(map(tuple, grouped_ols2(li.repartition(17)).collect()))
        assert a == b  # exact-decimal stats -> bit-equal betas


class TestHllOverlap:
    def test_estimates_track_exact(self, spark, sf_dir):
        from p2_mapreduce_spark.session import load_table

        docs = load_table(spark, sf_dir, "documents")
        rows = hll_overlap(docs).collect()
        assert len(rows) > 0
        for r in rows:
            assert r["source_a"] < r["source_b"]
            # raw HLL at m=64: σ ≈ 13%; allow 4σ plus small-range slack
            if r["exact_overlap"] > 200:
                assert (
                    abs(r["est_overlap"] - r["exact_overlap"])
                    <= 0.6 * r["exact_overlap"] + 50
                ), r

    def test_union_bounded_by_sides(self, spark, sf_dir):
        from p2_mapreduce_spark.session import load_table

        docs = load_table(spark, sf_dir, "documents")
        for r in hll_overlap(docs).collect():
            # register-max union: union registers dominate each side's,
            # so the union estimate is >= max(side estimates)
            assert r["est_union"] >= max(r["est_a"], r["est_b"]) - 1e-9


LOG_SCHEMA = "k long, payload string, version int, op string"


class TestCompactChangelog:
    def test_latest_wins_and_tombstones(self, spark):
        rows = [
            (1, "a1", 1, "upsert"),
            (1, "a2", 2, "upsert"),
            (2, "b1", 1, "upsert"),
            (2, "b2", 2, "delete"),
            (3, "c1", 1, "upsert"),
        ]
        out = {
            r["k"]: r["payload"]
            for r in compact_changelog(
                spark.createDataFrame(rows, LOG_SCHEMA), ["k"]
            ).collect()
        }
        assert out == {1: "a2", 3: "c1"}

    def test_delete_wins_version_tie(self, spark):
        rows = [(1, "x", 5, "upsert"), (1, "y", 5, "delete")]
        out = compact_changelog(
            spark.createDataFrame(rows, LOG_SCHEMA), ["k"]
        ).collect()
        assert out == []

    def test_replay_idempotent(self, spark):
        rows = [(1, "a1", 1, "upsert"), (1, "a2", 2, "upsert")]
        df = spark.createDataFrame(rows, LOG_SCHEMA)
        once = sorted(map(tuple, compact_changelog(df, ["k"]).collect()))
        twice = sorted(
            map(tuple, compact_changelog(df.union(df), ["k"]).collect())
        )
        assert once == twice
