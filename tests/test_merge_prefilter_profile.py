"""Pins for merge/upsert, bitmap join prefiltering, and table profiling
(operators/merge.py, prefilter.py, profile.py)."""

import pyspark.sql.functions as F

import __spark_entry__ as entry_mod
from p2_mapreduce_spark.operators.merge import merge_patch, merge_upsert
from p2_mapreduce_spark.operators.prefilter import (
    bloom_semi_join,
    build_key_bitmap,
)
from p2_mapreduce_spark.operators.profile import profile_table
from p2_mapreduce_spark.plans import plan_report
from p2_mapreduce_spark.session import load_table


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame(
        [(2, "B"), (4, "D")], "k long, v string"
    )
    got = {r["k"]: r["v"] for r in merge_upsert(target, updates, ["k"]).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_merge_patch_null_keeps_target(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, v string, x double"
    )
    updates = spark.createDataFrame(
        [(2, None, 99.0), (3, "C", None)], "k long, v string, x double"
    )
    got = {
        r["k"]: (r["v"], r["x"])
        for r in merge_patch(target, updates, ["k"]).collect()
    }
    assert got == {1: ("a", 10.0), 2: ("b", 99.0), 3: ("C", None)}


def test_merge_upsert_plans_anti_join_not_outer(spark, sf_dir):
    r = plan_report(entry_mod.queries()["merge_upsert"](spark, sf_dir))
    assert "LeftAnti" in r["plan"]
    assert "FullOuter" not in r["plan"]
    assert not r["has_python_worker"]


def test_bloom_prefilter_drops_rows_and_stays_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    big = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000.0
    )
    pre = bloom_semi_join(li, big, "l_orderkey", "o_orderkey")
    plain = li.join(big, li.l_orderkey == big.o_orderkey, "left_semi")
    assert pre.count() == plain.count()
    # the bitmap itself must be selective on this fixture: the filtered
    # build side is a small fraction of orders, so most probe rows die
    # at the broadcast bitmap, not in the exchange
    bitmap = build_key_bitmap(big, "o_orderkey")
    survivors = (
        li.withColumn(
            "__w",
            (F.pmod(F.xxhash64("l_orderkey"), F.lit(1 << 20)) / 64).cast(
                "long"
            ),
        )
        .join(F.broadcast(bitmap), F.col("__w") == F.col("word"), "left_semi")
        .count()
    )
    assert survivors < li.count() / 2


def test_bloom_semi_join_plan_broadcasts_bitmap(spark, sf_dir):
    r = plan_report(entry_mod.queries()["bloom_semi_join"](spark, sf_dir))
    assert r["n_broadcast_joins"] >= 1
    assert not r["has_python_worker"]


def test_profile_table_counts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], "a long, b string"
    )
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert got["a"]["n_rows"] == 3
    assert got["a"]["n_null"] == 0
    assert got["a"]["n_distinct"] == 2
    assert got["a"]["min_s"] == "1" and got["a"]["max_s"] == "2"
    assert got["b"]["n_null"] == 1
    assert got["b"]["n_distinct"] == 2
    assert got["b"]["min_s"] == "x" and got["b"]["max_s"] == "y"


def test_profile_table_single_scan(spark, sf_dir):
    r = plan_report(entry_mod.queries()["profile_orders"](spark, sf_dir))
    # every column's stats come from ONE scan of the table (tree+detail
    # print each node twice in formatted plans)
    assert r["plan"].count("Scan parquet") <= 2
    assert not r["has_python_worker"]


def test_table_diff_statuses(spark):
    a = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "k long, v string"
    )
    b = spark.createDataFrame(
        [(2, "B"), (3, None), (4, "d")], "k long, v string"
    )
    from p2_mapreduce_spark.operators.merge import table_diff

    got = {r["k"]: r["status"] for r in table_diff(a, b, ["k"]).collect()}
    # null == null must compare as SAME (eqNullSafe), not changed
    assert got == {1: "removed", 2: "changed", 3: "same", 4: "added"}


def test_gap_fill_fills_holes_forward(spark):
    import datetime as dt

    from p2_mapreduce_spark.operators.timeseries import gap_fill_hourly

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    ev = spark.createDataFrame(
        [
            (1, t0, 1, "a", 5.0),
            # hour 1 and 2 empty, next event in hour 3
            (2, t0 + dt.timedelta(hours=3), 1, "a", 7.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    rows = sorted(gap_fill_hourly(ev).collect(), key=lambda r: r["hour"])
    assert len(rows) == 4  # hours 0..3 dense
    assert [r["n_events"] for r in rows] == [1, 0, 0, 1]
    # holes carry the last observation forward
    assert [r["filled_max"] for r in rows] == [5.0, 5.0, 5.0, 7.0]


def test_gap_fill_plan_no_python(spark, sf_dir):
    r = plan_report(entry_mod.queries()["gap_fill"](spark, sf_dir))
    assert not r["has_python_worker"]
    assert "Generate" in r["plan"]  # the sequence explode


def test_diff_orders_plan_single_shuffle_join(spark, sf_dir):
    r = plan_report(entry_mod.queries()["diff_orders"](spark, sf_dir))
    assert "FullOuter" in r["plan"]
    assert not r["has_python_worker"]
