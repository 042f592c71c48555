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


def test_profile_table_two_scans_no_expand(spark, sf_dir):
    r = plan_report(entry_mod.queries()["profile_orders"](spark, sf_dir))
    # exactly two scans by design — one expand-free min/max/null agg and
    # one melted distinct-count agg (tree+detail print each node twice);
    # the ×(N+1) Expand of N fused count-distincts must NOT be in the plan
    assert r["plan"].count("Scan parquet") <= 4
    assert "Expand" not in r["plan"]
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


def test_rolling_active_users_semantics(spark):
    import datetime as dt

    from p2_mapreduce_spark.operators.timeseries import rolling_active_users

    def e(day, uid):
        return (day * 100 + uid, dt.datetime(2024, 1, day, 12), uid,
                "view", 1.0)

    ev = spark.createDataFrame(
        [e(1, 1), e(1, 2), e(3, 1), e(9, 3)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    got = {r["d"]: r["active_users"]
           for r in rolling_active_users(ev, days=7).collect()}
    # day 1: users {1,2}; day 7: window 1..7 = {1,2}
    # day 8: window 2..8 = {1}; day 9: window 3..9 = {1,3}
    assert got["2024-01-01"] == 2
    assert got["2024-01-07"] == 2
    assert got["2024-01-08"] == 1
    assert got["2024-01-09"] == 2
    assert len(got) == 9  # dense calendar between first and last day


def test_mom_revenue_delta_consistency(spark, sf_dir):
    from p2_mapreduce_spark.operators.timeseries import mom_revenue
    from p2_mapreduce_spark.session import load_table

    rows = sorted(
        mom_revenue(load_table(spark, sf_dir, "orders")).collect(),
        key=lambda r: r["month"],
    )
    assert rows[0]["prev_rev"] is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur["prev_rev"] == prev["revenue"]
        assert cur["mom_delta"] == cur["revenue"] - cur["prev_rev"]


def test_agg_state_merge_equals_direct(spark, sf_dir):
    """Folding per-split states == aggregating the union directly, for
    any split — the algebraic contract incremental maintenance rests on."""
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.merge import (
        agg_state,
        finalize_agg_state,
        merge_agg_states,
    )
    from p2_mapreduce_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    keys = ["o_orderstatus"]
    thirds = F.pmod(F.col("o_orderkey"), F.lit(3))
    parts = [orders.filter(thirds == i) for i in range(3)]
    state = agg_state(parts[0], keys, "o_totalprice")
    for p in parts[1:]:
        state = merge_agg_states(state, agg_state(p, keys, "o_totalprice"), keys)
    got = {
        r["o_orderstatus"]: r
        for r in finalize_agg_state(state, keys).collect()
    }
    want = {
        r["o_orderstatus"]: r
        for r in finalize_agg_state(
            agg_state(orders, keys, "o_totalprice"), keys
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        for c in ("n_rows", "sum_v", "avg_v", "min_v", "max_v"):
            assert got[k][c] == want[k][c], (k, c)  # exact, incl. doubles


def test_agg_state_merge_with_empty_delta(spark):
    from p2_mapreduce_spark.operators.merge import agg_state, merge_agg_states

    base = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("B", 5.0)], "k string, v double"
    )
    empty = base.filter("v < 0")
    s = agg_state(base, ["k"], "v")
    merged = merge_agg_states(s, agg_state(empty, ["k"], "v"), ["k"]).collect()
    assert {(r["k"], r["n_rows"]) for r in merged} == {("A", 2), ("B", 1)}


def test_value_outliers_flags_known_anomaly(spark):
    from p2_mapreduce_spark.operators.timeseries import value_outliers

    rows = [(i, "click", 10.0 + (i % 7) * 0.5) for i in range(200)]
    rows.append((999, "click", 500.0))          # unmistakable anomaly
    rows += [(1000 + i, "view", 5.0) for i in range(50)]  # sigma == 0 group
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = value_outliers(df).collect()
    assert [r["event_id"] for r in out] == [999]
    assert out[0]["z"] > 3.0
    # constant-valued group (sigma 0) produced no flags and no NaN rows
    assert all(r["event_type"] == "click" for r in out)
