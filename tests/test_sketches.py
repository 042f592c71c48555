"""Accuracy bounds for the sketch-based aggregates (rows-only in the
driver check because sketch internals are engine-specific — the accuracy
contract is pinned here instead)."""

from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.relational import approx_distinct, approx_quantiles
from p2_mapreduce_spark.session import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    for r in approx_distinct(load_table(spark, sf_dir, "lineitem")).collect():
        exact, approx = r["exact_orders"], r["approx_orders"]
        assert abs(approx - exact) <= max(0.06 * exact, 3), (
            f"{r['l_returnflag']}: approx {approx} vs exact {exact}"
        )


def test_approx_quantiles_within_rank_error(spark, sf_dir):
    """percentile_approx with accuracy 10000 → rank error <= 1/10000; on
    test-scale groups the sketch is effectively exact: every approx cut
    must fall inside the exact p±2% value band."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            *[
                F.percentile("l_extendedprice", F.lit(p)).alias(f"p{int(p * 100)}")
                for p in (0.23, 0.27, 0.48, 0.52, 0.73, 0.77)
            ]
        )
        .collect()
    }
    for r in approx_quantiles(li).collect():
        b = bands[r["l_returnflag"]]
        for approx, lo, hi in zip(
            r["approx_pcts"],
            (b["p23"], b["p48"], b["p73"]),
            (b["p27"], b["p52"], b["p77"]),
        ):
            assert lo <= approx <= hi
