"""Accuracy bounds for the sketch-based aggregates.  The driver check now
hashes the EXACT columns (plus a provably-true `approx_ok` flag); the raw
sketch-vs-exact error contract is pinned here."""

from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.relational import approx_distinct, approx_quantiles
from p2_mapreduce_spark.session import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    raw = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
            F.countDistinct("l_orderkey").alias("exact"),
        )
        .collect()
    }
    rows = approx_distinct(li).collect()
    assert len(rows) == len(raw)
    for r in rows:
        b = raw[r["l_returnflag"]]
        assert r["exact_orders"] == b["exact"]
        assert abs(b["approx"] - b["exact"]) <= max(0.06 * b["exact"], 3)
        assert r["approx_ok"] is True


def test_approx_quantiles_within_rank_error(spark, sf_dir):
    """percentile_approx with accuracy 10000 → rank error <= 1/10000; on
    test-scale groups the sketch is effectively exact: every approx cut
    must fall inside the exact p±2% value band, and the surfaced exact
    percentiles must equal F.percentile directly."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    raw = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", pct, F.lit(10000)).alias("ap"),
            *[
                F.percentile("l_extendedprice", F.lit(p)).alias(f"p{int(p * 100)}")
                for p in (0.23, 0.25, 0.27, 0.48, 0.5, 0.52, 0.73, 0.75, 0.77)
            ],
        )
        .collect()
    }
    for r in approx_quantiles(li).collect():
        b = raw[r["l_returnflag"]]
        assert (r["p25"], r["p50"], r["p75"]) == (b["p25"], b["p50"], b["p75"])
        assert r["approx_ok"] is True
        for approx, lo, hi in zip(
            b["ap"],
            (b["p23"], b["p48"], b["p73"]),
            (b["p27"], b["p52"], b["p77"]),
        ):
            assert lo <= approx <= hi


class TestHeavyHitters:
    def test_cms_overcount_is_one_sided(self, spark, sf_dir):
        from p2_mapreduce_spark.operators.text_analysis import heavy_hitters
        from p2_mapreduce_spark.session import load_table

        out = heavy_hitters(load_table(spark, sf_dir, "documents"), k=10).collect()
        assert len(out) == 10
        for r in out:
            # the Count-Min guarantee: estimates never undercount
            assert r["cms_est"] >= r["exact_cnt"]
            assert r["overcount"] == r["cms_est"] - r["exact_cnt"]

    def test_exact_counts_match_local_counter(self, spark):
        from collections import Counter

        from pyspark.sql import Row

        from p2_mapreduce_spark.operators.text_analysis import heavy_hitters

        texts = ["a a a b b c", "a b c d", "a e e e"]
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        counts = Counter(" ".join(texts).split())
        got = {r["word"]: r["exact_cnt"] for r in heavy_hitters(df, k=3).collect()}
        want = dict(sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3])
        assert got == want


def test_hll_rollup_merge_equals_direct_registers(spark, sf_dir):
    """Nation→region register MAX-merge must equal registers computed
    directly at region grain (sketch-merge associativity), and the
    estimate must land near the exact count."""
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.profile import hll_distinct_rollup
    from p2_mapreduce_spark.session import load_table

    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    h = F.conv(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 18, 15), 16, 10
    ).cast("long")
    base = (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("r_name", "n_nationkey", h.alias("h"))
    )
    jr = base.select(
        "r_name",
        "n_nationkey",
        (F.col("h") % 64).alias("j"),
        F.expr(
            "least(40, CASE WHEN h div 64 = 0 THEN 55 "
            "ELSE 54 - length(bin(h div 64)) + 1 END)"
        ).alias("r"),
    )
    via_nation = (
        jr.groupBy("r_name", "n_nationkey", "j").agg(F.max("r").alias("r"))
        .groupBy("r_name", "j").agg(F.max("r").alias("r"))
    )
    direct = jr.groupBy("r_name", "j").agg(F.max("r").alias("r"))
    assert via_nation.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_nation).count() == 0

    # accuracy needs the raw estimator's regime (n >= ~2.5 m): the tiny
    # test fixture (~30/region) is below it, so assert on a synthetic
    # corpus comfortably inside — 3σ of the m=64 sketch is ~40%
    cust = spark.createDataFrame(
        [(i, i % 3) for i in range(3000)], "c_custkey long, c_nationkey long"
    )
    nat = spark.createDataFrame(
        [(i, f"N{i}", 0) for i in range(3)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    reg = spark.createDataFrame([(0, "R0")], "r_regionkey long, r_name string")
    (row,) = hll_distinct_rollup(cust, nat, reg).collect()
    assert row["exact_distinct"] == 3000
    assert abs(row["rel_err"]) < 0.4, row["rel_err"]


def test_hll_registers_are_duplicate_insensitive(spark):
    """Feeding each key k times must give the identical sketch (max is
    idempotent) — the property that makes the estimate a DISTINCT count."""
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.operators.profile import hll_distinct_rollup

    cust1 = spark.createDataFrame(
        [(i, i % 3) for i in range(300)], "c_custkey long, c_nationkey long"
    )
    cust3 = spark.createDataFrame(
        [(i, i % 3) for i in range(300) for _ in range(3)],
        "c_custkey long, c_nationkey long",
    )
    nation = spark.createDataFrame(
        [(i, f"N{i}", 0) for i in range(3)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    region = spark.createDataFrame(
        [(0, "R0")], "r_regionkey long, r_name string"
    )
    a = hll_distinct_rollup(cust1, nation, region).collect()[0]
    b = hll_distinct_rollup(cust3, nation, region).collect()[0]
    assert a["est_distinct"] == b["est_distinct"]
    assert a["exact_distinct"] == b["exact_distinct"] == 300
