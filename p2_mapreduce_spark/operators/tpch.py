"""TPC-H-analog analytic queries over the trimmed star schema.

The reference engine's users run ad-hoc analytics through its MapReduce
verbs; this module closes the standard warehouse-query surface the way a
Spark user would write it — declarative DataFrame plans that Catalyst
turns into broadcast/shuffle joins with pushed-down filters.  Each query
is adapted to the driver fixture's trimmed TPC-H schema (no partsupp, no
l_shipmode/l_commitdate — see TESTDATA.md), keeping the *shape* of the
classic query: the join graph, the aggregation grain, and the plan
hazards (disjunctive pushdown, anti joins, share-of-total divisions).

All money math follows the functions/numeric.py protocol: exact DECIMAL
partial sums surfaced as DOUBLE, divisions as single IEEE ops — identical
in the DuckDB oracle and reproducible under any partitioning/AQE re-plan.

Scale notes are per-function; the common ones: ``nation``/``region`` are
O(25)/O(5) rows and always broadcast; fact-fact joins shuffle on their
keys and rely on AQE for skew; every filter is expressed on the base
column so it reaches the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from p2_mapreduce_spark.functions.numeric import dsum

#: line revenue at exact DECIMAL(24,4): price and discount are 2-decimal,
#: their product is 4-decimal — exact, order-independent partial sums.
_REV = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def _rev_sum():
    return dsum(_REV, scale=4, precision=24)


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations by ship year.

    Supplier-side and customer-side nation names join through the tiny
    ``nation`` dim — both broadcast, so the only shuffles are the three
    fact joins (lineitem⋈orders on orderkey, ⋈customer on custkey,
    ⋈supplier on suppkey) and the final 2×#years-row aggregate.  The
    nation-pair filter is applied to each dim *before* its broadcast, so
    the fact-side hash joins drop non-qualifying rows at probe time —
    the classic "filter the dimension, not the fact" pushdown.
    """
    n1 = nation.filter(F.col("n_name").isin(nation_a, nation_b)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(nation_a, nation_b)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = supplier.join(F.broadcast(n1), supplier.s_nationkey == n1.s_nk).select(
        "s_suppkey", "supp_nation"
    )
    cust = customer.join(F.broadcast(n2), customer.c_nationkey == n2.c_nk).select(
        "c_custkey", "cust_nation"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, lineitem.l_suppkey == supp.s_suppkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(_rev_sum().alias("revenue"))
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = "NATION_3",
    target_region: str = "ASIA",
    part: DataFrame | None = None,
    part_type: str = "PROMO",
) -> DataFrame:
    """Q8 shape: the target nation's share of revenue per order year,
    within one customer region and one part type.

    The share is a per-year division of two exact-decimal sums computed
    in ONE aggregate pass (conditional sum, not a self-join): Catalyst
    folds the CASE into the partial aggregate, so the plan is scan →
    joins → single groupBy(year) — no second traversal for the
    denominator.  Customer-region and part-type dims broadcast.
    """
    reg = region.filter(F.col("r_name") == target_region).select("r_regionkey")
    cnat = nation.join(
        F.broadcast(reg), nation.n_regionkey == reg.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nk"))
    cust = customer.join(F.broadcast(cnat), customer.c_nationkey == F.col("c_nk")
                         ).select("c_custkey")
    snat = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    supp = supplier.join(F.broadcast(snat), supplier.s_nationkey == F.col("s_nk")
                         ).select("s_suppkey", "supp_nation")
    li = lineitem
    if part is not None:
        pk = part.filter(F.col("p_type") == part_type).select("p_partkey")
        li = li.join(F.broadcast(pk), li.l_partkey == F.col("p_partkey"))
    target_rev = F.when(F.col("supp_nation") == target_nation, _REV).otherwise(
        F.lit(0.0)
    )
    return (
        li.join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            dsum(target_rev, scale=4, precision=24).alias("nation_rev"),
            _rev_sum().alias("total_rev"),
        )
        .select(
            "o_year",
            "nation_rev",
            "total_rev",
            (F.col("nation_rev") / F.col("total_rev")).alias("mkt_share"),
        )
    )


def product_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    name_substr: str = "widget",
) -> DataFrame:
    """Q9 shape (sans partsupp — the fixture carries no supplycost):
    revenue by supplier nation × order year for parts whose name contains
    a substring.

    The part filter is a non-sargable ``contains`` — it can't push to the
    parquet reader, but it runs over the *part* dim (small) whose
    surviving keys broadcast to the lineitem probe, so the fact table
    still never materializes non-qualifying rows past the scan.
    """
    pk = part.filter(F.col("p_name").contains(name_substr)).select("p_partkey")
    snat = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    supp = supplier.join(F.broadcast(snat), supplier.s_nationkey == F.col("s_nk")
                         ).select("s_suppkey", "nation")
    return (
        lineitem.join(F.broadcast(pk), lineitem.l_partkey == F.col("p_partkey"))
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(supp, lineitem.l_suppkey == supp.s_suppkey)
        .groupBy(
            "nation", F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(_rev_sum().alias("sum_profit"))
    )


def returned_items(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
    k: int = 20,
) -> DataFrame:
    """Q10 shape: top-k customers by revenue lost to returns in a
    quarter.

    Filters (returnflag, orderdate range) are base-column predicates —
    both push to their scans before any join.  The top-k is a global
    ``orderBy().limit(k)``: Spark plans TakeOrderedAndProject, which
    keeps k rows per partition then k at the driver — no full sort at
    any scale.  Ties broken on ``c_custkey`` so the k-set is
    deterministic cross-engine.
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    nat = nation.select(
        F.col("n_nationkey").alias("nk"), F.col("n_name").alias("nation")
    )
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(ords, lineitem.l_orderkey == ords.o_orderkey)
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .join(F.broadcast(nat), customer.c_nationkey == F.col("nk"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "nation")
        .agg(_rev_sum().alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(k)
    )


def ship_lag_priority(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Q12 shape (the fixture has no shipmode/commitdate — the lag bucket
    of ``l_shipdate - o_orderdate`` stands in for the shipmode): per
    fulfillment-speed bucket, how many lines belong to high- vs
    low-priority orders.

    One fact-fact join on orderkey, then a 3-row aggregate; the CASE
    priority split folds into the partial aggregate (single pass).
    """
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(lag <= 30, "fast").when(lag <= 90, "medium").otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("lag_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1997-02-01",
) -> DataFrame:
    """Q14 shape: percent of a month's revenue from promo-type parts.

    Single-row answer computed in one pass (conditional numerator inside
    the same aggregate); the shipdate range pushes to the lineitem scan
    and the part dim broadcasts.  The percentage is one IEEE division of
    two exact-decimal-as-double sums — oracle-identical.
    """
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    )
    p = part.select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _REV).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            dsum(promo, scale=4, precision=24).alias("promo_rev"),
            _rev_sum().alias("total_rev"),
        )
        .select(
            "promo_rev",
            "total_rev",
            (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias(
                "promo_pct"
            ),
        )
    )


def supplier_part_variety(
    lineitem: DataFrame,
    part: DataFrame,
    excluded_brand: str = "Brand#11",
    max_size: int = 25,
) -> DataFrame:
    """Q16 shape (partsupp replaced by the observed lineitem
    part-supplier pairs): how many distinct suppliers ship each
    (brand, type, size) class, excluding one brand and large sizes.

    ``countDistinct`` over (grain, supplier) plans as two-level partial
    aggregation (dedup then count) — no row explosion; the part filter
    broadcasts its surviving keys.
    """
    pk = part.filter(
        (F.col("p_brand") != excluded_brand) & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(pk), F.col("l_partkey") == pk.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def disjunctive_pricing(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Q19 shape: revenue under an OR-of-ANDs predicate over three
    brand/size/quantity envelopes.

    The plan hazard Q19 exists to test: the disjunction must not defeat
    pushdown.  The quantity bounds ``l_quantity BETWEEN 1 AND 30`` (the
    hull of the three branches) are implied conjuncts — stated explicitly
    so they reach the parquet scan even though the full OR can't.
    Per-branch conditions evaluate post-join on the broadcast part dim.
    """
    li = lineitem.filter(F.col("l_quantity").between(1, 30))
    p = part.select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(1, 15)
           & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(_rev_sum().alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


def idle_rich_customers(
    customer: DataFrame, orders: DataFrame, since: str = "1999-01-01"
) -> DataFrame:
    """Q22 shape: per market segment, customers who hold above the
    segment's average positive balance but have placed no order since a
    cutoff date (every fixture customer has *some* order, so the classic
    never-ordered variant is vacuous — recency keeps the anti-join shape
    with real signal: the dormant high-balance cohort).

    The segment averages are a 5-row aggregate → broadcast back onto
    customer (no shuffle of the customer table for the threshold); the
    recency test is a LEFT ANTI join against the *distinct custkeys of
    recent orders* — date-filtered and projected to the key column before
    the join, so the anti side shuffles recent keys, not order rows.
    Output is one row per segment: count + exact-sum balance.
    """
    seg_avg = customer.filter(F.col("c_acctbal") > 0).groupBy(
        F.col("c_mktsegment").alias("seg")
    ).agg(
        (dsum("c_acctbal") / F.count(F.lit(1))).alias("avg_bal")
    )
    active = (
        orders.filter(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        customer.join(
            F.broadcast(seg_avg), customer.c_mktsegment == F.col("seg")
        )
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(active, customer.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


def order_priority_check(
    lineitem: DataFrame,
    orders: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
) -> DataFrame:
    """Q4 shape: orders per priority in a quarter that had at least one
    returned line (the fixture has no l_commitdate, so ``EXISTS (late
    line)`` becomes ``EXISTS (returned line)`` — same decorrelated plan).

    The EXISTS is a LEFT SEMI join: the lineitem side is filtered and
    projected to the join key *before* the shuffle, so the probe ships
    distinct-able keys only — never full rows.  The date range is a
    base-column predicate on orders and pushes to its scan.  Output is
    O(#priorities) rows from a single partial→final count.
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    flagged = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        ords.join(flagged, ords.o_orderkey == flagged.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
) -> DataFrame:
    """Q15 shape: the supplier(s) whose quarterly revenue equals the
    maximum quarterly revenue (the classic view + MAX subquery).

    One shuffle builds the per-supplier revenue table (≤ #suppliers
    rows) which is explicitly persisted — Catalyst does NOT merge the
    MAX branch and the filter branch into one exchange, so without the
    persist the 100 TB fact table would be scanned twice.  The MAX is
    then a 1-row aggregate over the cached table that broadcasts back
    as the filter.  Revenue follows the exact-decimal protocol, so the
    equality join on the max is bit-stable under any partitioning.
    Supplier names arrive via a broadcast dim join after the filter,
    when only the winners remain.
    """
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(_rev_sum().alias("total_revenue"))
        .persist()
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("max_revenue"))
        .join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def small_qty_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#1",
    frac: float = 0.5,
) -> DataFrame:
    """Q17 shape: yearly revenue forfeited to small orders — lines of
    one brand whose quantity sits below ``frac`` × that part's average
    quantity (the classic correlated AVG subquery, decorrelated into a
    self-aggregate join).

    The brand filter lives on the part dim, whose surviving keys
    broadcast into the lineitem probe — the fact table narrows to the
    brand's lines in ONE scan, which is then persisted implicitly by
    reuse inside a single plan: Catalyst computes the per-part averages
    and re-joins them against the same filtered branch without a second
    lineitem pass (the exchange is reused).  The threshold compare is
    one IEEE multiply on the exact-decimal mean — deterministic under
    re-partitioning.
    """
    pk = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(F.broadcast(pk), lineitem.l_partkey == F.col("p_partkey"))
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < F.lit(frac) * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


def sole_returner(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    k: int = 20,
) -> DataFrame:
    """Q21 shape: suppliers who alone returned lines on multi-supplier
    finished orders — the EXISTS / NOT EXISTS pair (the fixture lacks
    receipt/commit dates, so "kept waiting" becomes "returned": supplier
    S has a returned line on order O, some OTHER supplier also shipped
    on O, and no other supplier returned on O).

    Both correlated subqueries become joins against the same distinct
    (orderkey, suppkey) projection, computed once: a LEFT SEMI with a
    ``suppkey <>`` residual for the EXISTS, a LEFT ANTI with the same
    residual restricted to returned lines for the NOT EXISTS.  Each side
    shuffles distinct key pairs, never lines.  Top-k is
    TakeOrderedAndProject on (count DESC, name ASC) — total order, no
    full sort.
    """
    forders = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    pairs = lineitem.select("l_orderkey", "l_suppkey").distinct()
    ret_pairs = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    base = ret_pairs.join(
        forders, ret_pairs.l_orderkey == forders.o_orderkey, "left_semi"
    )
    others = pairs.select(
        F.col("l_orderkey").alias("p_ok"), F.col("l_suppkey").alias("p_sk")
    )
    other_ret = ret_pairs.select(
        F.col("l_orderkey").alias("r_ok"), F.col("l_suppkey").alias("r_sk")
    )
    sole = (
        base.join(
            others,
            (base.l_orderkey == F.col("p_ok"))
            & (base.l_suppkey != F.col("p_sk")),
            "left_semi",
        )
        .join(
            other_ret,
            (base.l_orderkey == F.col("r_ok"))
            & (base.l_suppkey != F.col("r_sk")),
            "left_anti",
        )
    )
    return (
        sole.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(k)
    )


def revenue_forecast(lineitem: DataFrame) -> DataFrame:
    """Q6 shape: the what-if revenue of discount elimination — a single
    tight-range scan-aggregate, the canonical predicate-pushdown probe.

    All three predicates (shipdate year, discount band, quantity cap) are
    base-column comparisons, so they reach the parquet scan as
    PushedFilters and prune row groups by footer min/max; the aggregate
    is one exact-decimal partial→final sum — no shuffle wider than one
    row per task.  At 100 TB this query reads only the matching row
    groups of three columns."""
    forecast = (
        F.col("l_extendedprice") * F.col("l_discount")
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(forecast, scale=4, precision=24).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def important_parts(lineitem: DataFrame, threshold_ppm: int = 600) -> DataFrame:
    """Q11 shape: parts whose traded value exceeds a fraction of the
    whole market — the global-scalar-threshold pattern (HAVING against a
    subquery over *all* groups).

    One shuffle builds the per-part value table, which is persisted so
    BOTH consumers — the global re-aggregate and the share projection —
    read the materialized part-grain table instead of re-scanning the
    fact (same pattern as the dedup shingle table; on a cluster swap
    persist() for a reliable checkpoint).  The total joins back as a
    broadcast single row (BroadcastNestedLoopJoin degenerate case: one
    row × N parts) — never a driver round-trip.  The
    share threshold is integer parts-per-million to keep the cut exact:
    ``value * 1e6 > threshold_ppm * total`` compares two exact decimals
    scaled by integers, no division involved in the predicate."""
    per_part = lineitem.groupBy("l_partkey").agg(
        dsum(_REV, scale=4, precision=24).alias("part_value"),
        F.count(F.lit(1)).alias("n_lines"),
    ).persist()
    total = per_part.agg(dsum("part_value", scale=4, precision=30).alias("total_value"))
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("part_value") * F.lit(1_000_000)
            > F.lit(threshold_ppm) * F.col("total_value")
        )
        .select(
            "l_partkey",
            "part_value",
            "n_lines",
            (F.col("part_value") / F.col("total_value")).alias("share"),
        )
    )


def dominant_suppliers(
    lineitem: DataFrame, supplier: DataFrame, min_share: float = 0.15
) -> DataFrame:
    """Q20 shape: suppliers who dominate the supply of at least one part
    (their shipped quantity exceeds ``min_share`` of that part's total) —
    the nested-aggregate semi-join chain (Q20's "excess availability"
    predicate re-expressed against lineitem, the fixture's partsupp).

    The (supplier, part) quantity table is built in one shuffle; the
    per-part total is re-aggregated from it (grain contraction, not a
    rescan); the share filter runs BEFORE the supplier dim joins in, so
    the join input is already collapsed to qualifying suppliers.  Both
    aggregates are exact decimals; the share predicate multiplies instead
    of divides (``supp_qty > min_share * part_qty``) so decimal rounding never
    enters the predicate."""
    sp = lineitem.groupBy("l_suppkey", "l_partkey").agg(
        dsum("l_quantity").alias("supp_qty")
    )
    pt = sp.groupBy("l_partkey").agg(
        dsum("supp_qty").alias("part_qty"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    dominated = (
        sp.join(pt, "l_partkey")
        .filter(F.col("supp_qty") > F.lit(min_share) * F.col("part_qty"))
        # a part with a single supplier is trivially dominated; keep only
        # contested parts so the signal means displacement
        .filter(F.col("n_suppliers") >= 2)
    )
    per_supp = dominated.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_dominated_parts"),
        dsum("supp_qty", scale=2, precision=24).alias("dominated_qty"),
    )
    return (
        per_supp.join(
            supplier.select("s_suppkey", "s_name"),
            per_supp.l_suppkey == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "n_dominated_parts", "dominated_qty")
    )


def min_cost_supplier(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
    top_n: int = 50,
) -> DataFrame:
    """TPC-H Q2's shape on the trimmed fixture schema (no partsupp
    table, so ps_supplycost becomes the OBSERVED best unit price): for
    each part, the supplier offering the minimum unit price — the
    correlated ``WHERE cost = (SELECT min(cost) ... WHERE same part)``
    decorrelated the Spark way: one window min per part, equality
    filter, deterministic tie-break.

    Exactness: unit price = floor(cents·10000 / centi-qty) — an exact
    integer both engines divide identically (a DOUBLE ratio would make
    the min's tie set engine-dependent); ties inside a part break on
    (unit price, suppkey) via row_number, so exactly ONE winner per
    part.  Output is the ``top_n`` parts by (unit_price asc, partkey)
    — Q2's 100-row report shape, a TakeOrdered heap.

    Plan: lineitem contracts map-side to (part, supplier) grain before
    the window (the partsupp table Q2 scans is exactly this
    contraction); supplier/nation are broadcast dims.
    """
    ps = (
        lineitem.select(
            "l_partkey",
            "l_suppkey",
            F.expr(
                "CAST((CAST(floor(l_extendedprice * 100) AS BIGINT)"
                " * 10000) div CAST(floor(l_quantity * 100) AS BIGINT)"
                " AS BIGINT)"
            ).alias("unit_price"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit_price").alias("unit_price"))
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("unit_price"), F.col("l_suppkey")
    )
    best = (
        ps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    out = (
        best.join(F.broadcast(supplier), best.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("s_suppkey"),
            F.col("s_name"),
            F.col("n_name"),
            "unit_price",
        )
    )
    return out.orderBy(
        F.col("unit_price"), F.col("p_partkey")
    ).limit(top_n)


def custdist(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 (customer distribution): the histogram of per-customer
    order counts INCLUDING zero-order customers — the left-join-then-
    count-then-histogram double aggregation that trips naive engines
    (an inner join silently drops the zero bucket, the most
    interesting row of the report).

    Plan: one left join at customer grain (orders pre-contracted to
    per-customer counts, so the join build side is customer-grain, not
    fact-grain), then a #distinct-counts-grain histogram.  Output:
    (c_count, custdist) ordered by the driver's hash-insensitive sort.
    """
    per_cust = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    joined = customer.join(
        per_cust, customer.c_custkey == per_cust.ck, "left"
    ).select(
        F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("c_count")
    )
    return joined.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )
