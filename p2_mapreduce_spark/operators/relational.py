"""Relational operator surface (SURVEY.md §2.3 *(derived)* ops).

The reference has no relational algebra — its expressible surface is
map / hash-shuffle / group-reduce (SURVEY.md §2.2).  Each operator here is
the direct DataFrame expression of a composition of those primitives
(e.g. reduce-side join = map-tag + group-by-key; top-k per group =
shuffle + per-key sort M6 + limit), which Catalyst then plans far better
than the paradigm's hand-rolled form (broadcast instead of shuffle,
partial aggs, pushdown).

Scale notes per operator are inline; the common rules:
- dimension tables (region/nation/customer at TPC-H shape) are broadcast —
  no shuffle of the fact side;
- every aggregate uses the deterministic decimal protocol
  (functions/numeric.py) — reproducible under any partitioning;
- predicates/projections sit directly on the scan so Catalyst pushes them
  into parquet (verified by plans/explain.py audits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from p2_mapreduce_spark.functions.numeric import davg, dsum


def filter_project(lineitem: DataFrame, date_lo: str, date_hi: str) -> DataFrame:
    """Projection + filter — the map-with-predicate special case of M1.
    Both the date filter and the 5-column projection reach the parquet
    scan (PushedFilters/ReadSchema), so at 100 TB this reads a fraction
    of the table."""
    return lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        # product of two 2-decimal doubles: deterministic IEEE scalar math
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("disc_price"),
    )


def agg_pricing(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (M5+M7+M9 as one groupBy).
    Spark runs it partial→final automatically (the map-side combine the
    reference lacks); 6 groups regardless of scale → the reduce side is
    trivially small, the scan dominates."""
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, scale=4, precision=24).alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def join_orders_customer(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Equi inner join + aggregate — the reduce-side-join composition.
    ``customer`` is broadcast: at TPC-H shape it is 1/10 the fact table
    and joins per-row; broadcasting removes the orders-side shuffle
    entirely (at true 100 TB with a huge customer table, drop the hint
    and let AQE pick shuffled hash join)."""
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_totalprice"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
    )


def semi_anti(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-semi (EXISTS) and left-anti (NOT EXISTS) in one result,
    tagged.  Both sides broadcast the orders key set; no fact shuffle."""
    okeys = orders.select("o_custkey")
    semi = customer.join(F.broadcast(okeys), customer.c_custkey == okeys.o_custkey, "left_semi")
    anti = customer.join(F.broadcast(okeys), customer.c_custkey == okeys.o_custkey, "left_anti")
    tag = lambda df, t: df.select("c_custkey", "c_name", F.lit(t).alias("tag"))  # noqa: E731
    return tag(semi, "has_orders").unionAll(tag(anti, "no_orders"))


def topk_per_group(orders: DataFrame, k: int = 3) -> DataFrame:
    """Top-k orders per customer: Window + row_number — the shuffle +
    per-key sort (M6) + limit composition.  Tie-broken on o_orderkey so
    the result is deterministic (row_number over a non-unique ordering is
    not).  One shuffle on the partition key; no global sort."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


def union_parts(lineitem: DataFrame) -> DataFrame:
    """M10 (concatenate) as a relational op: union of two disjoint
    filters.  Spark unions are metadata-only (no shuffle, no dedup) —
    exactly the reference's file concatenation, but lazy."""
    cols = ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"]
    high = lineitem.filter(F.col("l_quantity") >= 25).select(*cols)
    low = lineitem.filter(F.col("l_quantity") < 25).select(*cols)
    return high.unionAll(low)


def groupby_collect(lineitem: DataFrame) -> DataFrame:
    """M5 made visible: the grouped value list per key.  Sorted and
    serialized so the result is set-semantics-stable; the raw
    collect_list order is partition-dependent and must never be exposed
    (same reason the reference sorts keys before reducing, M6)."""
    return lineitem.groupBy("l_orderkey").agg(
        F.array_join(
            F.sort_array(F.collect_list(F.col("l_linenumber").cast("string"))), ","
        ).alias("linenumbers"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def sorted_output(lineitem: DataFrame) -> DataFrame:
    """M9's global sort as an operator: range-partitioned distributed
    sort (sampled split points), not the reference's single-node merge."""
    return lineitem.select("l_orderkey", "l_linenumber", "l_quantity").orderBy(
        "l_orderkey", "l_linenumber"
    )


def cube_agg(lineitem: DataFrame) -> DataFrame:
    """CUBE over (returnflag, linestatus), pre-aggregated: a naive
    ``df.cube(...)`` Expands EVERY input row ×4 (one copy per grouping
    set) before the partial agg — 4× the corpus through the Expand at
    100 TB.  Since COUNT and the decimal SUM are both re-aggregable,
    aggregate to the finest (flag, status) grain first (map-side
    combined, one narrow shuffle at cell grain), then cube the handful
    of cells: the Expand runs over ~6 rows at ANY corpus size.  Results
    are bit-identical — decimal partials re-sum exactly, the double
    surface cast happens once at the end (dsum protocol)."""
    cells = lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_sq"),
    )
    return cells.cube("l_returnflag", "l_linestatus").agg(
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.sum("_sq").cast("double").alias("sum_qty"),
    )


def pivot_status(lineitem: DataFrame) -> DataFrame:
    """Pivot linestatus values into columns.  The explicit value list
    ["F","O"] matters at scale: without it Spark runs an extra distinct
    job to discover pivot values before planning."""
    return (
        lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
    )


def intersect_keys(orders: DataFrame) -> DataFrame:
    """INTERSECT (distinct) — customers with both open and finished
    orders.  Planned as a hash semi-join on distinct sets."""
    open_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_keys.intersect(done_keys)


def except_keys(orders: DataFrame) -> DataFrame:
    """EXCEPT (distinct) — customers with open but no finished orders.
    ``subtract`` is Spark's EXCEPT DISTINCT (``exceptAll`` would keep a
    key that appears more often on the open side than the finished side)."""
    open_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_keys.subtract(done_keys)


def multiset_ops(orders: DataFrame) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — the multiplicity-preserving set ops
    (a key appearing 3× open and 1× finished survives EXCEPT ALL twice,
    INTERSECT ALL once).  Both plan as one count-per-side aggregate +
    multiplicity arithmetic — one shuffle each, no row explosion — and
    both outputs are aggregated here to (key, multiplicity) so the result
    is hashable regardless of row order."""
    open_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    exc = open_keys.exceptAll(done_keys).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    ).select("o_custkey", "n", F.lit("except_all").alias("op"))
    its = open_keys.intersectAll(done_keys).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    ).select("o_custkey", "n", F.lit("intersect_all").alias("op"))
    return exc.unionByName(its)


def scalar_fns(part: DataFrame) -> DataFrame:
    """Scalar string/math function surface in one projection.  Everything
    chosen here is IEEE-exact cross-engine (sqrt yes, ln/exp no — libm
    last-bit drift; round() excluded — half-up vs half-even divergence)."""
    return part.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 8)).alias("name_prefix"),
        # bigint casts: DuckDB's length/abs-of-int return BIGINT — keep the
        # result schema engine-neutral
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws("_", "p_brand", "p_type").alias("brand_type"),
        F.abs(F.col("p_size") - 25).cast("bigint").alias("size_dist"),
        F.sqrt(F.col("p_retailprice")).alias("price_sqrt"),
        F.floor(F.col("p_retailprice")).cast("bigint").alias("price_floor"),
        F.ceil(F.col("p_retailprice")).cast("bigint").alias("price_ceil"),
        F.pmod(F.col("p_partkey"), F.lit(7)).alias("key_mod7"),
        (F.col("p_retailprice") * F.col("p_size")).alias("price_volume"),
    )


def date_parts(orders: DataFrame) -> DataFrame:
    """Date/time scalar surface: calendar parts + truncation + agg.
    (dayofweek excluded: Spark counts 1=Sunday, DuckDB 0=Sunday.)"""
    return (
        orders.select(
            # bigint: DuckDB's calendar extractors return BIGINT — keep
            # the contract's result schema engine-neutral
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.quarter("o_orderdate").cast("bigint").alias("qtr"),
            F.month("o_orderdate").cast("bigint").alias("mo"),
            F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
            "o_totalprice",
        )
        .groupBy("yr", "qtr", "mo")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("dom").alias("first_dom"),
            F.max("dom").alias("last_dom"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )


def range_join_quantity_bands(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Theta (range) join: count lineitems whose quantity falls in
    [p_size, p_size+5) for each distinct size band.

    Bucketized into an EQUI-join (the docstring'd scale path, landed in
    round 8): because every band has integer lower bound and constant
    width 5, a fact row with quantity q matches exactly the integer
    candidates in [floor(q-5)+1, floor(q)] — explode those 5 and
    broadcast-hash-join on band_lo.  vs the former
    BroadcastNestedLoopJoin this replaces #bands comparisons per row
    with 5 hash probes, reuses the already-warm BHJ codegen path
    (BNLJ first-call codegen cost ~1.9 s solo — the round-7 "2.2x
    drift"), and — unlike BNLJ — survives a huge band table by
    dropping the broadcast hint and letting the equi-join shuffle."""
    bands = part.select(F.col("p_size").cast("bigint").alias("band_lo")).distinct()
    candidates = lineitem.select(
        "l_quantity",
        F.explode(
            F.sequence(
                F.floor(F.col("l_quantity") - 5).cast("bigint") + 1,
                F.floor(F.col("l_quantity")).cast("bigint"),
            )
        ).alias("band_lo"),
    )
    return (
        candidates.join(F.broadcast(bands), "band_lo")
        .groupBy("band_lo")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
        )
    )


def asof_join_purchase_signup(events: DataFrame) -> DataFrame:
    """As-of (backward) join: for each 'purchase' event, the most recent
    'signup' timestamp of the same user at-or-before it.

    Spark lacks a native ASOF join; the scalable composition is
    union-the-sides + one per-user window with last_value(ignorenulls) —
    a single shuffle on user_id, no pairwise comparison (vs. the naive
    range-join which is quadratic per user).  Ties (signup at exactly the
    purchase ts) resolve signup-first to match inclusive >= semantics of
    DuckDB's ASOF JOIN oracle."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_p"), F.lit(None).cast("timestamp").alias("s_ts")
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_p"), F.col("ts").alias("s_ts")
    )
    both = purchases.unionByName(signups)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        both.withColumn("signup_ts", F.last("s_ts", ignorenulls=True).over(w))
        .filter(F.col("is_p") == 1)
        .select("event_id", "user_id", "ts", "signup_ts")
    )


def distinct_stats(lineitem: DataFrame) -> DataFrame:
    """Exact distinct counts + exact interpolated median per group (the
    approx_* variants — HLL/KLL sketches — are engine-specific and live in
    approx_distinct/rows-only).

    The percentile runs as its OWN aggregate, joined back on the group
    key (#groups rows): fusing it into the multi-distinct agg drags the
    percentile's full-multiset partial state through the Expand node the
    two count-distincts plan to — every value buffered 3× (6.3 s vs
    1.4 s at sf0.1).  At 100 TB the same split keeps the percentile's
    merge state at values-per-group × 1, and the distinct pairs dedupe
    map-side before their shuffle."""
    distincts = lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    median = lineitem.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("median_price")
    )
    return distincts.join(median, "l_returnflag").select(
        "l_returnflag", "n_orders", "n_parts", "median_price"
    )


def approx_distinct(lineitem: DataFrame) -> DataFrame:
    """HLL-sketch distinct estimation.  At 100 TB this replaces
    countDistinct's exact shuffle with fixed-size mergeable sketches.

    The hash-checked column is the EXACT distinct count; the sketch
    surfaces as `approx_ok` — the HLL estimate within 3·rsd of exact,
    deterministic for a fixed dataset (HLL is hash-based, not random) —
    which the oracle pins as constant TRUE.  pytest bounds the raw
    estimate.

    The HLL aggregate runs OUTSIDE the count-distinct agg and joins back
    on the group key: planned together, the exact distinct's Expand node
    replicates every row through the sketch's update loop too (the same
    Expand-drag distinct_stats documents)."""
    exact = lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders")
    )
    approx = lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("_hll")
    )
    return exact.join(approx, "l_returnflag").select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("_hll") - F.col("exact_orders"))
            <= 0.06 * F.col("exact_orders")
        ).alias("approx_ok"),
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1997-06-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-shaped three-table join: top-k open orders of one market
    segment by outstanding revenue.  The filtered customer dim broadcasts
    (no fact shuffle for the first join); orders↔lineitem is the one real
    shuffle, on the join key that the aggregate then reuses; both date
    filters and all projections push to the scans.  Deterministic top-k:
    revenue (exact decimal) desc, then l_orderkey."""
    cut = F.lit(cutoff).cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    opens = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    lines = lineitem.filter(F.col("l_shipdate") > cut).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    revenue = dsum(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
        scale=4,
        precision=24,
    )
    return (
        lines.join(opens, lines.l_orderkey == opens.o_orderkey)
        .join(F.broadcast(cust), opens.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(k)
    )


def grouping_sets_agg(lineitem: DataFrame) -> DataFrame:
    """GROUPING SETS ((l_returnflag), (l_linestatus)) — the general form
    rollup/cube can't express (non-hierarchical, non-exhaustive set list).
    One shuffle; each row expands map-side only to the sets it belongs to
    (2 here vs cube's 4), so shuffle volume scales with the set list, not
    2^dims.  Pre-aggregated to (flag, status) cells first so the Expand
    runs over ~6 rows at any corpus size (cube_agg's device)."""
    cells = lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_sq"),
    )
    return cells.groupingSets(
        [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
    ).agg(
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.sum("_sq").cast("double").alias("sum_qty"),
    )


def minmax_by(orders: DataFrame) -> DataFrame:
    """min_by / max_by (argmin/argmax) per priority: the totalprice carried
    by the smallest/largest order key.  The ordering column is the UNIQUE
    primary key, so the result is total-order deterministic — min_by over
    a column with duplicate extremes is partition-dependent and must not
    be exposed (same rule as groupby_collect).  Partial-aggregates
    map-side like any min/max: one tiny shuffle row per group per
    partition."""
    return orders.groupBy("o_orderpriority").agg(
        F.max_by("o_totalprice", "o_orderkey").alias("price_of_last_key"),
        F.min_by("o_totalprice", "o_orderkey").alias("price_of_first_key"),
        F.max("o_orderkey").alias("last_key"),
        F.min("o_orderkey").alias("first_key"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def conditional_agg(lineitem: DataFrame) -> DataFrame:
    """Filtered aggregation (COUNT/SUM ... FILTER): per linestatus, how
    much of the volume is returned.  One pass, no joins — the conditional
    folds into the partial aggregate, so this costs exactly one scan +
    one 2-group shuffle regardless of scale."""
    returned = F.col("l_returnflag") == "R"
    return lineitem.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(returned).alias("n_returned"),
        dsum(F.when(returned, F.col("l_quantity")).otherwise(F.lit(0.0))).alias(
            "qty_returned"
        ),
        (F.count_if(returned) / F.count(F.lit(1))).alias("return_frac"),
    )


def corr_stats(lineitem: DataFrame) -> DataFrame:
    """Pearson correlation + sample covariance of quantity↔extendedprice
    per returnflag, via sufficient statistics on the deterministic decimal
    protocol: the five sums (Σx Σy Σx² Σy² Σxy) aggregate as EXACT
    decimals (order-independent under any partitioning), and the closing
    formula is a fixed shape of IEEE double mul/sub/div/sqrt — every op
    correctly rounded, so the result is bit-identical cross-engine.
    The built-in ``corr()`` is a streaming co-moment update whose float
    accumulation is shuffle-order-dependent — unusable under the engine's
    reproducibility contract (functions/numeric.py)."""
    # Exact decimals FIRST, then decimal×decimal (exact in any engine) —
    # never cast a product of large doubles to decimal (the rounding of
    # its 17-significant-digit repr to a fixed scale is engine-dependent).
    # Sums surface to double THROUGH THEIR STRING FORM: a >2^53 decimal
    # cast straight to double can differ by 1 ulp between engines
    # (one correctly-rounded conversion vs int128→double, then ÷10^scale),
    # but strtod of the exact digits is correctly rounded everywhere.
    xd = F.col("l_quantity").cast("decimal(18,2)")
    yd = F.col("l_extendedprice").cast("decimal(18,2)")
    surf = lambda c: F.sum(c).cast("string").cast("double")  # noqa: E731
    sums = lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        surf(xd).alias("sx"),
        surf(yd).alias("sy"),
        surf(xd * xd).alias("sxx"),
        surf(yd * yd).alias("syy"),
        surf(xd * yd).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cov_num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = nd * F.col("syy") - F.col("sy") * F.col("sy")
    return sums.select(
        "l_returnflag",
        "n",
        (cov_num / (F.sqrt(var_x) * F.sqrt(var_y))).alias("corr_qty_price"),
        (cov_num / (nd * (nd - F.lit(1.0)))).alias("covar_samp_qty_price"),
    )


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation in one region, counting only
    lineitems whose supplier and ordering customer share that nation
    (a 6-table join with a non-hierarchical equality between two
    dimension paths).

    Scale plan: region→nation is folded FIRST and broadcast, so the fact
    tables are filtered to the region's nations before any fact-side
    shuffle; supplier and customer are broadcast (dimension-sized at
    TPC-H ratios).  The only big shuffle is lineitem⋈orders on orderkey —
    everything else rides along as broadcast hash joins, which `explain`
    confirms.  The c_nationkey = s_nationkey condition is applied as a
    post-broadcast filter, never as a join key (it would skew: 25 nations)."""
    nations_in_region = (
        nation.join(
            F.broadcast(region.where(F.col("r_name") == region_name)),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    cust = customer.join(
        F.broadcast(nations_in_region),
        customer.c_nationkey == nations_in_region.n_nationkey,
    ).select("c_custkey", F.col("c_nationkey").alias("cust_nation"))
    supp = supplier.join(
        F.broadcast(nations_in_region),
        supplier.s_nationkey == nations_in_region.n_nationkey,
    ).select("s_suppkey", F.col("s_nationkey").alias("supp_nation"), "n_name")
    return (
        lineitem.join(orders.select("o_orderkey", "o_custkey"),
                      lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), lineitem.l_suppkey == supp.s_suppkey)
        .where(F.col("cust_nation") == F.col("supp_nation"))
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1.0 - F.col("l_discount")), 4, 24)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def price_histogram(orders: DataFrame, bucket_width: float = 25000.0) -> DataFrame:
    """Fixed-width histogram of order prices: bucket index, bounds, count,
    exact per-bucket revenue.  The bucket index is ``floor(price/width)``
    — one IEEE division + floor, deterministic cross-engine — so this is
    a plain groupBy: partial-aggregated map-side, one tiny shuffle of
    #buckets rows per partition, no sort, scales like any agg."""
    bucket = F.floor(F.col("o_totalprice") / bucket_width)
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("bucket_revenue"),
    ).select(
        "bucket",
        (F.col("bucket") * bucket_width).alias("lo"),
        ((F.col("bucket") + 1) * bucket_width).alias("hi"),
        "n_orders",
        "bucket_revenue",
    )


def unpivot_pricing(lineitem: DataFrame) -> DataFrame:
    """Wide→long reshape (unpivot/melt): the per-returnflag pricing
    aggregate turned into (flag, measure, value) rows.  The agg shrinks
    the data to #flags rows BEFORE the unpivot, so the reshape —
    a map-side expression expansion, no shuffle of its own — touches
    a handful of rows regardless of input scale."""
    wide = lineitem.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        davg("l_discount").alias("avg_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "avg_disc"],
        variableColumnName="measure",
        valueColumnName="value",
    )


#: Hard ceiling for `edit_distance_pairs`' quadratic self-join.  1e5 rows
#: means ~5e9 candidate pairs — already the outer edge of sane for an
#: exact all-pairs pass; anything larger must go through blocking.
EDIT_DISTANCE_MAX_ROWS = 100_000


def edit_distance_pairs(
    nation: DataFrame, max_dist: int = 8, max_rows: int = EDIT_DISTANCE_MAX_ROWS
) -> DataFrame:
    """Fuzzy string matching: Levenshtein distance between every pair of
    nation names under a cap.  The classic entity-resolution primitive;
    `levenshtein` is a JVM built-in (classic DP — integer-exact, so
    oracle-comparable).  The self-join is quadratic by design: apply it
    only to dimension-sized or pre-blocked inputs (pair with
    `operators.dedup.blocked_linkage` for document-scale fuzzy matching).

    The dimension-sized contract is ENFORCED, not just documented: a
    cheap count() guard fails fast above `max_rows` (default 1e5 —
    ~5e9 pairs) so the operator cannot be pointed at a fact table by
    accident.  The count is one columnless scan of the input — noise
    next to the quadratic join it gates."""
    n = nation.count()
    if n > max_rows:
        raise ValueError(
            f"edit_distance_pairs is an exact quadratic self-join and the "
            f"input has {n} rows (> max_rows={max_rows}, ~{n * n // 2:.0e} "
            f"candidate pairs). Use operators.dedup.blocked_linkage for "
            f"document-scale fuzzy matching, or raise max_rows explicitly."
        )
    a = nation.select(F.col("n_name").alias("name_a"))
    b = nation.select(F.col("n_name").alias("name_b"))
    return (
        a.join(b, F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .where(F.col("dist") <= max_dist)
    )


def large_volume_orders(
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    min_qty: float = 150.0,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds a
    threshold, with customer names — an aggregate-HAVING filter used as a
    join pruner.

    Scale plan: aggregate lineitem FIRST and filter to the (rare) heavy
    orders, so the orders/customer joins see only qualifying keys — the
    aggregate side shrinks from |lineitem| to |heavy orders| before any
    join.  The qualifying set is then small enough that AQE turns the
    orders join into a broadcast at runtime; never join raw lineitem to
    orders and filter after."""
    heavy = (
        lineitem.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > min_qty)
    )
    return (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


def cheapest_supplier_per_nation(supplier: DataFrame) -> DataFrame:
    """Group-extreme filter (TPC-H Q2's inner shape): the supplier(s) with
    the minimum account balance in each nation, ties included.  One window
    over the group key — no self-join against a per-group aggregate (the
    naive decorrelation), which would scan and shuffle the table twice.
    min/rank comparisons are exact (no arithmetic), so ties are
    well-defined cross-engine."""
    w = Window.partitionBy("s_nationkey")
    return (
        supplier.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_nationkey", "s_suppkey", "s_name", "s_acctbal")
    )


def revenue_share(orders: DataFrame) -> DataFrame:
    """Percent-of-total (ratio_to_report): each priority class's share of
    total revenue.  Aggregate FIRST (5 rows), then a whole-partition
    window for the total — the window runs over #groups rows, so the
    single partition is bounded by the group cardinality, not the data.
    Shares are exact-decimal sums with one final IEEE division each."""
    per = orders.groupBy("o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    # the grand total stays DECIMAL through the window (a double window
    # sum would depend on the groups' partition order), then one division
    w = Window.partitionBy()
    return per.select(
        "o_orderpriority",
        F.col("rev_dec").cast("double").alias("revenue"),
        "n_orders",
        (
            F.col("rev_dec").cast("double")
            / F.sum("rev_dec").over(w).cast("double")
        ).alias("revenue_share"),
    )


def global_topk(orders: DataFrame, k: int = 100) -> DataFrame:
    """Global top-k (ORDER BY ... LIMIT k): the k most expensive orders,
    tie-broken by the unique key for a total order.  Spark plans this as
    TakeOrderedAndProject — each partition keeps only its local top-k and
    the driver merges k·P rows — NOT a full global sort; at 100 TB this is
    the difference between a heap pass and a range-partitioned shuffle of
    everything (sorted_output is the full-sort counterpart)."""
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(k)
    )


def approx_quantiles(lineitem: DataFrame) -> DataFrame:
    """Quantile-sketch aggregation: percentile_approx (Greenwald-Khanna)
    per group, alongside the exact interpolated percentile.  Sketches are
    mergeable fixed-size state — the 100 TB replacement for exact
    percentiles, whose state is the whole sorted column.

    Hash-checked columns are the EXACT percentiles (Spark `percentile`
    and DuckDB `quantile_cont` are both type-R7 linear interpolation and
    agree bit-for-bit on this data); the sketch result surfaces as
    `approx_ok` — all three GK estimates within 1% relative of exact,
    which the eps=1e-4 rank guarantee satisfies by orders of magnitude —
    so the oracle can pin it as a constant TRUE.  pytest additionally
    bounds the raw sketch error."""
    pct = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    agg = lineitem.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", pct, F.lit(10000)).alias("ap"),
        F.percentile("l_extendedprice", pct).alias("ex"),
    )
    ok = [
        (F.abs(F.col("ap")[i] - F.col("ex")[i]) <= 0.01 * F.col("ex")[i])
        for i in range(3)
    ]
    return agg.select(
        "l_returnflag",
        F.col("ex")[0].alias("p25"),
        F.col("ex")[1].alias("p50"),
        F.col("ex")[2].alias("p75"),
        (ok[0] & ok[1] & ok[2]).alias("approx_ok"),
    )


def supplier_by_nation(
    supplier: DataFrame, nation: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Supplier-side star join: per-nation supplier counts, balances, and
    shipped quantity.  The nation dim broadcasts; supplier↔lineitem is the
    real shuffle, on s_suppkey=l_suppkey; supplier stats are pre-aggregated
    before the nation join so the broadcast side joins 25 rows, not 10k."""
    ship = lineitem.groupBy(F.col("l_suppkey").alias("sk")).agg(
        dsum("l_quantity").alias("shipped_qty")
    )
    per_supp = (
        supplier.join(ship, supplier.s_suppkey == ship.sk, "left")
        .select(
            "s_suppkey",
            "s_nationkey",
            "s_acctbal",
            F.coalesce("shipped_qty", F.lit(0.0)).alias("shipped_qty"),
        )
    )
    return (
        per_supp.join(F.broadcast(nation), per_supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            dsum("s_acctbal").alias("sum_acctbal"),
            dsum("shipped_qty").alias("sum_shipped"),
        )
    )


def rollup_nation(customer: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    """Hierarchical totals region → nation → grand total.  Both dims are
    broadcast; ROLLUP expands to 3 grouping sets in one pass (no
    re-scan)."""
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    # pre-aggregate to (region, nation) cells before the ROLLUP Expand —
    # the Expand then runs over ≤ #nations rows at any corpus size (see
    # cube_agg for the re-aggregability argument; bit-identical results)
    cells = joined.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("_sq"),
    )
    return cells.rollup("r_name", "n_name").agg(
        F.sum("_n").cast("bigint").alias("n_customers"),
        F.sum("_sq").cast("double").alias("sum_acctbal"),
    )


def equidepth_histogram(orders: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Equi-depth (equal-population) histogram WITHOUT a global sort:
    bucket boundaries are the exact interpolated percentiles — computed
    in ONE aggregate pass over the column — broadcast back as scalars,
    and each row's bucket id is the count of boundaries strictly below
    its value (n_buckets-1 codegen comparisons, no window).

    The naive equi-depth construction is ``ntile`` over a global sort —
    a single-partition WindowExec that dies at scale.  This plan is two
    narrow aggregates instead: percentile state is the only thing that
    grows with data, and Spark/DuckDB both implement exact type-R7
    interpolation, so the boundaries (and therefore every bucket id)
    are bit-identical cross-engine.  Complements the fixed-width
    :func:`price_histogram` (equi-width: cheap, skew-blind; equi-depth:
    skew-adaptive, one extra pass).
    """
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    # ONE percentile aggregate with an array of fractions: a single
    # sorted-column state instead of n_buckets-1 copies of it
    bounds = orders.agg(
        F.percentile(
            "o_totalprice", F.array(*[F.lit(f) for f in fracs])
        ).alias("_bs")
    ).select(
        *[
            F.col("_bs").getItem(i - 1).alias(f"_b{i}")
            for i in range(1, n_buckets)
        ]
    )
    bucket = None
    for i in range(1, n_buckets):
        term = (F.col("o_totalprice") > F.col(f"_b{i}")).cast("int")
        bucket = term if bucket is None else bucket + term
    return (
        orders.join(F.broadcast(bounds))
        .groupBy(bucket.cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            dsum("o_totalprice").alias("bucket_revenue"),
        )
    )


def fk_integrity(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Referential-integrity audit: orphan-row counts for every foreign
    key in the star schema — ``(relation, n_orphans)``.

    Each check is a LEFT ANTI join (fact side projected to the key
    before the shuffle; dimension sides broadcast when small) feeding a
    1-row count; the four audits union into one result.  This is the
    ingest-gate validation the reference's storage plane has no language
    for — on Spark it is four cheap plans sharing the fact scans.
    """
    def orphans(fact, key, dim, dkey, name):
        f = fact.select(F.col(key).alias("_fk"))
        d = dim.select(F.col(dkey).alias("_dk"))
        return (
            f.join(d, F.col("_fk") == F.col("_dk"), "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("relation"), "n_orphans")
        )

    return (
        orphans(lineitem, "l_orderkey", orders, "o_orderkey",
                "lineitem->orders")
        .unionByName(orphans(lineitem, "l_partkey", part, "p_partkey",
                             "lineitem->part"))
        .unionByName(orphans(lineitem, "l_suppkey", supplier, "s_suppkey",
                             "lineitem->supplier"))
        .unionByName(orphans(orders, "o_custkey", customer, "c_custkey",
                             "orders->customer"))
    )


def nearest_event_join(events: DataFrame, within_hours: int = 24) -> DataFrame:
    """NEAREST-event join (two-sided as-of with tolerance): each
    'purchase' pairs with the closest 'signup' of the same user within
    ±``within_hours`` — the sensor/price-alignment semantics
    (:func:`asof_join_purchase_signup` is one-directional backward;
    this is the |Δt|-minimizing variant both directions).

    Same scalable composition, applied twice over ONE shuffle: union
    the sides, then a backward window (latest signup at-or-before) AND
    a forward window (earliest signup strictly after) share the same
    (user_id)-partitioned sort — Spark evaluates both frames in a
    single Window stage, no pairwise range join, no quadratic term.
    The nearest of the two candidates wins by exact integer-µs
    distance; ties at equal distance resolve to the EARLIER signup
    (deterministic, engine-mirrorable); candidates outside the
    tolerance are nulled.

    Returns ``(event_id, user_id, ts, nearest_signup_ts, gap_us)``
    with ``gap_us`` signed (negative = signup before purchase).
    """
    tol_us = int(within_hours) * 3600 * 1_000_000
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.lit(1).alias("is_p"),
        F.lit(None).cast("timestamp_ntz").alias("s_ts"),
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts",
        F.lit(0).alias("is_p"),
        F.col("ts").alias("s_ts"),
    )
    both = purchases.unionByName(signups)
    order = [F.col("ts"), F.col("is_p"), F.col("event_id")]
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    cand = (
        both.withColumn("back", F.last("s_ts", ignorenulls=True).over(w_back))
        .withColumn("fwd", F.first("s_ts", ignorenulls=True).over(w_fwd))
        .filter(F.col("is_p") == 1)
    )
    d_back = F.expr("timestampdiff(MICROSECOND, ts, back)")   # <= 0
    d_fwd = F.expr("timestampdiff(MICROSECOND, ts, fwd)")     # > 0
    back_ok = F.col("back").isNotNull() & (-d_back <= F.lit(tol_us))
    fwd_ok = F.col("fwd").isNotNull() & (d_fwd <= F.lit(tol_us))
    pick_back = back_ok & (~fwd_ok | (-d_back <= d_fwd))
    nearest = F.when(pick_back, F.col("back")).when(fwd_ok, F.col("fwd"))
    gap = F.when(pick_back, d_back).when(fwd_ok, d_fwd)
    return cand.select(
        "event_id",
        "user_id",
        "ts",
        nearest.alias("nearest_signup_ts"),
        gap.cast("bigint").alias("gap_us"),
    )
