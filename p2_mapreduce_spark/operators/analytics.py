"""Window-analytic and outer-join operators (SURVEY.md §2.3 — window
functions / ranking / analytic frames; set-complete joins).

The reference's paradigm can only express per-key sequential passes as a
reduce over the grouped value list (SURVEY.md M5-M7); these are the same
computations as first-class window frames — one shuffle on the partition
key, sequential frame evaluation inside each partition, no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def window_analytics(orders: DataFrame) -> DataFrame:
    """lag / lead / running total / moving average per customer order
    history.  One shuffle on o_custkey; all five analytics share the same
    window partition so Spark evaluates them in a single Window node.

    Determinism: frame order is tie-broken by o_orderkey (unique);
    running/moving sums use the decimal protocol (functions/numeric.py) so
    they are exact at any partitioning; the moving average is
    exact-decimal-sum ÷ count — one IEEE division.
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    w_3 = w.rowsBetween(-2, 0)
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.sum(dec).over(w_run).cast("double").alias("run_total"),
        F.row_number().over(w).cast("bigint").alias("order_seq"),
        (F.sum(dec).over(w_3).cast("double") / F.count(F.lit(1)).over(w_3)).alias(
            "mov_avg3"
        ),
    )


def rank_metrics(orders: DataFrame) -> DataFrame:
    """The full ranking-function family over one shared window: rank /
    dense_rank / percent_rank / cume_dist / ntile(4) of each order within
    its priority class by price.  One shuffle on o_orderpriority; all five
    functions evaluate in a single Window node pass.

    Determinism: ntile assigns by ROW POSITION, so the order-by must be a
    total order — o_orderkey (unique) breaks price ties.  rank/percent_rank
    then never actually tie, which keeps the two engines' tie conventions
    out of the comparison entirely."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


def cumulative_revenue(orders: DataFrame) -> DataFrame:
    """Running revenue per day: orders are bucketed to their day, summed
    exactly (decimal protocol), then a running total over an ordered
    window of one row per day.  The heavy step is the groupBy (scales
    out); the window then runs over ~#days rows in a SINGLE partition —
    correct here because the grain is calendar days (bounded), but a
    running total over an unbounded key would need range partitioning +
    per-partition offsets instead (documented, not needed at this grain)."""
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "n_orders",
        F.col("rev_dec").cast("double").alias("day_revenue"),
        # running sum stays DECIMAL until the final surface cast — exact,
        # order-independent, engine-neutral
        F.sum("rev_dec").over(w).cast("double").alias("cum_revenue"),
    )


def trailing_revenue(orders: DataFrame, days: int = 7) -> DataFrame:
    """RANGE-frame window: per day, revenue over the trailing ``days``-day
    window — frame membership by ORDER-KEY VALUE (epoch seconds), not row
    position, so calendar gaps are handled correctly (a rows-frame would
    silently span missing days).

    Same scale shape as cumulative_revenue: the heavy groupBy shrinks to
    one row per day first; the single-partition window is bounded by the
    calendar grain.  The frame sum stays DECIMAL until the surface cast."""
    daily = orders.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec")
    )
    w = (
        Window.orderBy(F.unix_timestamp("day"))
        .rangeBetween(-(days - 1) * 86400, 0)
    )
    return daily.select(
        "day",
        F.col("rev_dec").cast("double").alias("day_revenue"),
        F.sum("rev_dec").over(w).cast("double").alias(f"trail_{days}d_revenue"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_days_in_window"),
    )


def above_customer_avg(orders: DataFrame) -> DataFrame:
    """Correlated scalar subquery, decorrelated: orders priced above their
    customer's average.  The correlated form (``WHERE o_totalprice >
    (SELECT AVG(...) WHERE same customer)``) decorrelates to exactly this
    aggregate + self-join — written directly so the plan is explicit: one
    shuffle for the per-customer average, co-partitioned join back (AQE
    reuses the o_custkey partitioning)."""
    cavg = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("o_totalprice")
        ).alias("cust_avg")
    )
    return (
        orders.join(cavg, orders.o_custkey == cavg.ck)
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


def customer_order_counts(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left outer join with null-fill: every customer with their order
    count and spend, zero-filled for order-less customers.  The aggregate
    side is pre-shrunk to one row per customer before the join (join the
    aggregate, never the raw fact table, when only aggregates are needed
    — at 100 TB this is the difference between joining 1e9 and 1e7 rows)."""
    stats = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("s"),
    )
    return customer.join(stats, customer.c_custkey == stats.ck, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce("n", F.lit(0)).alias("n_orders"),
        F.coalesce("s", F.lit(0.0)).alias("sum_spend"),
    )


def outer_join_status(orders: DataFrame) -> DataFrame:
    """Full outer join with null-fill: per-customer open-order stats vs
    finished-order stats.  Both sides are aggregates of the same fact
    table → after AQE both shuffles reuse the o_custkey partitioning and
    the join itself is co-partitioned (no third shuffle)."""
    open_stats = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_open"))
    )
    done_stats = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_done"))
    )
    return (
        open_stats.join(done_stats, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            F.coalesce("n_open", F.lit(0)).alias("n_open"),
            F.coalesce("n_done", F.lit(0)).alias("n_done"),
        )
    )


def basket_items(lineitem: DataFrame) -> DataFrame:
    """The distinct (l_orderkey, l_partkey) basket membership table —
    the ONE fact-grain pass every market-basket operator (copurchase /
    item_cosine / assoc_rules) opens with, factored out so the suite
    can compute it once and fan it out (the ``__spark_entry__``
    shared-stage memo)."""
    return lineitem.select("l_orderkey", "l_partkey").distinct()


def copurchase_pairs(
    lineitem: DataFrame, top_n: int = 50, items: DataFrame | None = None
) -> DataFrame:
    """Market-basket co-occurrence: the ``top_n`` part pairs most often
    bought in the same order — the counting core of item-item
    collaborative filtering ("customers who bought X also bought Y").

    One distinct pass to (order, part) grain, then a self-join on the
    order key.  The quadratic term is bounded by BASKET size (items per
    order — single digits in any retail schema), not by catalog or order
    count, so the join output is ~avg_basket²/2 × orders: linear in the
    fact table.  A pathological mega-basket would show up in
    :func:`~p2_mapreduce_spark.operators.profile.key_skew_profile` on the
    order key before it hurt.  ``part_a < part_b`` halves the pairs and
    canonicalizes orientation; the final cut is TakeOrderedAndProject
    (count desc, then pair asc — fully deterministic).

    ``items`` short-circuits the distinct (order, part) basket pass
    with a pre-built :func:`basket_items` table — the shared stage of
    the basket family (copurchase / item_cosine / assoc_rules)."""
    if items is None:
        items = basket_items(lineitem)
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(top_n)
    )


def skyline_frontier(
    part: DataFrame,
    price_col: str = "p_retailprice",
    size_col: str = "p_size",
) -> DataFrame:
    """2-D Pareto frontier (skyline): the parts for which no other part
    is both cheaper-or-equal AND larger-or-equal with at least one
    strict — the rows a price/size trade-off query can never exclude.

    The naive skyline is an all-pairs dominance anti-join (quadratic).
    In 2-D it collapses to a PREFIX MAX: p is dominated iff the max
    size among strictly-cheaper parts reaches p's size, or an
    equal-priced part is strictly larger.  So: contract to price grain
    (max size per distinct price — one map-side-combined aggregate),
    strict-prefix-max over ascending price via the same two-phase
    distributed pattern as curation.pack_sequences (range-partitioned,
    parallel local windows, config-bounded offset table broadcast
    back), then ONE broadcast join back to rows with a pure comparison
    — no self-join, nothing quadratic, fact table shuffled once (the
    price-grain aggregate).

    Reference seed: none (extension — classic Börzsönyi et al. skyline
    operator, expressed Spark-first).
    """
    from pyspark.sql import Window

    grain = (
        part.groupBy(price_col)
        .agg(F.max(size_col).alias("msize"))
        .repartitionByRange(F.col(price_col))
        .withColumn("pid", F.spark_partition_id())
    )
    local_prev = F.max("msize").over(
        Window.partitionBy("pid")
        .orderBy(price_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = grain.withColumn("local_prev", local_prev)
    offsets = (
        g.groupBy("pid")
        .agg(F.max("msize").alias("part_max"))
        .withColumn(
            "prev_max",
            F.max("part_max").over(
                Window.orderBy("pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("pid", "prev_max")
    )
    # strict-prefix max; greatest() skips NULLs, NULL iff globally first
    g = g.join(F.broadcast(offsets), "pid").select(
        price_col,
        "msize",
        F.greatest("local_prev", "prev_max").alias("prefix_max"),
    )
    # no broadcast hint here: the grain table is #distinct prices —
    # usually tiny, but data-bounded, so let AQE pick the strategy
    joined = part.join(g, price_col)
    dominated = F.coalesce(
        F.col("prefix_max") >= F.col(size_col), F.lit(False)
    ) | (F.col("msize") > F.col(size_col))
    return joined.filter(~dominated).select(*part.columns)


def item_cosine(
    lineitem: DataFrame, top_n: int = 50, items: DataFrame | None = None
) -> DataFrame:
    """Item-item cosine similarity over order baskets — the normalized
    form of :func:`copurchase_pairs`: ``cos(i,j) = n_ij / √(n_i · n_j)``
    with ``n_i`` = orders containing part i — ``(part_a, part_b,
    n_orders, cosine)`` for the ``top_n`` most co-bought pairs.

    Normalization turns raw co-counts into the classic item-based
    collaborative-filtering score (popular items stop dominating).  The
    plan adds ONE part-grain aggregate to the copurchase shape, joined
    back onto the (already top_n-bounded) pair list — so the extra cost
    is a catalog-grain count plus a 2×top_n-row join, nothing at fact
    grain.  The cosine is √ of an exact BIGINT product then one division
    — two correctly-rounded IEEE ops, bit-identical cross-engine.
    Ranking stays by the EXACT count (cosine is derived output), so the
    cut is deterministic.
    """
    if items is None:
        items = basket_items(lineitem)
    pairs = copurchase_pairs(lineitem, top_n, items=items)
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    fa = freq.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("n_a"))
    fb = freq.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_orders",
            (
                F.col("n_orders").cast("double")
                / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double"))
            ).alias("cosine"),
        )
    )


def top_paths(
    events: DataFrame, prefix_len: int = 5, top_n: int = 20
) -> DataFrame:
    """Path mining: the ``top_n`` most common event-type journeys,
    where a journey is each user's first ``prefix_len`` events in
    (ts, event_id) order joined with ``>`` — ``(path, n_users)``.

    ONE user-key shuffle: collect each user's (ts, event_id, type)
    structs, ``sort_array`` (struct order = lexicographic on the fields,
    and (ts, event_id) is unique, so the path is bit-deterministic under
    any partitioning), slice the prefix, join to a string; then a
    path-grain count and a TakeOrderedAndProject cut (count desc, path
    asc).  Note collect_list holds a user's FULL event list before the
    slice — fine at per-user grain; for hyperactive keys pre-filter to
    the first ``prefix_len`` events with a row_number window first
    (same shuffle count).  The path-grain count contracts map-side, so
    the wide exchange carries distinct paths only.
    """
    ordered = F.sort_array(
        F.collect_list(
            F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"))
        )
    )
    per_user = events.groupBy("user_id").agg(
        F.array_join(
            F.slice(
                F.transform(ordered, lambda s: s["event_type"]),
                1,
                prefix_len,
            ),
            ">",
        ).alias("path")
    )
    return (
        per_user.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(int(top_n))
    )


def share_of_parent(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Percent-of-parent rollup (the BI staple): per-nation revenue with
    its share of the enclosing region — ``(r_name, n_name, revenue,
    region_revenue, share)``.

    The fact table aggregates ONCE at nation grain (dims broadcast —
    they are catalog-sized); the parent total is then a window SUM over
    the nation-grain result partitioned by region — ≤ #nations rows per
    partition, grain-bounded by the dimension, never by facts.  Sums
    follow the decimal protocol; the share is one IEEE division of two
    exact sums, so every number is bit-identical cross-engine.
    """
    joined = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    grain = joined.groupBy("r_name", "n_name").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec")
    )
    w = Window.partitionBy("r_name")
    return grain.select(
        "r_name",
        "n_name",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.sum("rev_dec").over(w).cast("double").alias("region_revenue"),
        (
            F.col("rev_dec").cast("double")
            / F.sum("rev_dec").over(w).cast("double")
        ).alias("share"),
    )


def prorate_pool(
    lineitem: DataFrame,
    pool_cents: int = 10_000,
    order_col: str = "l_orderkey",
    weight_col: str = "l_extendedprice",
    line_col: str = "l_linenumber",
) -> DataFrame:
    """Exact financial proration (Hamilton / largest-remainder method):
    split a fixed per-order pool (default $100.00) across the order's
    lines proportionally to ``weight_col``, in whole cents, such that
    the allocations SUM EXACTLY to the pool — the rounding-drift
    problem every billing/revenue-attribution pipeline hits (naive
    round() leaves ±n cents on the floor and is engine-dependent at
    half-way points).

    All-integer construction: weights quantize to cents, each line's
    base share is the integral ``pool·w div W``, and the leftover
    ``R = pool − Σ base < n_lines`` goes one cent each to the R lines
    with the largest integer remainder ``pool·w mod W`` (ties broken
    by line number — a total order, so the result is deterministic
    cross-engine).  Work is one window per order (order grain, ≤7
    lines in TPC-H — partition-bounded by the natural key), zero
    floats anywhere.

    Output: (order, line, weight_c, alloc_c) with Σ alloc_c = pool
    per order (pytest-pinned invariant).
    """
    w_c = F.floor(F.col(weight_col) * 100).cast("decimal(38,0)")
    base = lineitem.select(
        F.col(order_col).alias("o"),
        F.col(line_col).alias("line"),
        w_c.alias("w"),
    )
    tot = Window.partitionBy("o")
    pool = F.lit(pool_cents).cast("decimal(38,0)")
    t = base.select(
        "o",
        "line",
        "w",
        F.sum("w").over(tot).alias("tw"),
    ).select(
        "o",
        "line",
        "w",
        F.expr(f"CAST({pool_cents} AS DECIMAL(38,0)) * w div tw").alias("share"),
        (pool * F.col("w") % F.col("tw")).alias("rem"),
    )
    leftover = (
        F.lit(pool_cents)
        - F.sum("share").over(tot)
    )
    rk = F.row_number().over(
        Window.partitionBy("o").orderBy(F.col("rem").desc(), F.col("line"))
    )
    return (
        t.withColumn("left", leftover)
        .withColumn("rk", rk)
        .select(
            F.col("o").alias(order_col),
            F.col("line").alias(line_col),
            F.col("w").cast("bigint").alias("weight_c"),
            (
                F.col("share")
                + F.when(F.col("rk") <= F.col("left"), 1).otherwise(0)
            ).cast("bigint").alias("alloc_c"),
        )
    )


def assoc_rules(
    lineitem: DataFrame,
    min_pair_orders: int = 3,
    top_n: int = 100,
    items: DataFrame | None = None,
) -> DataFrame:
    """Association rules over order baskets — the step after
    :func:`copurchase_pairs` that ranks DIRECTIONAL rules A→B by
    confidence (= P(B|A)) with lift (= observed/expected under
    independence) attached: the actual "customers who bought X also
    buy Y" recommender primitive.

    Counts are the basket-bounded co-occurrence join (quadratic only in
    basket size) plus part-grain singles; every rule emits in BOTH
    directions from one canonical pair row.  Support floor
    ``min_pair_orders`` bounds the rule set before ranking; the final
    cut is TakeOrderedAndProject on (confidence desc, antecedent,
    consequent) — total order, deterministic.  Confidence is one exact
    division; lift is the pinned 4-cast tree
    ``n_ab·n_total/(n_a·n_b)``.

    Output: (antecedent, consequent, n_both, n_ante, n_cons,
    confidence, lift).

    ``items`` short-circuits the distinct basket pass with a pre-built
    :func:`basket_items` table (the family's shared stage).
    """
    if items is None:
        items = basket_items(lineitem)
    n_tot = items.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    singles = items.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_p")
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_orders)
    )
    directed = pairs.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        "n_ab",
    ).unionByName(
        pairs.select(
            F.col("pb").alias("antecedent"),
            F.col("pa").alias("consequent"),
            "n_ab",
        )
    )
    sa = singles.select(F.col("p").alias("antecedent"), F.col("n_p").alias("n_ante"))
    sc = singles.select(F.col("p").alias("consequent"), F.col("n_p").alias("n_cons"))
    return (
        directed.join(sa, "antecedent")
        .join(sc, "consequent")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "antecedent",
            "consequent",
            F.col("n_ab").alias("n_both"),
            "n_ante",
            "n_cons",
            (F.col("n_ab").cast("double") / F.col("n_ante").cast("double")).alias(
                "confidence"
            ),
            (
                F.col("n_ab").cast("double")
                * F.col("n_total").cast("double")
                / (F.col("n_ante").cast("double") * F.col("n_cons").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.desc("confidence"), F.asc("antecedent"), F.asc("consequent"))
        .limit(top_n)
    )


def price_volume_decomp(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Price/volume decomposition of the year-over-year revenue change
    per brand — the FP&A bridge question behind every revenue review:
    "did we sell MORE, or at HIGHER prices?"  Laspeyres split anchored
    at the prior year's average unit price P0 = rev0/vol0:

        volume_effect = (vol1 − vol0) · P0
        price_effect  = rev1 − vol1 · P0

    which sum to Δrev algebraically (each effect is surfaced as its own
    pinned IEEE tree; the exact delta column is BIGINT cents, so the
    identity is auditable without trusting float cancellation).

    The comparison years are data-driven: the max ship year (one-row
    broadcast anchor, the decayed_engagement device) vs the year before.
    Only brands trading in BOTH years decompose (others drop — a brand
    with vol0 = 0 has no price anchor).

    Scale shape: facts collapse once to (brand, year) grain — a
    broadcast join against the part dim, then a map-side-combined
    aggregate; the pivot to prev/curr columns is a conditional agg at
    brand grain.  Cents and quantities are exact BIGINTs; each effect is
    ONE double tree mirrored verbatim in the oracle.

    Returns ``(p_brand, vol_prev, vol_curr, rev_prev_cents,
    rev_curr_cents, delta_cents, volume_effect_cents,
    price_effect_cents)``.

    Reference parity: none (warehouse-analytics extension, SURVEY.md
    §2.3); the two-phase aggregate is the reference's M7/M9 partial →
    final combine at brand-year grain.
    """
    anchor = lineitem.agg(
        F.max(F.year("l_shipdate")).alias("y1")
    )
    by_year = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(anchor))
        .filter(F.year("l_shipdate") >= F.col("y1") - 1)
        .select(
            "p_brand",
            (F.year("l_shipdate") == F.col("y1")).alias("is_curr"),
            F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
            F.floor("l_quantity").cast("bigint").alias("qty"),
        )
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(~F.col("is_curr"), F.col("qty")).otherwise(0))
            .cast("bigint")
            .alias("vol_prev"),
            F.sum(F.when(F.col("is_curr"), F.col("qty")).otherwise(0))
            .cast("bigint")
            .alias("vol_curr"),
            F.sum(F.when(~F.col("is_curr"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("rev_prev_cents"),
            F.sum(F.when(F.col("is_curr"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("rev_curr_cents"),
        )
    )
    both = by_year.filter((F.col("vol_prev") > 0) & (F.col("vol_curr") > 0))
    return both.select(
        "p_brand",
        "vol_prev",
        "vol_curr",
        "rev_prev_cents",
        "rev_curr_cents",
        (F.col("rev_curr_cents") - F.col("rev_prev_cents")).alias("delta_cents"),
        F.expr(
            "cast(vol_curr - vol_prev as double) * cast(rev_prev_cents as double)"
            " / cast(vol_prev as double)"
        ).alias("volume_effect_cents"),
        F.expr(
            "cast(rev_curr_cents as double)"
            " - cast(vol_curr as double) * cast(rev_prev_cents as double)"
            " / cast(vol_prev as double)"
        ).alias("price_effect_cents"),
    )


def rfm_segments(orders: DataFrame) -> DataFrame:
    """RFM customer segmentation: every customer scored 1..5 on
    Recency (days since last order — anchored at the data's max order
    date), Frequency (order count) and Monetary (lifetime cents), then
    counted per (r, f, m) cell — the classic marketing segmentation
    grid (5 = best quintile on every axis).

    Quintiles are EXACT distributed ranks, not ntile-over-one-task: the
    three metrics MELT to (customer, dim, value) long form — recency
    negated so "more recent" ranks higher like the other two — and ONE
    two-phase rank partitioned by dim covers all three axes in a single
    pass (range-repartition by (dim, value, id), within-partition
    row_number, #partitions×3 offset table broadcast back; no single
    task sorts an axis).  ``score = (rank-1)·5 div n + 1`` is pure
    integer math with the (value, customer) tie-break making every
    boundary deterministic cross-engine.

    Scale shape: orders collapse once to customer grain (map-side
    combined); the melt triples customer-grain rows (never order
    grain); output is ≤125 cells.

    Returns ``(r_score, f_score, m_score, n_customers)``.

    Reference parity: the M6/M9 sort surface as a distributed rank
    (SURVEY.md §2.2); segmentation itself is extension surface (§2.3).
    """
    anchor = orders.agg(F.max(F.to_date("o_orderdate")).alias("d1"))
    per_cust = (
        orders.join(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.min(
                F.datediff(F.col("d1"), F.to_date("o_orderdate"))
            ).alias("days"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("cents"),
        )
    )
    melted = per_cust.select(
        F.col("o_custkey").alias("id"),
        F.expr(
            "stack(3, 'r', cast(-days as bigint), 'f', cast(freq as bigint),"
            " 'm', cents) AS (dim, value)"
        ),
    )
    t = melted.repartitionByRange(
        F.col("dim"), F.col("value"), F.col("id")
    ).withColumn("pid", F.spark_partition_id())
    w_in = Window.partitionBy("pid", "dim").orderBy("value", "id")
    t = t.withColumn("rn", F.row_number().over(w_in))
    per = t.groupBy("pid", "dim").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("dim")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("pid", "dim", "off")
    totals = per.groupBy("dim").agg(F.sum("cnt").cast("bigint").alias("n"))
    scored = (
        t.join(F.broadcast(offsets), ["pid", "dim"])
        .join(F.broadcast(totals), "dim")
        .select(
            "id",
            "dim",
            (
                F.expr("((off + rn - 1) * 5) div n") + F.lit(1)
            ).cast("bigint").alias("score"),
        )
    )
    grid = scored.groupBy("id").agg(
        F.max(F.when(F.col("dim") == "r", F.col("score"))).alias("r_score"),
        F.max(F.when(F.col("dim") == "f", F.col("score"))).alias("f_score"),
        F.max(F.when(F.col("dim") == "m", F.col("score"))).alias("m_score"),
    )
    return (
        grid.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    )


def topn_with_others(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    n: int = 3,
) -> DataFrame:
    """Top-N + OTHERS reporting rollup: per nation, the ``n`` highest-
    revenue customers as named rows plus ONE aggregated ``OTHERS`` row
    for the remainder — the standard dashboard cut that raw top-k
    (:func:`~relational.topk_per_group`-style) leaves as an exercise, and the shape
    where naive solutions silently drop the tail.

    Facts collapse to customer grain FIRST (map-side combined exact
    cents), so the per-nation rank window runs over the pre-aggregated
    customer table, never order rows; ties break by customer id (total
    order).  The OTHERS row aggregates every rank > n and carries
    ``rank = n+1`` so consumers can sort the block; nations whose
    customer count <= n simply have no OTHERS row (zero-row aggregate,
    not a zero row).

    Returns ``(n_name, label, revenue_cents, rank_in_nation)``.

    Reference parity: M7 reduce + M6/M9 sort surface (SURVEY.md §2.2)
    at nation grain; the rollup is extension surface (§2.3).
    """
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
        # customer joins by hash (it is customer-grain like the left
        # side — broadcast would be wrong at 1e9 customers; AQE still
        # broadcasts it when it is actually small)
        .join(customer.select("c_custkey", "c_name", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey", "c_name", "cents")
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("cents").desc(), F.col("c_custkey")
    )
    ranked = per_cust.withColumn("rnk", F.row_number().over(w))
    top = ranked.filter(F.col("rnk") <= n).select(
        "n_name",
        F.col("c_name").alias("label"),
        F.col("cents").cast("bigint").alias("revenue_cents"),
        F.col("rnk").cast("bigint").alias("rank_in_nation"),
    )
    others = (
        ranked.filter(F.col("rnk") > n)
        .groupBy("n_name")
        .agg(F.sum("cents").cast("bigint").alias("revenue_cents"))
        .select(
            "n_name",
            F.lit("OTHERS").alias("label"),
            "revenue_cents",
            F.lit(n + 1).cast("bigint").alias("rank_in_nation"),
        )
    )
    return top.unionByName(others)


def revenue_concentration(
    orders: DataFrame, pct_ppms: Sequence[int] = (10_000, 50_000, 100_000, 250_000)
) -> DataFrame:
    """Revenue concentration curve: what share of total revenue comes
    from the top 1% / 5% / 10% / 25% of customers — the Lorenz-curve
    points behind "whale risk" reviews (the curve :func:`~profile.gini_concentration`'s
    single coefficient summarizes; these are the numbers executives
    actually quote).

    Customers rank DESCENDING by exact lifetime cents via the
    two-phase distributed rank (value = −cents so the range partition
    orders the big spenders first; customer id tie-break = total
    order).  Each percentile's head-count cutoff is the exact ceiling
    ``k_p = (n·p + 999999) div 1e6``; head sums are conditional
    aggregates against a broadcast 4-row cutoff table, and every share
    is ONE division of exact BIGINTs.

    Returns ``(pct_ppm, n_top, top_cents, total_cents, share)``.

    Reference parity: M6/M9 sort surface as a distributed rank
    (SURVEY.md §2.2); the concentration report is extension surface.
    """
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    t = (
        per_cust.select(
            F.col("o_custkey").alias("id"),
            F.col("cents"),
            (-F.col("cents")).alias("neg"),
        )
        .repartitionByRange(F.col("neg"), F.col("id"))
        .withColumn("pid", F.spark_partition_id())
    )
    w_in = Window.partitionBy("pid").orderBy("neg", "id")
    t = t.withColumn("rn", F.row_number().over(w_in))
    per = t.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("pid", "off")
    totals = per_cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )
    ranked = t.join(F.broadcast(offsets), "pid").select(
        "cents", (F.col("off") + F.col("rn")).alias("rank")
    )
    cuts = (
        totals.select(
            "n",
            "total_cents",
            F.explode(
                F.array(*[F.lit(p) for p in pct_ppms])
            ).alias("pct_ppm"),
        )
        .select(
            "pct_ppm",
            "n",
            "total_cents",
            F.expr("(n * pct_ppm + 999999) div 1000000").alias("k_p"),
        )
    )
    head = (
        ranked.join(F.broadcast(cuts), F.col("rank") <= F.col("k_p"))
        .groupBy("pct_ppm", "n", "total_cents", "k_p")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_top"),
            F.sum("cents").cast("bigint").alias("top_cents"),
        )
    )
    return head.select(
        F.col("pct_ppm").cast("bigint").alias("pct_ppm"),
        "n_top",
        "top_cents",
        "total_cents",
        (
            F.col("top_cents").cast("double")
            / F.col("total_cents").cast("double")
        ).alias("share"),
    )


def eb_shrunk_rates(lineitem: DataFrame) -> DataFrame:
    """Empirical-Bayes shrunk return rate per part — the device that
    makes small-sample group rates rankable (a part with 1 return in 2
    sales must not outrank one with 90 in 1000): each part's raw rate
    shrinks toward the corpus prior in proportion to its sample size,
    via a Beta-Binomial prior fit by method of moments over the
    group-rate distribution (Robbins'56 / the standard "add the prior's
    pseudo-counts" estimator):

        shrunk = (k + α) / (n + α + β),   α+β = m(1−m)/v − 1,  α = m(α+β)

    Determinism protocol: per-part rates quantize to BIGINT ppm BEFORE
    the cross-group moment sums (a double mean over an unordered group
    set would be partition-dependent); m and v derive from exact
    (G, Σppm, Σppm²) by a pinned IEEE tree, and each shrunk rate is one
    more pinned tree over (k, n, m, v).  Degenerate priors (v ≤ 0 — all
    groups identical — or a non-positive pseudo-count sum) fall back to
    the raw rate, flagged.

    Plan at 100 TB: ONE map-side-combined aggregate at part grain; the
    prior is a one-row aggregate over part-grain rows (config-grain
    funnel, the fold_ci justification) broadcast back; the shrink is a
    zero-shuffle projection.  Nothing rescans or reshuffles the fact
    table.

    Returns ``(l_partkey, n, k, raw_ppm, shrunk_rate, prior_used)``.
    """
    grp = lineitem.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    grp = grp.withColumn("raw_ppm", F.expr("k * 1000000 div n"))
    prior = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("g"),
        F.sum("raw_ppm").cast("bigint").alias("sp"),
        F.sum(F.col("raw_ppm") * F.col("raw_ppm")).cast("bigint").alias("sp2"),
    )
    joined = grp.join(F.broadcast(prior))
    gd = F.col("g").cast("double")
    m = F.col("sp").cast("double") / gd / F.lit(1000000.0)
    m2 = F.col("sp2").cast("double") / gd / F.lit(1000000.0) / F.lit(1000000.0)
    v = m2 - m * m
    ab = m * (F.lit(1.0) - m) / v - F.lit(1.0)
    alpha = m * ab
    ok = (v > F.lit(0.0)) & (ab > F.lit(0.0))
    raw = F.col("k").cast("double") / F.col("n").cast("double")
    shrunk = (F.col("k").cast("double") + alpha) / (F.col("n").cast("double") + ab)
    return joined.select(
        "l_partkey",
        "n",
        "k",
        "raw_ppm",
        F.when(ok, shrunk).otherwise(raw).alias("shrunk_rate"),
        ok.alias("prior_used"),
    )


def abc_parts(lineitem: DataFrame) -> DataFrame:
    """ABC inventory classification — the warehouse-ops cut of the
    Lorenz machinery (:func:`revenue_concentration` reports shares at
    FIXED head fractions; ABC assigns every part a CLASS by cumulative
    revenue share: A up to 80%, B to 95%, C the tail — the classic
    Pareto segmentation purchasing teams drive stocking policy with).

    Parts rank descending by exact lifetime revenue cents via the
    two-phase distributed rank + prefix sum (range partition on
    (−cents, id) → local running sums → broadcast offset table — no
    single-task sort); class assignment is a pure BIGINT comparison
    (``cum·5 ≤ total·4`` for A, ``cum·20 ≤ total·19`` for B) so the
    boundaries are exact, and the report aggregates to 3 class rows.

    Output: (abc_class, n_parts, class_cents, revenue_share).
    """
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    per_part = lineitem.groupBy("l_partkey").agg(
        F.sum(cents).alias("cents")
    )
    t = (
        per_part.select(
            F.col("l_partkey").alias("id"),
            "cents",
            (-F.col("cents")).alias("neg"),
        )
        .repartitionByRange(F.col("neg"), F.col("id"))
        .withColumn("pid", F.spark_partition_id())
    )
    w_in = (
        Window.partitionBy("pid")
        .orderBy("neg", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = t.withColumn("local_cum", F.sum("cents").over(w_in))
    per = t.groupBy("pid").agg(F.sum("cents").alias("part_cents"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per.withColumn(
        "off", F.coalesce(F.sum("part_cents").over(w_off), F.lit(0))
    ).select("pid", "off")
    total = per_part.agg(F.sum("cents").cast("bigint").alias("total_cents"))
    classed = (
        t.join(F.broadcast(offsets), "pid")
        .withColumn("cum", (F.col("off") + F.col("local_cum")).cast("bigint"))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "abc_class",
            F.when(F.col("cum") * 5 <= F.col("total_cents") * 4, "A")
            .when(F.col("cum") * 20 <= F.col("total_cents") * 19, "B")
            .otherwise("C"),
        )
    )
    return (
        classed.groupBy("abc_class", "total_cents")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("cents").cast("bigint").alias("class_cents"),
        )
        .select(
            "abc_class",
            "n_parts",
            "class_cents",
            (
                F.col("class_cents").cast("double")
                / F.col("total_cents").cast("double")
            ).alias("revenue_share"),
        )
    )


def peer_percentile(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """Within-nation revenue percentile per supplier — the peer-ranking
    report ("you are in the top X% of suppliers in your market") that
    benchmarking dashboards serve: exact lifetime revenue cents per
    supplier, then ``percent_rank`` inside each nation.

    Exactness: revenue is the BIGINT cents protocol; percent_rank is
    the fixed SQL definition ``(rank − 1)/(n_peers − 1)`` — one pinned
    division (single-supplier nations pin to 0.0 by the SQL standard).
    Scale shape: fact table contracts to supplier grain map-side; the
    window runs per nation at supplier grain.

    Output: (s_suppkey, s_nationkey, revenue, n_peers, pct_rank).
    """
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    per_supp = lineitem.groupBy("l_suppkey").agg(
        F.sum(cents).alias("cents")
    )
    joined = per_supp.join(
        supplier.select("s_suppkey", "s_nationkey"),
        per_supp.l_suppkey == F.col("s_suppkey"),
    )
    w = Window.partitionBy("s_nationkey").orderBy("cents", "s_suppkey")
    wn = Window.partitionBy("s_nationkey")
    return joined.select(
        "s_suppkey",
        "s_nationkey",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n_peers"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


def period_balance(orders: DataFrame) -> DataFrame:
    """Semi-additive balance rollup — the warehouse pattern every
    account/inventory/AUM report uses: a balance-like measure (here:
    each customer's LAST order total in the month) must be aggregated
    with LAST-VALUE over time but SUM over accounts, never SUM over
    time.  Reports the monthly book of balances and its month-over-
    month delta.

    Exactness: cents-grain BIGINTs; the last-per-(customer, month)
    pick is a ``row_number`` window ordered by (date, orderkey) DESC —
    deterministic under ties; the MoM delta is a month-grain lag.

    Scale shape: one window at (customer, month) grain (hash-
    partitioned by customer — the calendar does not fan out), one
    month-grain aggregate, one calendar-grain lag window.
    Output: (month, n_accounts, total_balance, mom_delta).
    """
    po = orders.select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("m"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderdate",
        "o_orderkey",
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("o_custkey", "m").orderBy(
                F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
            )
        ),
    )
    mb = (
        po.filter(F.col("rn") == 1)
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_accounts"),
            F.sum("cents").cast("bigint").alias("bal"),
        )
    )
    wl = Window.orderBy("m")
    return mb.select(
        F.col("m").alias("month"),  # 'YYYY-MM' string (engine-portable)
        "n_accounts",
        (F.col("bal").cast("double") / 100.0).alias("total_balance"),
        (
            (
                F.col("bal") - F.coalesce(F.lag("bal").over(wl), F.lit(0))
            ).cast("double")
            / 100.0
        ).alias("mom_delta"),
    )


def receivables_aging(orders: DataFrame) -> DataFrame:
    """Receivables aging report: open orders bucketed by age at the
    snapshot date (the global max order date) — 0-30 / 31-60 / 61-90 /
    91+ days, the AR schedule every finance close produces and the
    canonical "bucket by age against a derived anchor" query shape.

    The snapshot anchor is a one-row broadcast aggregate (the
    decayed_engagement device); ages and buckets are exact integer
    day arithmetic, amounts exact cents.

    Output: (bucket, n_orders, total_open) — all four buckets always
    present (conditional aggregation over a broadcast bucket list), so
    the report shape is stable even when a bucket is empty.
    """
    snap = orders.agg(
        F.max(F.to_date("o_orderdate")).alias("snap_d")
    )
    aged = (
        orders.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(snap))
        .select(
            F.datediff(F.col("snap_d"), F.to_date("o_orderdate")).alias(
                "age"
            ),
            F.floor(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .select(
            F.when(F.col("age") <= 30, "0-30")
            .when(F.col("age") <= 60, "31-60")
            .when(F.col("age") <= 90, "61-90")
            .otherwise("91+")
            .alias("bucket"),
            "cents",
        )
    )
    buckets = orders.sparkSession.createDataFrame(
        [("0-30",), ("31-60",), ("61-90",), ("91+",)], ["bucket"]
    )
    return (
        F.broadcast(buckets)
        .join(aged, "bucket", "left")
        .groupBy("bucket")
        .agg(
            F.sum(
                F.when(F.col("cents").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_orders"),
            (
                F.coalesce(F.sum("cents"), F.lit(0)).cast("double")
                / 100.0
            ).alias("total_open"),
        )
    )


def rbo_ranks(lineitem: DataFrame, depth: int = 20, p: float = 0.9) -> DataFrame:
    """Rank-biased overlap (Webber's RBO, truncated) between the two
    supplier leaderboards every review meeting juggles — by revenue
    and by shipped quantity: "is volume leadership the same story as
    revenue leadership?".  RBO is the principled top-weighted rank
    agreement (Kendall/Spearman weight the tail equally; RBO's
    geometric weights match how people read leaderboards).

    Exactness: both rankings are row_number over exact BIGINTs
    (revenue cents / centi-quantity) with key tie-breaks; the overlap
    X_d = |top-d ∩ top-d| per depth is an exact conditional count over
    a broadcast depth list, and the truncated RBO
    (1−p)·Σ_{d≤D} p^(d−1)·X_d/d folds DEPTH-ORDERED over the D-row
    array (the group-sorted-fold device) with p's powers produced by
    repeated multiplication — bit-identical cross-engine.

    Output: one row (depth, overlap_at_depth, rbo).
    """
    per_supp = lineitem.groupBy("l_suppkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100))
        .cast("bigint")
        .alias("rev"),
        F.sum(F.floor(F.col("l_quantity") * 100))
        .cast("bigint")
        .alias("qty"),
    )
    ranked = per_supp.select(
        "l_suppkey",
        F.row_number()
        .over(Window.orderBy(F.col("rev").desc(), F.col("l_suppkey")))
        .alias("ra"),
        F.row_number()
        .over(Window.orderBy(F.col("qty").desc(), F.col("l_suppkey")))
        .alias("rb"),
    )
    ds = lineitem.sparkSession.range(1, depth + 1).select(
        F.col("id").cast("int").alias("d")
    )
    xd = (
        ranked.crossJoin(F.broadcast(ds))
        .groupBy("d")
        .agg(
            F.sum(
                F.when(
                    (F.col("ra") <= F.col("d"))
                    & (F.col("rb") <= F.col("d")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("x")
        )
    )
    folded = xd.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("d"), F.col("x")))
        ).alias("xs")
    ).withColumn(
        "st",
        F.aggregate(
            F.col("xs"),
            F.struct(F.lit(0.0).alias("s"), F.lit(1.0).alias("pw")),
            lambda acc, e: F.struct(
                (
                    acc["s"]
                    + acc["pw"]
                    * (e["x"].cast("double") / e["d"].cast("double"))
                ).alias("s"),
                (acc["pw"] * F.lit(p)).alias("pw"),
            ),
        ),
    )
    last_x = F.element_at(F.col("xs"), -1)["x"]
    return folded.select(
        F.lit(depth).cast("int").alias("depth"),
        last_x.cast("bigint").alias("overlap_at_depth"),
        ((F.lit(1.0) - F.lit(p)) * F.col("st.s")).alias("rbo"),
        # empty-input stability (ADVICE r06): zero rows, not one null row
    ).filter(F.size(F.col("xs")) > 0)


def xyz_class(lineitem: DataFrame) -> DataFrame:
    """XYZ demand-variability classification per part — the supply-
    chain twin of the ABC revenue classes: X = steady demand
    (CV ≤ ½), Y = variable (CV ≤ 1), Z = erratic — deciding which
    parts get forecast-driven replenishment (X) vs safety stock (Z).

    Exactness: CV² = (n·Σq² − S²)/S² over centi-quantity BIGINTs, so
    the class cuts are pure integer cross-multiplications
    (4·(nΣq²−S²) ≤ S² for X; ≤ S² undoubled for Y) — no double means,
    no sqrt, no ties ambiguity.  Single-line parts (n = 1) have zero
    variance and class X by definition.

    Scale shape: one part-grain aggregate (map-side combined), one
    3-row report.  Output: (xyz, n_parts, total_qty) sorted by class.
    """
    per_part = lineitem.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.floor(F.col("l_quantity") * 100))
        .cast("bigint")
        .alias("s"),
        F.sum(
            F.floor(F.col("l_quantity") * 100)
            * F.floor(F.col("l_quantity") * 100)
        )
        .cast("bigint")
        .alias("q"),
    )
    var_num = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    cls = (
        F.when(F.lit(4) * var_num <= F.col("s") * F.col("s"), "X")
        .when(var_num <= F.col("s") * F.col("s"), "Y")
        .otherwise("Z")
    )
    return (
        per_part.select(cls.alias("xyz"), "s")
        .groupBy("xyz")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            (F.sum("s").cast("double") / 100.0).alias("total_qty"),
        )
    )


def hhi_concentration(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """Herfindahl–Hirschman supplier-concentration index per nation —
    the antitrust/supply-risk readout: HHI = Σᵢ sᵢ² over supplier
    revenue shares sᵢ within each nation (1/n for perfect competition
    → 1.0 for monopoly), with the effective supplier count 1/HHI
    riding along.  Complements :func:`revenue_concentration` (Lorenz
    points, global curve) with the per-market scalar every
    concentration screen uses.

    Exactness: per-supplier revenue is exact cents; HHI telescopes to
    ``Σsᵢ² / S²`` so the share divisions never happen per supplier —
    Σ cents² accumulates as exact DECIMAL(38,0) (the anova_f moment
    device) and HHI / effective_n are two pinned IEEE trees.

    Scale shape: one supplier-grain aggregate (map-side combined), a
    broadcast dim join, one nation-grain fold.  Output:
    (nation, n_suppliers, total_cents, hhi, effective_n).
    """
    per_supp = lineitem.groupBy("l_suppkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100))
        .cast("bigint")
        .alias("cents")
    )
    with_nation = per_supp.join(
        F.broadcast(
            supplier.join(
                F.broadcast(nation),
                supplier.s_nationkey == nation.n_nationkey,
            ).select(
                F.col("s_suppkey"), F.col("n_name").alias("nation")
            )
        ),
        per_supp.l_suppkey == F.col("s_suppkey"),
    )
    cd = F.col("cents").cast("decimal(19,0)")
    agg = with_nation.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(cd * cd).cast("decimal(38,0)").alias("ssq"),
    )
    s = F.col("total_cents").cast("double")
    hhi = F.col("ssq").cast("double") / (s * s)
    return agg.select(
        "nation",
        "n_suppliers",
        "total_cents",
        F.when(F.col("total_cents") > 0, hhi)
        .otherwise(F.lit(0.0))
        .alias("hhi"),
        F.when(
            F.col("ssq") > 0, (s * s) / F.col("ssq").cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("effective_n"),
    ).orderBy("nation")


def kendall_w(lineitem: DataFrame) -> DataFrame:
    """Kendall's W (coefficient of concordance) across the three
    supplier leaderboards every ops review juggles — revenue, shipped
    quantity, and line count: "do our rankings even agree?" (W = 1
    perfect agreement, 0 none).  The k-judges generalization of the
    pairwise rank correlations (:func:`spearman_daily` et al.) and the
    principled pre-check before averaging ranks into a composite
    score.

    Exactness: the three per-supplier metrics are exact BIGINTs;
    midranks per judge are ``.5``-granular so DOUBLED ranks are exact;
    with Dᵢ = Σⱼ 2·rᵢⱼ, the deviation sum telescopes to
    ``S4 = Σ Dᵢ² − (Σ Dᵢ)²/n`` (= 4S) and the tie-corrected
    ``W = 3·S4·… / (k²(n³−n) − k·ΣT)`` is one pinned tree over
    DECIMAL(38,0) moments (n³ outgrows BIGINT at ~2M items).

    Scale shape: one supplier-grain aggregate, three rank windows,
    one fold.  Output: one row (n_items, k_judges, w).
    """
    per = lineitem.groupBy("l_suppkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100))
        .cast("bigint")
        .alias("rev"),
        F.sum(F.floor(F.col("l_quantity") * 100))
        .cast("bigint")
        .alias("qty"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    def d2(col):
        return (
            2 * F.rank().over(Window.orderBy(col))
            + F.count(F.lit(1)).over(Window.partitionBy(col))
            - 1
        ).cast("bigint")

    ranked = per.select(
        "l_suppkey",
        d2(F.col("rev")).alias("da"),
        d2(F.col("qty")).alias("db"),
        d2(F.col("cnt")).alias("dc"),
    ).select(
        "l_suppkey",
        (F.col("da") + F.col("db") + F.col("dc")).alias("di"),
    )
    # per-judge tie sums: judges are the three metric columns — count
    # multiplicity per (judge, value); t is an ITEM COUNT, so doubling
    # the ranks leaves T = Σ(t³−t) in original units
    tie_sum = (
        per.select(F.col("rev").alias("v"), F.lit("a").alias("j"))
        .union(per.select(F.col("qty").alias("v"), F.lit("b").alias("j")))
        .union(per.select(F.col("cnt").alias("v"), F.lit("c").alias("j")))
        .groupBy("j", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("bigint")
            .alias("tsum")
        )
    )
    did = F.col("di").cast("decimal(19,0)")
    moments = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("di").cast("bigint").alias("sd"),
        F.sum(did * did).cast("decimal(38,0)").alias("sdd"),
    )
    out = moments.crossJoin(tie_sum)  # one row × one row
    n = F.col("n_items").cast("double")
    # S4 = Σ D² − (ΣD)²/n  (D = doubled rank sums; S4 = 4·S)
    s4 = F.col("sdd").cast("double") - F.col("sd").cast("double") * F.col(
        "sd"
    ).cast("double") / n
    k = F.lit(3.0)
    # W = 12·S / (k²(n³−n) − k·ΣT) with S = S4/4 (doubled-rank
    # deviations scale S by 4) → W = 3·S4 / (k²(n³−n) − k·ΣT)
    den = k * k * (n * n * n - n) - k * F.col("tsum").cast("double")
    w = F.when(
        (F.col("n_items") > 1) & (den > 0.0),
        F.lit(3.0) * s4 / den,
    ).otherwise(F.lit(0.0))
    return out.select(
        "n_items",
        F.lit(3).cast("int").alias("k_judges"),
        w.alias("w"),
    ).filter(F.col("n_items") > 0)


def business_day_lag(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Order-to-ship lag in BUSINESS DAYS (weekends excluded) — the
    SLA readout operations actually quotes ("ships within 5 business
    days"), which calendar-day lags (:func:`ship_lag` shapes)
    systematically overstate by ~2/7.  Histogram over the lag.

    Exactness: business days from a fixed epoch Monday (1992-01-06)
    telescope to the closed form ``bd(d) = 5·(days div 7) +
    least(days mod 7, 5)`` (days = calendar days since the epoch) —
    pure integer arithmetic both engines share; the lag is the
    difference of two such values.  No calendar table, no iteration.

    Scale shape: one fact join (orders key-grain), one lag-grain
    aggregate (map-side combined).  Output: (bd_lag, n_items,
    pct_items) ordered by lag.
    """
    def bd(col):
        days = F.datediff(col, F.lit("1992-01-06").cast("date"))
        return 5 * F.floor(days / 7) + F.least(
            F.pmod(days, F.lit(7)), F.lit(5)
        )

    lagged = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).select(
        (bd(F.col("l_shipdate")) - bd(F.col("o_orderdate")))
        .cast("bigint")
        .alias("bd_lag")
    )
    total = lagged.agg(F.count(F.lit(1)).cast("bigint").alias("n_all"))
    return (
        lagged.groupBy("bd_lag")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_items"))
        .crossJoin(F.broadcast(total))
        .select(
            "bd_lag",
            "n_items",
            (
                F.col("n_items").cast("double")
                / F.col("n_all").cast("double")
            ).alias("pct_items"),
        )
        .orderBy("bd_lag")
    )


def price_index(lineitem: DataFrame) -> DataFrame:
    """Monthly Laspeyres / Paasche / Fisher price indexes vs the first
    observed ship month — THE inflation-adjusted revenue readout
    ("how much of growth is price vs volume?"), the index-number
    formalization of :func:`price_volume_bridge`'s one-step split.

    Exactness: per-(part, month) unit price is quantized ONCE to
    exact micro-units — ``p = floor(1e6·rev_cents / qty_centi)``, one
    IEEE division + floor per cell (the rarity_ppm device; the 1e6·rev
    product stays under 2^53 at part-month grain) — then both baskets
    are exact integer dot products in DECIMAL(38,0):
    Laspeyres = Σp_t·q₀ / Σp₀·q₀ (base basket), Paasche =
    Σp_t·q_t / Σp₀·q_t (current basket), each ONE division; Fisher is
    the IEEE-exact sqrt of their product.  Only parts present in both
    the base month and month t enter (the matched-sample convention).

    Scale shape: one (part, month) contraction (map-side combined),
    the base-month slice re-joined at part grain, one month-grain
    fold.  Output: (month, n_parts, laspeyres, paasche, fisher).
    """
    cell = (
        lineitem.select(
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
            F.col("l_partkey").alias("part"),
            F.floor(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("rev"),
            F.floor(F.col("l_quantity") * 100).cast("bigint").alias("qty"),
        )
        .groupBy("month", "part")
        .agg(F.sum("rev").alias("rev"), F.sum("qty").alias("qty"))
        .filter(F.col("qty") > 0)
        .withColumn(
            "p",
            F.floor(F.lit(1_000_000.0) * F.col("rev") / F.col("qty"))
            .cast("bigint"),
        )
    )
    base_month = cell.agg(F.min("month").alias("m0"))
    base = (
        cell.join(F.broadcast(base_month), cell.month == F.col("m0"))
        .select(
            F.col("part"),
            F.col("p").alias("p0"),
            F.col("qty").alias("q0"),
        )
    )
    joined = cell.join(base, "part")
    pd_ = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    agg = joined.groupBy("month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(pd_("p") * pd_("q0")).cast("decimal(38,0)").alias("l_num"),
        F.sum(pd_("p0") * pd_("q0")).cast("decimal(38,0)").alias("l_den"),
        F.sum(pd_("p") * pd_("qty")).cast("decimal(38,0)").alias("p_num"),
        F.sum(pd_("p0") * pd_("qty")).cast("decimal(38,0)").alias("p_den"),
    )
    lasp = F.col("l_num").cast("double") / F.col("l_den").cast("double")
    paas = F.col("p_num").cast("double") / F.col("p_den").cast("double")
    return agg.select(
        "month",
        "n_parts",
        lasp.alias("laspeyres"),
        paas.alias("paasche"),
        F.sqrt(lasp * paas).alias("fisher"),
    ).orderBy("month")


def cochran_armitage(orders: DataFrame) -> DataFrame:
    """Cochran-Armitage trend test: is the fulfillment rate MONOTONE in
    order priority?  The 2×k χ² (chi2_drift family) only asks "are the
    rates different"; CA weights the categories with their ordinal
    scores w_i and asks for a linear TREND — one degree of freedom, far
    more power against ordered alternatives, the standard dose-response
    test re-aimed at an ordered business dimension.

    ``Z² = [Σ(r_i − n_i·R/N)·w_i]² /
    [R/N·(1−R/N)·(Σn_i·w_i² − (Σn_i·w_i)²/N)]`` with exposure
    w_i = the priority's leading digit (1-URGENT → 1 … 5-LOW → 5) and
    success = ``o_orderstatus = 'F'``.

    Exactness: every sufficient statistic (r_i, n_i, Σn_i·w_i,
    Σn_i·w_i², Σr_i·w_i) is an exact BIGINT from one map-side-combined
    aggregate — order-insensitive, so no fold device is needed — and
    the statistic is one pinned IEEE tree over them.  Output one row:
    (n_total, n_success, n_levels, ca_chi2); zero rows on empty input,
    0.0 when degenerate (one level, or all/no successes).
    """
    rows = orders.select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("w"),
        (F.col("o_orderstatus") == "F").cast("bigint").alias("s"),
    )
    per = rows.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("nj"),
        F.sum("s").cast("bigint").alias("rj"),
    )
    folded = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_levels"),
        F.sum("nj").cast("bigint").alias("n_total"),
        F.sum("rj").cast("bigint").alias("n_success"),
        F.sum(F.col("nj") * F.col("w")).cast("bigint").alias("snw"),
        F.sum(F.col("nj") * F.col("w") * F.col("w"))
        .cast("bigint")
        .alias("snw2"),
        F.sum(F.col("rj") * F.col("w")).cast("bigint").alias("srw"),
    )
    n = F.col("n_total").cast("double")
    r = F.col("n_success").cast("double")
    num = F.col("srw").cast("double") - r * F.col("snw").cast("double") / n
    den = (
        (r / n)
        * (F.lit(1.0) - r / n)
        * (
            F.col("snw2").cast("double")
            - F.col("snw").cast("double")
            * F.col("snw").cast("double")
            / n
        )
    )
    return folded.select(
        "n_total",
        "n_success",
        "n_levels",
        F.when(
            (F.col("n_levels") > 1)
            & (F.col("n_success") > 0)
            & (F.col("n_success") < F.col("n_total")),
            num * num / den,
        )
        .otherwise(F.lit(0.0))
        .alias("ca_chi2"),
    ).filter(F.col("n_total") > 0)
