"""Time-series regularization: dense-grid gap filling with forward fill.

Sensor/event feeds are sparse — hours with no events simply have no
rows, which breaks downstream rolling windows and joins that assume a
dense time axis.  The classic fix is (1) materialize the dense grid per
series, (2) left-join the observed aggregates, (3) forward-fill the
holes from the last observation.

Spark-first shape: the grid comes from ``sequence()`` + ``explode``
over each series' [min, max] hour — the per-series array is bounded by
the TIME RANGE, never the event count, so a series with a billion
events still explodes to #hours rows.  The forward fill is
``last(ignorenulls)`` over an UNBOUNDED PRECEDING frame partitioned by
series — one shuffle on the series key, frame evaluation is a single
sequential pass per series, and the partition height is again #hours
(grain-bounded, not data-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_hourly(events: DataFrame) -> DataFrame:
    """Dense hourly series per event_type: observed event counts and a
    forward-filled max(value) — ``(event_type, hour, n_events,
    filled_max)`` with one row for EVERY hour between the series' first
    and last events.

    The filled metric is max(value) (order-independent, no float
    summation) so the fill chain is bit-exact across engines; hours
    before the first observation keep NULL (nothing to fill from).
    """
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("value").alias("mx"),
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour").alias("mn"), F.max("hour").alias("mxh")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("mn", "mxh", F.expr("interval 1 hour"))
        ).alias("hour"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.last("mx", ignorenulls=True).over(w).alias("filled_max"),
        )
    )


def mom_revenue(orders: DataFrame) -> DataFrame:
    """Month-over-month revenue: per-month exact totals plus the delta
    and ratio against the previous month — ``(month, revenue, prev_rev,
    mom_delta, mom_ratio)``.

    The heavy lifting is an ordinary partial→final aggregate to month
    grain; the lag/delta window then runs over #months rows (grain-
    bounded — a 100-year history is 1200 rows), so the unpartitioned
    window is a deliberate, safe single-partition pass over a tiny
    pre-aggregate, never over the fact table.  Delta and ratio are
    single IEEE ops on exact-decimal sums — deterministic cross-engine.
    """
    from p2_mapreduce_spark.functions.numeric import dsum

    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(dsum("o_totalprice").alias("revenue"))
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "revenue",
        F.lag("revenue").over(w).alias("prev_rev"),
        (F.col("revenue") - F.lag("revenue").over(w)).alias("mom_delta"),
        (F.col("revenue") / F.lag("revenue").over(w)).alias("mom_ratio"),
    )


def rolling_active_users(events: DataFrame, days: int = 7) -> DataFrame:
    """Trailing-N-day distinct active users per calendar day — the
    WAU-style metric ``(d, active_users)`` for every day in the events'
    date range.

    COUNT(DISTINCT) over a sliding window has no streaming-friendly
    partial form, so the scalable construction is: collapse events to
    the distinct (user, day) activity grid at the scan's partial-
    distinct (at most #users × #days rows), then RANGE-join each grid
    row to the ≤N calendar days it contributes to, and count distinct
    users per day.  Work is |grid| × N rows — bounded by users × days ×
    window, independent of raw event volume.
    """
    grid = events.select(
        "user_id", F.to_date("ts").alias("ad")
    ).distinct()
    cal = (
        events.agg(
            F.min(F.to_date("ts")).alias("lo"),
            F.max(F.to_date("ts")).alias("hi"),
        )
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 day"))
            ).alias("d")
        )
    )
    joined = grid.join(
        F.broadcast(cal),
        (F.col("ad") <= F.col("d"))
        & (F.col("ad") > F.date_sub(F.col("d"), days)),
    )
    return (
        joined.groupBy(F.date_format("d", "yyyy-MM-dd").alias("d"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


def value_outliers(events: DataFrame, threshold: float = 3.0) -> DataFrame:
    """Z-score anomaly detection per event_type: rows whose ``value``
    sits more than ``threshold`` standard deviations from their group
    mean, with the group stats and the z-score attached.

    Moments are exact where it matters for reproducibility: the sum and
    sum-of-squares aggregate as exact decimals (2-decimal inputs), then
    ONE cast to double each, and every scalar after that is a
    correctly-rounded IEEE op evaluated in a pinned expression tree —
    ``mu = s1/n``, ``var = (s2 − s1·s1/n)/(n−1)``, ``sigma = sqrt(var)``
    — so flags and z-scores are bit-identical cross-engine and invariant
    under partitioning.  (The textbook caveat: the ``s2 − s1²/n`` form
    cancels catastrophically when sigma ≪ mu; with 2-decimal telemetry
    magnitudes the error is ≪ 1 ulp of the flag boundary.  A Welford
    pass would be more accurate but is order-DEPENDENT — the wrong trade
    for a reproducibility-contracted engine.)

    Shape at 100 TB: one map-side-combined aggregate to #group rows, the
    stats re-join is a broadcast, and the flag filter is a zero-shuffle
    scan — two passes over the facts, no wide shuffle anywhere.
    """
    dec = F.col("value").cast("decimal(12,2)")
    stats = (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec).cast("double").alias("s1"),
            F.sum(dec * dec).cast("double").alias("s2"),
        )
        .select(
            "event_type",
            (F.col("s1") / F.col("n")).alias("mu"),
            F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                / (F.col("n") - 1)
            ).alias("sigma"),
        )
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter(F.col("sigma") > 0)
        .filter(F.abs(z) > threshold)
        .select("event_id", "event_type", "value", "mu", "sigma", z.alias("z"))
    )


def grouped_trend(
    events: DataFrame, base: str = "2024-01-01 00:00:00"
) -> DataFrame:
    """Per-group linear trend (OLS of ``value`` against time) by
    SUFFICIENT STATISTICS — the distributed-regression pattern: one
    map-side-combined aggregate collects (n, Σx, Σy, Σxy, Σx², Σy²) per
    ``event_type``, and slope/intercept/R² fall out of closed forms on
    those six numbers.  The facts are scanned once and never shuffled —
    only #group stat rows move — so the plan is identical at 100 TB.

    Exactness discipline (cf. :func:`value_outliers`): x = whole seconds
    since ``base`` (``timestampdiff`` — BIGINT, NTZ-safe), y = exact
    cents via DECIMAL(12,2); every product is a BIGINT×BIGINT that fits
    63 bits at any realistic span, every SUM accumulates in exact
    DECIMAL(38,0) (order-independent under AQE/partitioning), and the
    closed forms are ONE pinned IEEE tree per output —
    ``slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)`` etc. — so results are
    bit-identical cross-engine.  Groups with zero variance in x (or <2
    rows) surface NULL slope rather than a divide-by-zero.

    Returns ``(event_type, n, slope_per_day, intercept, r2)`` — slope in
    value units per day, intercept in value units at ``base``."""
    x = F.expr(f"timestampdiff(SECOND, TIMESTAMP '{base}', ts)")
    yc = F.expr("cast(cast(value as decimal(12,2)) * 100 as bigint)")
    agg = (
        events.select(F.col("event_type"), x.alias("x"), yc.alias("yc"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast("decimal(28,0)")).alias("sx"),
            F.sum(F.col("yc").cast("decimal(28,0)")).alias("sy"),
            F.sum((F.col("x") * F.col("yc")).cast("decimal(38,0)")).alias("sxy"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
            F.sum((F.col("yc") * F.col("yc")).cast("decimal(38,0)")).alias("syy"),
        )
    )
    # one pinned double tree per output, mirrored verbatim in the oracle
    derived = agg.select(
        "event_type",
        "n",
        F.expr(
            "cast(n as double) * cast(sxy as double)"
            " - cast(sx as double) * cast(sy as double)"
        ).alias("num"),
        F.expr(
            "cast(n as double) * cast(sxx as double)"
            " - cast(sx as double) * cast(sx as double)"
        ).alias("den"),
        F.expr(
            "cast(n as double) * cast(syy as double)"
            " - cast(sy as double) * cast(sy as double)"
        ).alias("vary"),
        F.expr("cast(sx as double)").alias("dsx"),
        F.expr("cast(sy as double)").alias("dsy"),
    )
    slope_cs = F.when(F.col("den") != 0, F.col("num") / F.col("den"))
    return derived.select(
        "event_type",
        "n",
        (slope_cs * 86400.0 / 100.0).alias("slope_per_day"),
        (
            (F.col("dsy") - slope_cs * F.col("dsx"))
            / F.col("n").cast("double")
            / 100.0
        ).alias("intercept"),
        F.when(
            (F.col("den") != 0) & (F.col("vary") != 0),
            F.col("num") * F.col("num") / (F.col("den") * F.col("vary")),
        ).alias("r2"),
    )


def cusum_changepoint(events: DataFrame) -> DataFrame:
    """Change-point detection per ``event_type``: the day where the
    cumulative deviation from the series mean peaks (CUSUM argmax) — the
    monitoring primitive that answers "when did this metric shift?"
    without scanning anything twice.

    Integer-exact throughout: daily totals are exact cents (BIGINT);
    instead of subtracting the fractional mean per day, the statistic is
    multiplied through by n — ``C'_k = n·prefix_k − k·total`` — which
    preserves the argmax and keeps every intermediate a BIGINT, so the
    detected day is bit-deterministic cross-engine (a float CUSUM could
    flip the argmax on ties).  The peak magnitude is scaled back
    (``/n /100``) with two IEEE ops at the surface.

    Shape at 100 TB: one map-side-combined aggregate to day×type grain
    (calendar-bounded — thousands of rows, not events), then windows
    over that tiny series.  Ties at the peak break to the earliest day.

    Returns ``(event_type, n_days, change_day, peak_dev)`` — peak_dev in
    value units, signed (positive = the series ran above its mean up to
    that day)."""
    from pyspark.sql import Window

    daily = (
        events.groupBy(
            F.col("event_type"),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .agg(
            F.sum(
                F.expr("cast(cast(value as decimal(12,2)) * 100 as bigint)")
            ).alias("cents")
        )
    )
    w_ord = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    scored = daily.select(
        "event_type",
        "day",
        (
            F.count(F.lit(1)).over(w_all) * F.sum("cents").over(w_ord)
            - F.row_number().over(Window.partitionBy("event_type").orderBy("day"))
            * F.sum("cents").over(w_all)
        ).alias("c_scaled"),
        F.count(F.lit(1)).over(w_all).alias("n_days"),
    )
    pick = F.max(
        F.struct(
            F.abs("c_scaled").alias("mag"),
            # negate the day so the lexicographic max prefers the
            # EARLIEST day among equal magnitudes (timestampdiff is
            # NTZ-safe; unix_timestamp is not)
            (
                -F.expr("timestampdiff(SECOND, TIMESTAMP '1970-01-01', day)")
            ).alias("neg_day"),
            F.col("c_scaled").alias("c"),
            F.col("day").alias("day"),
        )
    )
    return (
        scored.groupBy("event_type")
        .agg(F.max("n_days").alias("n_days"), pick.alias("p"))
        .select(
            "event_type",
            "n_days",
            F.col("p.day").alias("change_day"),
            (
                F.col("p.c").cast("double")
                / F.col("n_days").cast("double")
                / 100.0
            ).alias("peak_dev"),
        )
    )


def interval_concurrency(
    events: DataFrame, duration_minutes: int = 60
) -> DataFrame:
    """Sweep-line peak concurrency: treating each event as occupying the
    half-open interval ``[ts, ts + duration_minutes)``, find per
    event_type the maximum number of simultaneously-open intervals and
    the earliest instant it is reached — ``(event_type, peak_concurrency,
    peak_at)``.

    The classic sweep: every interval contributes a ``+1`` delta at its
    start and a ``-1`` at its end; the running sum of deltas in time
    order is the concurrency curve.  Half-open semantics fall out of
    pre-aggregating deltas per distinct instant (an interval ending at
    ``t`` cancels one starting at ``t`` before the prefix sum ever sees
    them), which also makes the curve insensitive to row order — the
    peak and its earliest instant are bit-deterministic.

    Scale shape: the delta stream is 2× events but immediately contracts
    to (event_type, instant) grain via a map-side-combined aggregate.
    The prefix sum is the same two-phase distributed pattern as
    curation.pack_sequences: range-partition each type's timeline,
    within-partition running sums in parallel, then a #partitions-row
    offset table (grain-bounded by CONFIG, not data) broadcast back.  No
    single-task funnel over the full timeline.

    Reference seed: none (extension — the reference has no time axis at
    all; its closest notion is the per-job task counter,
    manager.go:70-97).
    """
    dur = F.expr(f"interval {int(duration_minutes)} minutes")
    starts = events.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    )
    ends = events.select(
        "event_type", (F.col("ts") + dur).alias("t"), F.lit(-1).alias("delta")
    )
    deltas = (
        starts.unionByName(ends)
        .groupBy("event_type", "t")
        .agg(F.sum("delta").cast("bigint").alias("d"))
    )
    # two-phase distributed prefix sum over each type's timeline
    deltas = deltas.repartitionByRange("event_type", F.col("t"))
    t = deltas.withColumn("pid", F.spark_partition_id())
    local = F.sum("d").over(
        Window.partitionBy("event_type", "pid")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = t.withColumn("local_cum", local)
    part_offsets = (
        t.groupBy("event_type", "pid")
        .agg(F.sum("d").alias("part_total"))
        .withColumn(
            "part_offset",
            F.coalesce(
                F.sum("part_total").over(
                    Window.partitionBy("event_type")
                    .orderBy("pid")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("event_type", "pid", "part_offset")
    )
    curve = t.join(F.broadcast(part_offsets), ["event_type", "pid"]).select(
        "event_type", "t", (F.col("part_offset") + F.col("local_cum")).alias("conc")
    )
    # peak + earliest instant achieving it: one lexicographic struct max
    pick = F.max(
        F.struct(
            F.col("conc").alias("c"),
            (-F.expr("timestampdiff(SECOND, TIMESTAMP '1970-01-01', t)")).alias(
                "neg_t"
            ),
            F.col("t").alias("t"),
        )
    )
    return (
        curve.groupBy("event_type")
        .agg(pick.alias("p"))
        .select(
            "event_type",
            F.col("p.c").alias("peak_concurrency"),
            F.col("p.t").alias("peak_at"),
        )
    )


#: Cramer-rule expression strings for the 2-feature normal equations.
#: They are SHARED between the Spark side (F.expr) and the DuckDB oracle
#: (f-string) so both engines evaluate byte-identical arithmetic trees —
#: the same device as functions/numeric.dsum, at formula scale.  Inputs
#: n, s1, s2, sy, s11, s22, s12, s1y, s2y are exact sums surfaced as
#: DOUBLE.
OLS2_DET = (
    "n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)"
    " + s2 * (s1 * s12 - s11 * s2)"
)
OLS2_B0 = (
    "sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)"
    " + s2 * (s1y * s12 - s11 * s2y)"
)
OLS2_B1 = (
    "n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)"
    " + s2 * (s1 * s2y - s1y * s2)"
)
OLS2_B2 = (
    "n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)"
    " + sy * (s1 * s12 - s11 * s2)"
)


def grouped_ols2(
    lineitem: DataFrame, group_cols: tuple[str, ...] = ("l_returnflag",)
) -> DataFrame:
    """Two-feature linear regression by sufficient statistics: per group,
    fit ``price ≈ β0 + β1·quantity + β2·discount`` — ``(group, n_obs,
    beta0, beta1, beta2)``.

    The multi-feature extension of :func:`grouped_trend`: the fact table
    is scanned ONCE into nine exact sufficient statistics (map-side
    combined to group grain — counts and DECIMAL(38,0) sums of BIGINT
    cent products, order-independent), and the 3×3 normal equations are
    solved in closed form by Cramer's rule — a fixed IEEE tree per
    coefficient (:data:`OLS2_DET` …), bit-identical cross-engine.  No
    feature matrix is ever materialized, nothing iterative, nothing
    driver-side: "fit a regression on 100 TB" costs exactly one
    aggregate.  (For d features this generalizes through
    similarity.gram_matrix + a driver-side d×d solve; at d ≤ 3 the
    closed form keeps the whole fit oracle-checkable.)

    β0 is surfaced in dollars (one extra pinned division by 100);
    β1/β2 are cent-per-cent slopes, already unitless.  Groups with a
    singular design (det == 0) surface NULL βs.
    """
    qc = "cast(floor(l_quantity * 100) as bigint)"
    dc = "cast(floor(l_discount * 100) as bigint)"
    yc = "cast(floor(l_extendedprice * 100) as bigint)"
    dec = "decimal(38,0)"
    stats = lineitem.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.expr(f"cast(sum(cast({qc} as {dec})) as double)").alias("s1"),
        F.expr(f"cast(sum(cast({dc} as {dec})) as double)").alias("s2"),
        F.expr(f"cast(sum(cast({yc} as {dec})) as double)").alias("sy"),
        F.expr(f"cast(sum(cast({qc} * {qc} as {dec})) as double)").alias("s11"),
        F.expr(f"cast(sum(cast({dc} * {dc} as {dec})) as double)").alias("s22"),
        F.expr(f"cast(sum(cast({qc} * {dc} as {dec})) as double)").alias("s12"),
        F.expr(f"cast(sum(cast({qc} * {yc} as {dec})) as double)").alias("s1y"),
        F.expr(f"cast(sum(cast({dc} * {yc} as {dec})) as double)").alias("s2y"),
    )
    stats = stats.withColumn("n", F.col("n_obs").cast("double"))
    det = F.expr(OLS2_DET)
    return stats.select(
        *group_cols,
        "n_obs",
        F.when(det != 0.0, F.expr(OLS2_B0) / det / 100.0).alias("beta0"),
        F.when(det != 0.0, F.expr(OLS2_B1) / det).alias("beta1"),
        F.when(det != 0.0, F.expr(OLS2_B2) / det).alias("beta2"),
    )


def yoy_revenue(orders: DataFrame) -> DataFrame:
    """Year-over-year revenue with CALENDAR alignment: each month joins
    its same-month-last-year total — ``(month, revenue, prev_year_rev,
    yoy_delta, yoy_ratio)``.

    The companion to :func:`mom_revenue` with the important structural
    difference: YoY is NOT a lag over adjacent rows (a missing month
    would silently misalign a lag-12), it is an equi-join of the month
    table against itself on the shifted calendar key — correct under
    gaps by construction.  Both sides are the same #months-grain
    pre-aggregate, so the join is grain-bounded; months with no
    prior-year counterpart surface NULL.
    """
    from p2_mapreduce_spark.functions.numeric import dsum

    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(dsum("o_totalprice").alias("revenue"))
    shifted = monthly.select(
        # align "2024-03" with "2023-03": add one year to the key
        F.concat(
            (F.substring("month", 1, 4).cast("int") + 1).cast("string"),
            F.substring("month", 5, 3),
        ).alias("month"),
        F.col("revenue").alias("prev_year_rev"),
    )
    return monthly.join(shifted, "month", "left").select(
        "month",
        "revenue",
        "prev_year_rev",
        (F.col("revenue") - F.col("prev_year_rev")).alias("yoy_delta"),
        (F.col("revenue") / F.col("prev_year_rev")).alias("yoy_ratio"),
    )


def weekday_seasonality(events: DataFrame) -> DataFrame:
    """Weekday seasonal baseline and per-day deviation: each (type, day)
    total compared against the mean of ITS OWN weekday — ``(event_type,
    day, weekday, day_value, baseline, ratio)`` — the decomposition that
    separates "Mondays are always slow" from "THIS Monday is anomalous"
    (value_outliers' z-score flags the latter without removing the
    former).

    Two grain-bounded aggregates (day grain, then weekday grain) and a
    join back at day grain.  Exact-cent integers throughout; baseline =
    one IEEE division of exact sums, ratio = ``(day_c · n_days) /
    total_c`` — a single division of exact BIGINT products, so every
    number is bit-identical cross-engine.
    """
    daily = events.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
    ).agg(
        F.sum(
            F.expr("cast(cast(value as decimal(12,2)) * 100 as bigint)")
        ).cast("bigint").alias("day_c")
    )
    daily = daily.withColumn("weekday", F.dayofweek("day").cast("bigint"))
    base = daily.groupBy("event_type", "weekday").agg(
        F.sum("day_c").cast("bigint").alias("total_c"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    return (
        daily.join(base, ["event_type", "weekday"])
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "weekday",
            (F.col("day_c").cast("double") / 100.0).alias("day_value"),
            (
                F.col("total_c").cast("double")
                / F.col("n_days").cast("double")
                / 100.0
            ).alias("baseline"),
            (
                (F.col("day_c") * F.col("n_days")).cast("double")
                / F.col("total_c").cast("double")
            ).alias("ratio"),
        )
    )


def gap_interpolate(events: DataFrame) -> DataFrame:
    """Linear interpolation over the dense hourly grid — the
    straight-line sibling of :func:`gap_fill_hourly`'s forward fill
    (sensor/metric series where a gap should ramp between its anchors,
    not hold the stale reading).

    Same shape as the fill: grain-bounded grid explode, one left join,
    per-series windows.  Each gap hour takes
    ``prev + (next - prev) · (i - i_prev) / (i_next - i_prev)`` where
    the ``i`` are the grid ORDINALS (exact ints — the grid is dense, so
    ordinal distance IS hour distance; no timestamp arithmetic, which
    keeps the expression engine-portable for NTZ timestamps).  Leading
    hours (no left anchor) stay NULL, trailing hours (no right anchor)
    hold the last value — both deliberate, pinned semantics.  All
    arithmetic is one fixed IEEE tree per row.
    """
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.max("value").alias("val"))
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour").alias("mn"), F.max("hour").alias("mxh")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("mn", "mxh", F.expr("interval 1 hour"))).alias("hour"),
    )
    base = grid.join(hourly, ["event_type", "hour"], "left")
    w_ord = Window.partitionBy("event_type").orderBy("hour")
    w_fwd = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_bwd = w_ord.rowsBetween(0, Window.unboundedFollowing)
    idx = F.row_number().over(w_ord)
    base = base.withColumn("i", idx)
    obs_i = F.when(F.col("val").isNotNull(), F.col("i"))
    prev_v = F.last("val", ignorenulls=True).over(w_fwd)
    prev_i = F.last(obs_i, ignorenulls=True).over(w_fwd)
    next_v = F.first("val", ignorenulls=True).over(w_bwd)
    next_i = F.first(obs_i, ignorenulls=True).over(w_bwd)
    interp = (
        F.when(F.col("val").isNotNull(), F.col("val"))
        .when(prev_v.isNull(), F.lit(None).cast("double"))
        .when(next_v.isNull(), prev_v)
        .otherwise(
            prev_v
            + (next_v - prev_v)
            * (F.col("i") - prev_i)
            / (next_i - prev_i)
        )
    )
    return base.select(
        "event_type",
        "hour",
        F.col("val").alias("observed"),
        interp.alias("interpolated"),
    )


def rolling_median(events: DataFrame, days: int = 7) -> DataFrame:
    """Trailing-N-day exact median event value per calendar day — the
    robust-statistics rolling metric (p50 shrugs off the outliers that
    wreck a rolling mean).

    Exact percentiles have no windowed partial form (same bind as
    rolling COUNT DISTINCT), so this reuses the
    :func:`rolling_active_users` construction: collapse events to the
    (day, value-list-free) fact grain they already have, RANGE-join each
    event day to the ≤N calendar days it contributes to (calendar
    broadcast — it is #days rows), and take ONE exact percentile
    aggregate per day.  Work is events × N — independent of how the
    events cluster; at 100 TB swap the exact percentile for the
    hist_state sketch with identical plan shape.

    Determinism: the built-in ``percentile`` and the oracle engine's
    ``quantile_cont`` agree on the math but differ by an ulp in the
    IEEE interpolation tree (the daily_envelope hazard), so the median
    is the EXPLICIT shared formula over the window's sorted value
    array: ``a[i] + (a[i+1]-a[i])·frac`` with ``pos=(n-1)/2`` — both
    engines compile the same expression, bit-identical.
    """
    daily = events.select(F.to_date("ts").alias("ad"), "value")
    cal = _calendar(events)
    joined = daily.join(
        F.broadcast(cal),
        (F.col("ad") <= F.col("d"))
        & (F.col("ad") > F.date_sub(F.col("d"), days)),
    )
    grouped = joined.groupBy("d").agg(
        F.sort_array(F.collect_list("value")).alias("vs"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    pos = (F.col("n_events") - 1).cast("double") * F.lit(0.5)
    i = F.floor(pos).cast("int")
    lo = F.element_at("vs", i + 1)
    hi = F.element_at("vs", i + 2)
    median = F.when(i + 2 > F.col("n_events"), lo).otherwise(
        lo + (hi - lo) * (pos - i.cast("double"))
    )
    return grouped.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        median.alias("median_value"),
        "n_events",
    )


def _calendar(events: DataFrame) -> DataFrame:
    """One row per calendar day spanned by the events — #days rows,
    always broadcast-sized."""
    return (
        events.agg(
            F.min(F.to_date("ts")).alias("lo"),
            F.max(F.to_date("ts")).alias("hi"),
        )
        .select(
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
        )
    )


def rolling_median_sketch(
    events: DataFrame,
    days: int = 7,
    lo_c: int = 0,
    hi_c: int = 50_000,
    n_buckets: int = 500,
) -> DataFrame:
    """Trailing-N-day median per day from MERGEABLE daily histogram
    states — the 100 TB face of :func:`rolling_median` (VERDICT r02
    item 3), mirroring wau_hll's sketch-plus-honesty-column pattern.

    The exact construction replicates every event into each of the ≤N
    windows it touches (events × N shuffle volume).  This one collapses
    each day to a :func:`~p2_mapreduce_spark.operators.profile.hist_state`
    (≤ ``n_buckets`` rows/day, regardless of event volume), range-joins
    the STATES to the calendar (#days × N × buckets rows — config
    grain), merges by SUM, and inverts the CDF exactly as
    ``hist_quantiles`` does: all-BIGINT threshold test, bucket upper
    boundary divided by 100.0 once — bit-exact cross-engine, within one
    bucket width ($1 at the defaults) above the inverted-CDF median
    (the smallest v with 2·#(≤v) ≥ n; pytest-pinned).

    ``median_exact`` rides along at fixture scale as the honesty column
    (the daily_envelope shared-interpolation formula); a production
    pipeline drops it and keeps only the state-grain plan.

    Output: (day, n_events, median_est, median_exact).
    """
    from p2_mapreduce_spark.operators.profile import hist_state

    width_c = (hi_c - lo_c) // n_buckets
    daily = events.select(F.to_date("ts").alias("ad"), "value")
    state = hist_state(daily, "value", ["ad"], lo_c, hi_c, n_buckets)
    cal = _calendar(events)
    in_window = (F.col("ad") <= F.col("d")) & (
        F.col("ad") > F.date_sub(F.col("d"), days)
    )
    merged = (
        state.join(F.broadcast(cal), in_window)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    w_cum = (
        Window.partitionBy("d")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("d")
    cum = merged.select(
        "d",
        "bucket",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_tot).alias("total"),
    )
    est = (
        cum.groupBy("d")
        .agg(
            F.max("total").cast("bigint").alias("n_events"),
            (
                F.min(
                    F.when(
                        F.col("cum") * 2 >= F.col("total"),
                        (F.col("bucket") + 1) * width_c + lo_c,
                    )
                )
                / 100.0
            ).alias("median_est"),
        )
    )
    exact = rolling_median(events, days=days).select(
        "day", F.col("median_value").alias("median_exact")
    )
    return (
        est.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n_events",
            "median_est",
        )
        .join(exact, "day")
    )


def daily_envelope(events: DataFrame) -> DataFrame:
    """Per-day p10/p50/p90 envelope of event values per type — the
    dashboard band behind every "is today normal?" glance.

    Determinism note: the built-in ``percentile`` and the oracle
    engine's ``quantile_cont`` agree on the MATH but not the IEEE tree —
    their interpolations differ by an ulp on real data (caught at
    sf0.1), so the interpolation here is an EXPLICIT shared formula over
    the group's sorted value array: ``a[i] + (a[i+1]-a[i])·frac`` with
    ``pos=(n-1)·q`` — both engines compile the same expression, so the
    band is bit-identical.  The per-group array is bounded by the
    (type, day) grain — the same bound every per-day aggregate here
    accepts; for data-grain percentiles use the hist_state sketch.
    """
    day = F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    grouped = (
        events.groupBy("event_type", day)
        .agg(
            F.sort_array(F.collect_list("value")).alias("vs"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )

    def q(frac: float):
        pos = (F.col("n_events") - 1).cast("double") * F.lit(frac)
        i = F.floor(pos).cast("int")
        lo = F.element_at("vs", i + 1)
        hi = F.element_at("vs", i + 2)
        return F.when(
            i + 2 > F.col("n_events"), lo
        ).otherwise(lo + (hi - lo) * (pos - i.cast("double")))

    return grouped.select(
        "event_type",
        "day",
        q(0.1).alias("p10"),
        q(0.5).alias("p50"),
        q(0.9).alias("p90"),
        "n_events",
    )


def mad_outliers(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Robust per-group outlier detection via the Median Absolute
    Deviation — the companion to :func:`value_outliers` for the
    long-tailed metrics where mean/std are themselves dragged by the
    outliers they're supposed to find (a single 100× spike inflates σ
    until nothing is 3σ out; the median and MAD don't move).

    All arithmetic runs at exact integer CENTS grain and the medians
    are inverted-CDF order statistics (smallest value whose cumulative
    count reaches half) — no interpolation, nothing to drift
    cross-engine.  The outlier test |v − med| > 3·1.4826·MAD is the
    exact-integer cross-multiplication ``10000·|c − med_c| >
    44478·mad_c`` (3·1.4826 = 4.4478 exactly, in ten-thousandths).

    Scale shape: everything beyond the first aggregate runs at
    (group, distinct-cents) grain — the 2-decimal telemetry domain is
    value-bounded (≤ ~50k cents values here) regardless of row count,
    the same contract as ks_drift's value-grain windows.  A MAD of 0
    (over half the mass at the median) flags every off-median value —
    the standard degenerate-MAD convention, deterministic.

    Output: (group, n_events, median_v, mad_v, n_outliers).
    """
    cents = F.floor(F.col(value_col) * 100).cast("bigint")
    per = events.groupBy(
        F.col(group_col).alias("g"), cents.alias("c")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("g")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("g")
    cum = per.select(
        "g",
        "c",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_tot).alias("tot"),
    )
    med = (
        cum.where(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("g", "tot")
        .agg(F.min("c").alias("med_c"))
    )
    dev = (
        per.join(med.select("g", "med_c"), "g")
        .groupBy("g", F.abs(F.col("c") - F.col("med_c")).alias("d"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    w_cum_d = (
        Window.partitionBy("g")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_d = dev.select(
        "g",
        "d",
        F.sum("cnt").over(w_cum_d).alias("cum"),
        F.sum("cnt").over(w_tot).alias("tot"),
    )
    mad = (
        cum_d.where(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("g")
        .agg(F.min("d").alias("mad_c"))
    )
    flagged = (
        per.join(med.select("g", "tot", "med_c"), "g")
        .join(mad, "g")
        .groupBy("g", "tot", "med_c", "mad_c")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("c") - F.col("med_c")) * 10_000
                    > F.col("mad_c") * 44_478,
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            ).alias("n_outliers")
        )
    )
    return flagged.select(
        F.col("g").alias(group_col),
        F.col("tot").cast("bigint").alias("n_events"),
        (F.col("med_c") / 100.0).alias("median_v"),
        (F.col("mad_c") / 100.0).alias("mad_v"),
        F.col("n_outliers").cast("bigint").alias("n_outliers"),
    )


def twap(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average (TWAP) per group — the finance/telemetry
    aggregate where each observation holds until the next one (step
    interpolation), so sampling cadence stops biasing the mean: a value
    that persisted 50 minutes weighs 50× one that lasted a minute.

    The successor pairing is a DISTRIBUTED LAG: a bare
    ``lag().over(partitionBy(group))`` is a single-task sort per group
    (groups are few and data-grain — the mega-source problem), so the
    global per-group ordinal comes from the two-phase distributed rank
    and each row meets its successor through an equi-join on
    ``(group, r+1)`` — one shuffle on config-×-data grain keys, no
    single-task sort anywhere.

    Exactness: integer µs gaps × integer cents, summed in
    DECIMAL(38,0) (HUGEINT oracle-side), two pinned double divisions at
    the surface.  Groups need ≥ 2 events to have a time span (inner
    pairing; singletons drop, documented).

    Output: (group, n_events, span_us, twap).
    """
    t = (
        events.select(
            F.col(group_col).alias("g"),
            # NTZ-safe: timestamps order directly; gaps come from
            # interval subtraction cast to total µs (unix_micros rejects
            # TIMESTAMP_NTZ, the fixture's type)
            F.col(ts_col).alias("tstamp"),
            F.floor(F.col(value_col) * 100).cast("bigint").alias("cents"),
            F.col(id_col).alias("id"),
        )
        .repartitionByRange(F.col("g"), F.col("tstamp"), F.col("id"))
        .withColumn("pid", F.spark_partition_id())
    )
    w_in = Window.partitionBy("pid", "g").orderBy("tstamp", "id")
    t = t.withColumn("rn", F.row_number().over(w_in))
    per = t.groupBy("pid", "g").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("g")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("pid", "g", "off")
    totals = per.groupBy("g").agg(F.sum("cnt").alias("n_g"))
    r = (
        t.join(F.broadcast(offsets), ["pid", "g"])
        .select(
            "g", "tstamp", "cents", (F.col("off") + F.col("rn")).alias("r")
        )
    )
    a, b = r.alias("a"), r.alias("b")
    pairs = a.join(
        b,
        (F.col("a.g") == F.col("b.g")) & (F.col("b.r") == F.col("a.r") + 1),
    ).select(
        F.col("a.g").alias("g"),
        F.col("a.cents").alias("cents"),
        F.expr("timestampdiff(MICROSECOND, a.tstamp, b.tstamp)").alias("gap"),
    )
    num = F.sum(F.col("cents").cast("decimal(38,0)") * F.col("gap"))
    return (
        pairs.groupBy("g")
        .agg(
            F.sum("gap").cast("bigint").alias("span_us"),
            num.alias("num"),
        )
        .join(F.broadcast(totals), "g")
        .select(
            F.col("g").alias(group_col),
            F.col("n_g").cast("bigint").alias("n_events"),
            "span_us",
            (
                F.col("num").cast("double")
                / F.col("span_us").cast("double")
                / F.lit(100.0)
            ).alias("twap"),
        )
    )


def theil_sen_trend(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Theil–Sen robust trend per group: the MEDIAN of all pairwise
    slopes of the daily-revenue series — the slope estimator with a 29%
    breakdown point (one corrupted day barely moves it, where the OLS
    ``grouped_trend`` chases it; reporting both is the standard outlier
    triage).

    Shape at 100 TB: the fact table collapses to (group, day) grain in
    one map-side-combined exact-cents aggregate FIRST; the pairwise
    self-join and the median run at calendar grain (≤ ~days²/2 rows per
    group, config-bounded), never at event grain.  Each slope is one
    IEEE division of exact integers (cent diff / day diff); the median
    is an exact order-statistic pick — odd count selects one slope,
    even count averages the two middles with the pinned ``(a+b)/2e0``
    tree — so the statistic is bit-identical cross-engine.
    """
    daily = (
        events.select(
            F.col(group_col).alias("g"),
            F.to_date("ts").alias("d"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("g", "d")
        .agg(F.sum("cents").alias("y"))
        .select(
            "g",
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).alias("x"),
            "y",
        )
    )
    a = daily.select(
        F.col("g"), F.col("x").alias("xi"), F.col("y").alias("yi")
    )
    b = daily.select(
        F.col("g").alias("g2"), F.col("x").alias("xj"), F.col("y").alias("yj")
    )
    slopes = a.join(
        b, (F.col("g") == F.col("g2")) & (F.col("xi") < F.col("xj"))
    ).select(
        "g",
        (
            (F.col("yj") - F.col("yi")).cast("double")
            / (F.col("xj") - F.col("xi")).cast("double")
        ).alias("slope"),
    )
    w = Window.partitionBy("g").orderBy("slope")
    ranked = slopes.withColumn("r", F.row_number().over(w))
    # select the middle order statistics explicitly: lo = floor((n+1)/2),
    # hi = ceil((n+1)/2); median = (slope_lo + slope_hi) / 2e0
    cnt = slopes.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    mids = (
        ranked.join(F.broadcast(cnt), "g")
        .filter(
            (F.col("r") == F.expr("(n_pairs + 1) div 2"))
            | (F.col("r") == F.expr("(n_pairs + 2) div 2"))
        )
        .groupBy("g", "n_pairs")
        .agg(
            ((F.min("slope") + F.max("slope")) / F.lit(2.0)).alias(
                "slope_cents_per_day"
            )
        )
    )
    days = daily.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return (
        mids.join(days, "g")
        .select(
            F.col("g").alias(group_col),
            "n_days",
            "n_pairs",
            "slope_cents_per_day",
        )
    )


def ewma_daily(events: DataFrame, group_col: str = "event_type", max_age: int = 40) -> DataFrame:
    """Per-group exponentially-weighted daily revenue (half-life one
    day): ``ewma(t) = Σ_{i≤t} x_i · 2^(t−i... )`` — the smoothing
    baseline dashboards draw, computed EXACTLY: daily totals quantize to
    cents once, each (day t, contributing day i) term is ``(cents_i ·
    10⁴) div 2^(t−i)`` in BIGINT (the :func:`~p2_mapreduce_spark.
    operators.events_analytics.decayed_engagement` power-of-2 device),
    summed exactly and divided by 10⁶ once at the surface — no float
    recursion, no accumulated rounding, partition/engine-invariant.

    Shape at 100 TB: the fact table collapses to (group, day) cents in
    one map-side-combined aggregate FIRST; the decay pairing is a
    calendar-grain range join (≤ days × min(days, max_age) rows per
    group — config-bounded), so smoothing cost is independent of event
    volume.  Days beyond ``max_age`` back contribute exactly 0 and are
    pruned by the join predicate.
    """
    daily = (
        events.select(
            F.col(group_col).alias("g"),
            F.to_date("ts").alias("d"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("g", "d")
        .agg(F.sum("cents").alias("y"))
        .select(
            "g",
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).alias("x"),
            F.col("d"),
            "y",
        )
    )
    contrib = daily.select(
        F.col("g").alias("g2"), F.col("x").alias("xi"), F.col("y").alias("yi")
    )
    pair = daily.join(
        contrib,
        (F.col("g") == F.col("g2"))
        & (F.col("xi") <= F.col("x"))
        & (F.col("xi") > F.col("x") - F.lit(int(max_age))),
    )
    term = F.expr("(yi * 10000) div shiftleft(CAST(1 AS BIGINT), x - xi)")
    return (
        pair.select(
            "g",
            F.col("d"),
            F.col("y"),
            term.alias("term"),
        )
        .groupBy("g", "d", "y")
        .agg(F.sum("term").cast("bigint").alias("ewma_micro"))
        .select(
            F.col("g").alias(group_col),
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            (F.col("y").cast("double") / F.lit(100.0)).alias("day_value"),
            "ewma_micro",
            (F.col("ewma_micro").cast("double") / F.lit(1000000.0)).alias(
                "ewma_value"
            ),
        )
    )


def acf_lags(events: DataFrame, max_lag: int = 7) -> DataFrame:
    """Sample autocorrelation of the daily-revenue series per
    ``event_type`` at calendar-day lags 1..``max_lag`` — the diagnostic
    behind seasonality detection and forecast-model order selection
    (complements :func:`weekday_seasonality`, which assumes the period,
    and :func:`grouped_trend`, which fits only the mean drift).

    Definition (standard sample ACF, full-series mean and variance):
    ``r_k = sum_t (y_t - m)(y_{t+k} - m) / sum_t (y_t - m)^2`` where the
    numerator ranges over calendar-day pairs (d, d+k) both present.

    Scale design: the fact table collapses to calendar grain (one
    map-side-combined aggregate — at 100 TB the daily series is still
    only #groups x #days rows), per-group (n, S) stats ride a broadcast
    join, and each lag is an EQUI-join ``(g, x+k) = (g, x)`` built from
    a ``sequence(1, K)`` explode — hash-partitioned by day key, never a
    range or cross join.  Everything after is a map-side-combined
    aggregate at (group, lag) grain.

    Exactness discipline (cf. :func:`grouped_trend`): cents are exact
    BIGINT, the mean is cleared by multiplying through by n —
    ``num_k = sum (n*y_t - S)(n*y_{t+k} - S)``, ``den = sum (n*y_d -
    S)^2`` — all products in DECIMAL(38,0) (n*y <= ~1e14 at 100 TB-day
    grain, squared 1e28 < 38 digits), and ``r_k`` is ONE double
    division mirrored verbatim in the oracle.  Zero-variance groups
    surface NULL, not a div-by-zero.

    Returns ``(event_type, lag, n_days, n_pairs, acf)``.

    Reference parity: the reference's MapReduce surface has no
    time-series plane (SURVEY.md §2.3 extension); the shuffle shape is
    its M3/M5/M7 hash-partition + per-key reduce at calendar grain.
    """
    daily = (
        events.select(
            F.col("event_type").alias("g"),
            F.expr("datediff(cast(ts as date), DATE '1970-01-01')").alias("x"),
            F.expr("cast(floor(value * 100) as bigint)").alias("cents"),
        )
        .groupBy("g", "x")
        .agg(F.sum("cents").alias("y"))
    )
    stats = daily.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("y").alias("s"),
    )
    centered = daily.join(F.broadcast(stats), "g").select(
        "g",
        "x",
        "n_days",
        # n*y - S: BIGINT * BIGINT widened to decimal(38,0) — exact
        (F.col("n_days").cast("decimal(19,0)") * F.col("y") - F.col("s"))
        .cast("decimal(38,0)")
        .alias("dev"),
    )
    den = centered.groupBy("g").agg(
        F.sum(
            (F.col("dev") * F.col("dev")).cast("decimal(38,0)")
        ).alias("den_scaled"),
        F.max("n_days").alias("n_days"),
    )
    lags = centered.select(
        "g", "x", F.col("dev").alias("dev_a"),
        F.explode(F.expr(f"sequence(1, {int(max_lag)})")).alias("lag"),
    ).withColumn("x_b", F.col("x") + F.col("lag"))
    paired = lags.join(
        centered.select("g", F.col("x").alias("x_b"), F.col("dev").alias("dev_b")),
        ["g", "x_b"],
    )
    num = paired.groupBy("g", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            (F.col("dev_a") * F.col("dev_b")).cast("decimal(38,0)")
        ).alias("num_scaled"),
    )
    return (
        num.join(F.broadcast(den), "g")
        .select(
            F.col("g").alias("event_type"),
            F.col("lag").cast("bigint").alias("lag"),
            "n_days",
            "n_pairs",
            F.when(
                F.col("den_scaled") != 0,
                F.col("num_scaled").cast("double")
                / F.col("den_scaled").cast("double"),
            ).alias("acf"),
        )
    )


def interarrival_stats(
    events: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """Arrival-process audit per group: mean inter-arrival gap and the
    squared coefficient of variation CV² of the gaps — the one-number
    Poisson check (CV² ≈ 1 memoryless, ≪1 regular/scheduled, ≫1 bursty)
    that sizes streaming capacity and picks batch trigger intervals.
    Complements :func:`ooo_rate` (which audits ARRIVAL order); this
    audits EVENT-TIME spacing.

    Consecutive gaps come from the twap/ooo_rate DISTRIBUTED LAG: a
    two-phase global ordinal over (group, ts, id) — range-repartition,
    within-partition row_number, offset table broadcast back, no
    single-task per-group sort — then the (group, r+1) equi-join pairs
    each event with its successor.  Gaps are exact integer µs
    (``timestampdiff``, NTZ-safe); sums accumulate in DECIMAL(38,0)
    (order-independent), and the two outputs are each ONE pinned tree:
    ``mean_gap_us = Σd / n_pairs`` and
    ``cv2 = (n·Σd² − (Σd)²) / ((Σd)·(Σd))`` — exact-integer inputs, so
    bit-identical cross-engine.  Groups with <2 events or all-zero gaps
    surface NULL.

    Returns ``(group, n_events, n_pairs, mean_gap_us, cv2)``.

    Reference parity: the M6 sort surface as a distributed ordinal
    (SURVEY.md §2.2); the statistic itself is extension surface.
    """
    t = (
        events.select(
            F.col(group_col).alias("g"),
            F.col("ts").alias("tstamp"),
            F.col("event_id").alias("id"),
        )
        .repartitionByRange(F.col("g"), F.col("tstamp"), F.col("id"))
        .withColumn("pid", F.spark_partition_id())
    )
    w_in = Window.partitionBy("pid", "g").orderBy("tstamp", "id")
    t = t.withColumn("rn", F.row_number().over(w_in))
    per = t.groupBy("pid", "g").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("g")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("pid", "g", "off")
    totals = per.groupBy("g").agg(F.sum("cnt").cast("bigint").alias("n_g"))
    r = t.join(F.broadcast(offsets), ["pid", "g"]).select(
        "g", "tstamp", (F.col("off") + F.col("rn")).alias("r")
    )
    a, b = r.alias("a"), r.alias("b")
    gaps = a.join(
        b,
        (F.col("a.g") == F.col("b.g")) & (F.col("b.r") == F.col("a.r") + 1),
    ).select(
        F.col("a.g").alias("g"),
        F.expr("timestampdiff(MICROSECOND, a.tstamp, b.tstamp)").alias("d"),
    )
    agg = gaps.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.col("d").cast("decimal(38,0)")).alias("sd"),
        # widen BEFORE the square: a year-scale gap in µs (~3e13)
        # squared overflows BIGINT; decimal(19)×bigint stays exact
        F.sum(
            (F.col("d").cast("decimal(19,0)") * F.col("d")).cast(
                "decimal(38,0)"
            )
        ).alias("sdd"),
    )
    return agg.join(F.broadcast(totals), "g").select(
        F.col("g").alias(group_col),
        F.col("n_g").alias("n_events"),
        "n_pairs",
        F.expr("cast(sd as double) / cast(n_pairs as double)").alias(
            "mean_gap_us"
        ),
        F.when(
            F.col("sd") != 0,
            F.expr(
                "(cast(n_pairs as double) * cast(sdd as double)"
                " - cast(sd as double) * cast(sd as double))"
                " / (cast(sd as double) * cast(sd as double))"
            ),
        ).alias("cv2"),
    )


def seasonal_outliers(events: DataFrame) -> DataFrame:
    """Seasonality-aware anomaly detection: a day is anomalous when its
    revenue deviates from its WEEKDAY baseline by more than 3 robust
    sigmas — the composition incident review actually needs
    (:func:`value_outliers`' plain z-score fires every Saturday on a
    weekly-seasonal series; subtracting the weekday median first is
    the fix, and MAD keeps the threshold from being dragged by the
    incidents it hunts).

    All-integer pipeline: daily cents → per-(group, weekday) EXACT
    median baseline (order statistics over the ≤#weeks values of that
    weekday — the doubled (lo+hi) trick keeps .5 medians integer) →
    residual R = 2·cents − baseline₂ → per-group MAD of |R| (same
    doubled trick → mad₄) → flag ``2·|R| > 3·mad₄`` — pure BIGINT
    comparisons end-to-end, nothing to drift cross-engine.

    Window inputs are calendar-grain (days per (group, weekday) ≤
    #weeks; residuals per group ≤ #days) — the rolling_median /
    daily_envelope scale argument.  Returns per-day rows
    ``(event_type, day, cents, resid_x2, mad_x4, is_outlier)``.
    """
    daily = (
        events.select(
            F.col("event_type").alias("g"),
            F.to_date("ts").alias("day"),
            F.expr("cast(floor(value * 100) as bigint)").alias("c"),
        )
        .groupBy("g", "day")
        .agg(F.sum("c").alias("cents"))
        .withColumn("dow", F.dayofweek("day"))
    )
    w_rank = Window.partitionBy("g", "dow").orderBy("cents", "day")
    w_cnt = Window.partitionBy("g", "dow")
    ranked = daily.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "n", F.count(F.lit(1)).over(w_cnt)
    )
    base = (
        ranked.filter(
            (F.col("rn") == F.expr("(n + 1) div 2"))
            | (F.col("rn") == F.expr("(n + 2) div 2"))
        )
        .groupBy("g", "dow")
        .agg((F.min("cents") + F.max("cents")).alias("b2"))
    )
    resid = daily.join(base, ["g", "dow"]).withColumn(
        "r", F.expr("2 * cents - b2")
    )
    w_mrank = Window.partitionBy("g").orderBy(F.abs("r"), "day")
    w_mcnt = Window.partitionBy("g")
    mranked = resid.withColumn("mrn", F.row_number().over(w_mrank)).withColumn(
        "mn", F.count(F.lit(1)).over(w_mcnt)
    )
    mad = (
        mranked.filter(
            (F.col("mrn") == F.expr("(mn + 1) div 2"))
            | (F.col("mrn") == F.expr("(mn + 2) div 2"))
        )
        .groupBy("g")
        .agg((F.min(F.abs("r")) + F.max(F.abs("r"))).alias("mad4"))
    )
    return (
        resid.join(F.broadcast(mad), "g")
        .select(
            F.col("g").alias("event_type"),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cents",
            F.col("r").cast("bigint").alias("resid_x2"),
            F.col("mad4").cast("bigint").alias("mad_x4"),
            (F.abs("r") * 2 > F.lit(3) * F.col("mad4")).alias("is_outlier"),
        )
    )


def stickiness(events: DataFrame, mau_days: int = 28) -> DataFrame:
    """DAU/MAU stickiness per calendar day — THE product engagement
    ratio ("what fraction of the monthly audience shows up today"):
    daily actives over trailing-``mau_days`` actives, built on the same
    distinct (user, day) grid as :func:`rolling_active_users` — both
    counts are range-joins of the grid against the calendar, so work is
    |grid|·window, independent of raw event volume.

    Counts are exact BIGINTs; the ratio is one pinned division.
    Returns ``(d, dau, mau, stickiness)`` for every day in range.
    """
    grid = events.select("user_id", F.to_date("ts").alias("ad")).distinct()
    cal = (
        events.agg(
            F.min(F.to_date("ts")).alias("lo"),
            F.max(F.to_date("ts")).alias("hi"),
        )
        .select(
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias(
                "d"
            )
        )
    )
    dau = (
        grid.join(F.broadcast(cal), F.col("ad") == F.col("d"))
        .groupBy("d")
        .agg(F.countDistinct("user_id").cast("bigint").alias("dau"))
    )
    mau = (
        grid.join(
            F.broadcast(cal),
            (F.col("ad") <= F.col("d"))
            & (F.col("ad") > F.date_sub(F.col("d"), mau_days)),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").cast("bigint").alias("mau"))
    )
    return (
        mau.join(dau, "d", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            F.coalesce("dau", F.lit(0)).cast("bigint").alias("dau"),
            "mau",
            (
                F.coalesce("dau", F.lit(0)).cast("double")
                / F.col("mau").cast("double")
            ).alias("stickiness"),
        )
    )


def mann_kendall(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Mann–Kendall trend TEST per group — the significance companion
    to the :func:`theil_sen_trend` ESTIMATOR (the standard pairing in
    monotone-trend monitoring): over the daily-value series, ``S =
    Σ_{i<j} sign(y_j − y_i)``, the tie-corrected variance, and the
    normal-approximation z statistic — ``(group, n_days, s_stat,
    var18, z)``.

    Exactness protocol: S and the variance are pure integer statistics
    — ``var18 = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)`` is kept ×18 so it
    stays BIGINT — and z's only non-rational step is ``sqrt``, which
    IEEE-754 defines as correctly rounded, so even z is bit-identical
    cross-engine (same dodge as the Wilson interval's pinned tree).
    Continuity correction per the standard test: z = (S−1)/√var for
    S > 0, (S+1)/√var for S < 0, 0 at S = 0 or zero variance.

    Scale shape: the fact table contracts to (group, day) grain FIRST
    (map-side combined); the sign-pair join and the tie histogram run
    at calendar grain only — the same Θ(days²) envelope as Theil–Sen,
    never event grain.
    """
    daily = (
        events.select(
            F.col(group_col).alias("g"),
            F.to_date("ts").alias("d"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("g", "d")
        .agg(F.sum("cents").alias("y"))
    )
    a = daily.select("g", F.col("d").alias("di"), F.col("y").alias("yi"))
    b = daily.select(
        F.col("g").alias("g2"), F.col("d").alias("dj"), F.col("y").alias("yj")
    )
    s = (
        a.join(b, (F.col("g") == F.col("g2")) & (F.col("di") < F.col("dj")))
        .groupBy("g")
        .agg(
            F.sum(F.signum((F.col("yj") - F.col("yi")).cast("double")).cast("bigint"))
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n = daily.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    ties = (
        daily.groupBy("g", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("g")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("bigint").alias("tie_term")
        )
    )
    base = (
        n.join(s, "g", "left")
        .join(ties, "g", "left")
        .select(
            "g",
            "n_days",
            F.coalesce("s_stat", F.lit(0)).cast("bigint").alias("s_stat"),
            (
                F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
                - F.coalesce("tie_term", F.lit(0))
            ).cast("bigint").alias("var18"),
        )
    )
    sqrt_var = F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    z = (
        F.when(
            (F.col("var18") <= 0) | (F.col("s_stat") == 0), F.lit(0.0)
        )
        .when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1).cast("double") / sqrt_var,
        )
        .otherwise((F.col("s_stat") + 1).cast("double") / sqrt_var)
    )
    return base.select(
        F.col("g").alias(group_col),
        "n_days",
        "s_stat",
        "var18",
        z.alias("z"),
    )


def _daily_cents(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """(g, d, y) daily revenue in exact cents per group — the shared
    day-grain contraction every rank/trend test below starts from."""
    return (
        events.select(
            F.col(group_col).alias("g"),
            F.to_date("ts").alias("d"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("g", "d")
        .agg(F.sum("cents").alias("y"))
    )


def runs_test(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Wald–Wolfowitz runs test on the daily up/down move sequence per
    group — a nonparametric randomness check that complements the
    monotone-trend tests (:func:`mann_kendall` asks "does it drift?";
    runs asks "does it alternate too little/too much?", catching
    oscillation and regime stickiness that S-statistics miss).

    Day-over-day moves (zero moves dropped, per the classical test) give
    ``a`` ups, ``b`` downs, and ``r`` runs (maximal same-sign blocks).
    Under H0: μ = 2ab/(a+b) + 1 and σ² = 2ab(2ab−a−b)/((a+b)²(a+b−1)).
    All of a, b, r are exact integers from window counts; z = (r − μ)/σ
    is one pinned IEEE tree whose only non-rational step is the
    correctly-rounded sqrt (the mann_kendall dodge).

    Scale shape: day-grain contraction first, then one lag window and
    one aggregate per group at calendar grain — never event grain.
    Output: (group, n_moves, n_up, n_down, n_runs, z).
    """
    daily = _daily_cents(events, group_col)
    w = Window.partitionBy("g").orderBy("d")
    moves = (
        daily.withColumn("prev", F.lag("y").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("y") != F.col("prev")))
        .withColumn("sgn", F.when(F.col("y") > F.col("prev"), 1).otherwise(-1))
    )
    runs = moves.withColumn(
        "new_run",
        F.when(
            F.lag("sgn").over(w).isNull()
            | (F.lag("sgn").over(w) != F.col("sgn")),
            1,
        ).otherwise(0),
    )
    agg = runs.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_moves"),
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_up"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_down"),
        F.sum("new_run").cast("bigint").alias("n_runs"),
    )
    a = F.col("n_up").cast("double")
    b = F.col("n_down").cast("double")
    n = a + b
    mu = 2.0 * a * b / n + 1.0
    var = 2.0 * a * b * (2.0 * a * b - a - b) / (n * n * (n - 1.0))
    z = F.when(
        (F.col("n_up") == 0) | (F.col("n_down") == 0) | (F.col("n_moves") <= 1),
        F.lit(0.0),
    ).otherwise((F.col("n_runs").cast("double") - mu) / F.sqrt(var))
    return agg.select(
        F.col("g").alias(group_col),
        "n_moves", "n_up", "n_down", "n_runs",
        z.alias("z"),
    )


def spearman_daily(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Spearman rank correlation per group between the two daily series
    every ops dashboard pairs: revenue (Σ value) and volume (event
    count) — "do big-revenue days come from many events or few whales?".
    Rank correlation is the robust choice over Pearson on raw values
    (heavy-tailed daily revenue), and unlike Kendall it is O(days) after
    ranking.

    Exactness protocol: tie-aware midranks are ``.5``-granular, so
    DOUBLED ranks are exact integers (rank window: 2·midrank =
    2·min_rank + (ties − 1)).  All five sufficient statistics (Σx, Σy,
    Σx², Σy², Σxy over doubled ranks) are BIGINT-exact; ρ = (nΣxy −
    ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²)) is one pinned tree — doubling
    cancels — with the correctly-rounded sqrt its only non-rational op.
    Sums stay < 2^62 for any calendar span a day grid can reach
    (n_days ≤ ~10⁵ → Σ(2r)² ≤ n·(2n)² ≈ 4·10¹⁵).

    Scale shape: day-grain contraction, two rank windows per group at
    calendar grain, one aggregate.  Output: (group, n_days, rho).
    """
    daily = _daily_cents(events, group_col).join(
        events.select(
            F.col(group_col).alias("g"), F.to_date("ts").alias("d")
        )
        .groupBy("g", "d")
        .agg(F.count(F.lit(1)).alias("cnt")),
        ["g", "d"],
    )
    ranked = daily
    for c, rc in (("y", "rx2"), ("cnt", "ry2")):
        wv = Window.partitionBy("g").orderBy(c)
        ranked = ranked.withColumn(
            rc,
            (
                2 * F.rank().over(wv)
                + F.count(F.lit(1)).over(
                    Window.partitionBy("g", c)
                )
                - 1
            ).cast("bigint"),
        )
    agg = ranked.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("rx2").cast("bigint").alias("sx"),
        F.sum("ry2").cast("bigint").alias("sy"),
        F.sum(F.col("rx2") * F.col("rx2")).cast("bigint").alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).cast("bigint").alias("syy"),
        F.sum(F.col("rx2") * F.col("ry2")).cast("bigint").alias("sxy"),
    )
    nd = F.col("n_days").cast("double")
    cov = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    vx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    vy = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")
    rho = F.when((vx <= 0.0) | (vy <= 0.0), F.lit(0.0)).otherwise(
        cov / F.sqrt(vx * vy)
    )
    return agg.select(
        F.col("g").alias(group_col), "n_days", rho.alias("rho")
    )


def kendall_tau_xy(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Kendall τ-b per group between daily revenue and daily volume —
    the concordance companion to :func:`spearman_daily` (τ has the
    cleaner interpretation as P(concordant) − P(discordant) and better
    small-n behavior; dashboards report both).  Extends mann_kendall's
    S-statistic machinery from (time, value) to (value, value) pairs
    with the tie-aware τ-b denominator.

    Integer protocol: over all day pairs i<j, C, D, and the single-axis
    tie counts are exact BIGINT window/join counts; τ-b = (C − D) /
    √((n0 − tx)(n0 − ty)) with n0 = n(n−1)/2 — one pinned tree, sqrt
    correctly rounded.

    Scale shape: the pair stage runs at CALENDAR grain per group (the
    mann_kendall envelope — Θ(days²) on a bounded day grid, never event
    grain).  Output: (group, n_days, concordant, discordant, tau_b).
    """
    daily = _daily_cents(events, group_col).join(
        events.select(
            F.col(group_col).alias("g"), F.to_date("ts").alias("d")
        )
        .groupBy("g", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")),
        ["g", "d"],
    )
    a = daily.select(
        "g", F.col("d").alias("di"), F.col("y").alias("xi"), F.col("cnt").alias("yi")
    )
    b = daily.select(
        F.col("g").alias("g2"), F.col("d").alias("dj"),
        F.col("y").alias("xj"), F.col("cnt").alias("yj"),
    )
    pairs = a.join(
        b, (F.col("g") == F.col("g2")) & (F.col("di") < F.col("dj"))
    ).select(
        "g",
        (F.signum((F.col("xj") - F.col("xi")).cast("double"))
         * F.signum((F.col("yj") - F.col("yi")).cast("double"))).cast("int").alias("cd"),
        (F.col("xi") == F.col("xj")).cast("int").alias("tie_x"),
        (F.col("yi") == F.col("yj")).cast("int").alias("tie_y"),
    )
    agg = pairs.groupBy("g").agg(
        F.sum(F.when(F.col("cd") == 1, 1).otherwise(0)).cast("bigint").alias("concordant"),
        F.sum(F.when(F.col("cd") == -1, 1).otherwise(0)).cast("bigint").alias("discordant"),
        F.sum("tie_x").cast("bigint").alias("tx"),
        F.sum("tie_y").cast("bigint").alias("ty"),
        F.count(F.lit(1)).cast("bigint").alias("n0"),
    )
    n = daily.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    out = n.join(agg, "g", "left").select(
        "g", "n_days",
        F.coalesce("concordant", F.lit(0)).alias("concordant"),
        F.coalesce("discordant", F.lit(0)).alias("discordant"),
        F.coalesce("tx", F.lit(0)).alias("tx"),
        F.coalesce("ty", F.lit(0)).alias("ty"),
        F.coalesce("n0", F.lit(0)).alias("n0"),
    )
    denom = (
        (F.col("n0") - F.col("tx")).cast("double")
        * (F.col("n0") - F.col("ty")).cast("double")
    )
    tau = F.when(denom <= 0.0, F.lit(0.0)).otherwise(
        (F.col("concordant") - F.col("discordant")).cast("double")
        / F.sqrt(denom)
    )
    return out.select(
        F.col("g").alias(group_col), "n_days", "concordant", "discordant",
        tau.alias("tau_b"),
    )


def mase_eval(events: DataFrame, group_col: str = "event_type", season: int = 7) -> DataFrame:
    """MASE (mean absolute scaled error) of the seasonal-naive forecast
    per group — the standard scale-free baseline every forecasting
    pipeline reports before any model ships: error of "same weekday
    last week" scaled by the in-sample one-step naive MAE.  MASE < 1
    means weekly seasonality genuinely explains the series; a model
    must beat THIS number to justify itself (the eval face of
    :func:`weekday_seasonality` / :func:`ewma_daily`).

    Integer protocol: daily revenue in exact cents; both |y_t −
    y_{t−season}| and |y_t − y_{t−1}| sums are BIGINT, matched by
    day-offset join (gap-robust — a lag() over present rows would
    silently compare across gaps); MASE = (s7/n7)/(s1/n1) is one pinned
    tree from four BIGINTs.

    Output: (group, n_seasonal, n_naive, mae_seasonal, mae_naive, mase).
    Scale shape: day-grain contraction + two self-joins on the bounded
    day grid.
    """
    daily = _daily_cents(events, group_col)
    base = daily.select("g", "d", "y")

    def _err(offset: int, s_alias: str, n_alias: str) -> DataFrame:
        prev = base.select(
            F.col("g").alias("g2"),
            F.date_add("d", offset).alias("d2"),
            F.col("y").alias("y_prev"),
        )
        return (
            base.join(
                prev,
                (F.col("g") == F.col("g2")) & (F.col("d") == F.col("d2")),
            )
            .groupBy("g")
            .agg(
                F.sum(F.abs(F.col("y") - F.col("y_prev")))
                .cast("bigint")
                .alias(s_alias),
                F.count(F.lit(1)).cast("bigint").alias(n_alias),
            )
        )
    seas = _err(season, "s_seasonal", "n_seasonal")
    naive = _err(1, "s_naive", "n_naive")
    out = seas.join(naive, "g")
    mae_s = F.col("s_seasonal").cast("double") / F.col("n_seasonal")
    mae_n = F.col("s_naive").cast("double") / F.col("n_naive")
    mase = F.when(F.col("s_naive") == 0, F.lit(0.0)).otherwise(
        (
            F.col("s_seasonal").cast("double") * F.col("n_naive").cast("double")
        )
        / (
            F.col("s_naive").cast("double") * F.col("n_seasonal").cast("double")
        )
    )
    return out.select(
        F.col("g").alias(group_col),
        "n_seasonal", "n_naive",
        (mae_s / 100.0).alias("mae_seasonal"),
        (mae_n / 100.0).alias("mae_naive"),
        mase.alias("mase"),
    )


def pinball_eval(
    events: DataFrame,
    group_col: str = "event_type",
    train_days: int = 15,
    q_num: int = 9,
) -> DataFrame:
    """Pinball (quantile) loss of a constant q=0.9 daily-revenue
    forecast per group: fit the train-window's empirical p90 (lower
    discrete quantile — integer-exact, no interpolation), score the
    held-out days with the asymmetric pinball loss that quantile
    forecasts are graded on (the eval face of :func:`daily_envelope`,
    which SETS such envelopes but never scores them).

    Integer protocol: the forecast is an exact cents value chosen by
    rank (smallest y with row_number ≥ ceil(q·n) over the train days);
    per-day loss ×10 is integer — ``9·(y−f)`` when y ≥ f else
    ``1·(f−y)`` — summed BIGINT; the mean divides once.

    Output: (group, n_train, n_test, forecast, mean_pinball).
    Scale shape: everything after the day-grain contraction runs on the
    bounded calendar grid (one rank window + one aggregate per group).
    """
    daily = _daily_cents(events, group_col)
    lo = daily.agg(F.min("d").alias("lo"))
    dd = daily.crossJoin(F.broadcast(lo)).withColumn(
        "is_train", F.datediff("d", "lo") < train_days
    )
    train = dd.filter("is_train")
    wv = Window.partitionBy("g").orderBy("y")
    ranked = train.withColumn("rn", F.row_number().over(wv)).join(
        train.groupBy("g").agg(F.count(F.lit(1)).alias("n_train")), "g"
    )
    fc = ranked.filter(
        F.col("rn") == F.ceil(F.col("n_train") * q_num / 10.0).cast("int")
    ).select("g", F.col("n_train").cast("bigint").alias("n_train"), F.col("y").alias("f"))
    test = dd.filter(~F.col("is_train"))
    loss = (
        test.join(fc, "g")
        .withColumn(
            "loss10",
            F.when(
                F.col("y") >= F.col("f"),
                F.lit(q_num) * (F.col("y") - F.col("f")),
            ).otherwise(F.lit(10 - q_num) * (F.col("f") - F.col("y"))),
        )
        .groupBy("g", "n_train", "f")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum("loss10").cast("bigint").alias("s10"),
        )
    )
    return loss.select(
        F.col("g").alias(group_col),
        "n_train", "n_test",
        (F.col("f").cast("double") / 100.0).alias("forecast"),
        (
            F.col("s10").cast("double")
            / (10.0 * F.col("n_test").cast("double") * 100.0)
        ).alias("mean_pinball"),
    )


def holt_linear(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Holt's linear (level + trend) exponential smoothing per group
    with α = β = ½ — the two-parameter upgrade of :func:`ewma_daily`
    that a trending series needs (EWMA lags a ramp forever; Holt's
    trend state closes the gap), surfaced as the final level/trend and
    the 7-day-ahead forecast every capacity dashboard quotes.

    Determinism protocol: the recurrence is inherently sequential, so
    it runs as a DAY-ORDERED ``aggregate()`` fold over the collected
    day-grain array (the logrank cross-day device): every step is the
    same pinned IEEE tree — ``l' = 0.5·(y + (l + b))``,
    ``b' = 0.5·((l' − l) + b)`` — evaluated in the same order by any
    engine, so the float states are bit-identical cross-engine without
    integer scaling (which would overflow: the exact-rational form
    carries 4^t denominators).

    Scale shape: the fact table contracts map-side to (group, day)
    cents; each group's fold is O(days) IN-ROW work over a
    calendar-bounded array — no shuffle after the contraction.
    Output: (group, n_days, level, trend, forecast7).
    """
    daily = _daily_cents(events, group_col)
    arr = daily.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct(F.col("d"), F.col("y")))
        ).alias("ys"),
    )
    fold = F.aggregate(
        F.col("ys"),
        F.struct(
            F.lit(0.0).alias("l"),
            F.lit(0.0).alias("b"),
            F.lit(True).alias("first"),
        ),
        lambda acc, s: F.when(
            acc["first"],
            F.struct(
                s["y"].cast("double").alias("l"),
                F.lit(0.0).alias("b"),
                F.lit(False).alias("first"),
            ),
        ).otherwise(
            F.struct(
                (
                    F.lit(0.5)
                    * (s["y"].cast("double") + (acc["l"] + acc["b"]))
                ).alias("l"),
                (
                    F.lit(0.5)
                    * (
                        (
                            F.lit(0.5)
                            * (s["y"].cast("double") + (acc["l"] + acc["b"]))
                            - acc["l"]
                        )
                        + acc["b"]
                    )
                ).alias("b"),
                F.lit(False).alias("first"),
            )
        ),
    )
    out = arr.withColumn("st", fold)
    return out.select(
        F.col("g").alias(group_col),
        "n_days",
        (F.col("st.l") / 100.0).alias("level"),
        (F.col("st.b") / 100.0).alias("trend"),
        ((F.col("st.l") + F.lit(7.0) * F.col("st.b")) / 100.0).alias(
            "forecast7"
        ),
    )


def kruskal_wallis(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Kruskal–Wallis H test across ALL groups at once — the k-group
    extension of the pairwise Mann–Whitney drift gate: "is at least one
    event type's daily-revenue distribution shifted?", answered with
    one rank pass instead of k² pairwise MWUs.  Runs on the day-grain
    revenue series (exact cents), the same contraction every rank test
    here shares.

    Exactness protocol: tie-aware midranks over the POOLED series are
    ``.5``-granular, so DOUBLED ranks are exact BIGINTs (2·midrank =
    2·min_rank + ties − 1).  Per-group doubled rank sums R2_j and the
    tie-correction sum T = Σ(t³−t) are exact integers; the only
    rational reduction — S = Σ_j (R2_j/2)²/n_j, a sum of k group
    fractions — folds over the GROUP-SORTED array (the logrank/Holt
    cross-group device), so every engine adds the same doubles in the
    same order.  H = 12·S/(N(N+1)) − 3(N+1) and the tie-adjusted
    H/C (C = 1 − T/(N³−N)) are then single pinned IEEE trees.

    Scale shape: day-grain contraction (map-side), ONE global rank
    window over ≤ (groups × calendar days) rows, one k-row fold.
    Output: one row (n_rows, n_groups, h, h_tie_adj).
    """
    daily = _daily_cents(events, group_col)
    wv = Window.orderBy("y")
    ranked = daily.withColumn(
        "r2",
        (
            2 * F.rank().over(wv)
            + F.count(F.lit(1)).over(Window.partitionBy("y"))
            - 1
        ).cast("bigint"),
    )
    per_g = ranked.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("nj"),
        F.sum("r2").cast("bigint").alias("rj2"),
    )
    ties = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("bigint")
            .alias("tie_sum"),
            F.sum("t").cast("bigint").alias("n_rows"),
        )
    )
    folded = per_g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.array_sort(
            F.collect_list(F.struct(F.col("g"), F.col("rj2"), F.col("nj")))
        ).alias("gs"),
    ).withColumn(
        "s",
        F.aggregate(
            F.col("gs"),
            F.lit(0.0),
            lambda acc, x: acc
            + (
                (x["rj2"].cast("double") * F.lit(0.5))
                * (x["rj2"].cast("double") * F.lit(0.5))
            )
            / x["nj"].cast("double"),
        ),
    )
    out = folded.crossJoin(ties)  # one row × one row
    n = F.col("n_rows").cast("double")
    h = (
        F.lit(12.0) * F.col("s") / (n * (n + F.lit(1.0)))
        - F.lit(3.0) * (n + F.lit(1.0))
    )
    c = F.lit(1.0) - F.col("tie_sum").cast("double") / (
        n * n * n - n
    )
    return out.select(
        "n_rows",
        "n_groups",
        h.alias("h"),
        F.when((F.col("n_rows") > 1) & (c > 0.0), h / c)
        .otherwise(F.lit(0.0))
        .alias("h_tie_adj"),
        # empty-input stability (ADVICE r06): the global agg emits one
        # null/zero row on empty input while the recursive-CTE oracle
        # emits zero rows — return zero rows, like every other gate
    ).filter((F.col("n_groups") > 0) & F.col("n_rows").isNotNull())


def anova_f(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """One-way ANOVA F on the day-grain revenue series across groups —
    the parametric sibling of :func:`kruskal_wallis` (means instead of
    ranks): between-group sum of squares over within-group, each from
    exact-integer sufficient statistics.

    Exactness protocol: Σy and Σy² per group are exact BIGINTs (cents);
    the one rational reduction — T = Σ_j Z_j²/n_j — folds over the
    group-sorted array like the KW statistic; SSB = T − Z²/N and
    SSW = Q − T are then pinned IEEE trees (Z = global Σy, Q = global
    Σy², both exact), and F = (SSB/(k−1))/(SSW/(N−k)).

    Scale shape: one day-grain contraction, one k-row fold, one row
    out: (n_rows, n_groups, ssb, ssw, f_stat).
    """
    daily = _daily_cents(events, group_col)
    per_g = daily.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("nj"),
        F.sum("y").cast("bigint").alias("zj"),
    )
    # Σy is BIGINT-safe (daily cents × calendar days), but Σy² is not:
    # a $10M-revenue day is ~1e9 cents → y² ~1e18, and a season of such
    # days overflows 2^63.  The squares therefore accumulate as exact
    # DECIMAL(38,0) (the value_outliers moment device; DuckDB twin uses
    # HUGEINT) — identical doubles after the final cast at any scale
    # that fits 38 digits.
    yd = F.col("y").cast("decimal(19,0)")
    glob = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("y").cast("bigint").alias("z"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("q"),
    )
    folded = per_g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.array_sort(
            F.collect_list(F.struct(F.col("g"), F.col("zj"), F.col("nj")))
        ).alias("gs"),
    ).withColumn(
        "t",
        F.aggregate(
            F.col("gs"),
            F.lit(0.0),
            lambda acc, x: acc
            + (x["zj"].cast("double") * x["zj"].cast("double"))
            / x["nj"].cast("double"),
        ),
    )
    out = folded.crossJoin(glob)  # one row × one row
    n = F.col("n_rows").cast("double")
    k = F.col("n_groups").cast("double")
    ssb = F.col("t") - F.col("z").cast("double") * F.col("z").cast(
        "double"
    ) / n
    ssw = F.col("q").cast("double") - F.col("t")
    f_stat = F.when(
        (F.col("n_groups") > 1)
        & (F.col("n_rows") > F.col("n_groups"))
        & (ssw > 0.0),
        (ssb / (k - F.lit(1.0))) / (ssw / (n - k)),
    ).otherwise(F.lit(0.0))
    return out.select(
        "n_rows", "n_groups", ssb.alias("ssb"), ssw.alias("ssw"),
        f_stat.alias("f_stat"),
        # empty-input stability (ADVICE r06): zero rows, not one null row
    ).filter((F.col("n_groups") > 0) & F.col("n_rows").isNotNull())


def ccf_daily(
    events: DataFrame, max_lag: int = 3, group_col: str = "event_type"
) -> DataFrame:
    """Cross-correlation function between the daily revenue series of
    the two lexicographically-first groups, at lags 0..max_lag — "do
    views on day t predict purchases on day t+k?", the lead/lag
    diagnostic behind every marketing-mix and capacity model, and the
    cross-series completion of the ACF (same protocol, two series).

    Per lag k the statistic is the Pearson correlation of the
    OVERLAPPED pairs (x_t, y_{t+k}): all five sufficient statistics
    (n, Σx, Σy, Σx², Σy², Σxy) are exact BIGINTs from the cents-grain
    join on ``d_y = d_x + k``, and r is one pinned tree per lag row —
    no cross-row double sums anywhere.

    Scale shape: day-grain contraction, one self-join per lag on the
    (calendar-bounded) day grid — the join explodes to ≤ max_lag+1 ×
    n_days rows total.  Output: (lag, n_overlap, r); zero rows when
    fewer than two groups are present (ADVICE r06: a single group
    would otherwise report its own autocorrelation under a
    cross-correlation contract).
    """
    daily = _daily_cents(events, group_col)
    gs = daily.select("g").distinct().orderBy("g").limit(2)
    # single-group degenerate guard (ADVICE r06): with one event type
    # present gx == gy would silently report the series' AUTOcorrelation
    # under a cross-correlation contract — emit zero rows instead
    pair = gs.agg(
        F.min("g").alias("gx"), F.max("g").alias("gy")
    ).filter(F.col("gx") != F.col("gy"))
    x = daily.join(F.broadcast(pair), daily.g == pair.gx).select(
        F.col("d").alias("dx"), F.col("y").alias("x")
    )
    y = daily.join(F.broadcast(pair), daily.g == pair.gy).select(
        F.col("d").alias("dy"), F.col("y").alias("yv")
    )
    lags = events.sparkSession.range(0, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    joined = (
        x.crossJoin(F.broadcast(lags))
        .join(y, F.date_add(F.col("dx"), F.col("lag")) == F.col("dy"))
    )
    # first moments are BIGINT-safe; the products are not at large SF
    # (see anova_f) — they accumulate as exact DECIMAL(38,0)
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("yv").cast("decimal(19,0)")
    agg = joined.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("yv").cast("bigint").alias("sy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
    )
    n = F.col("n_overlap").cast("double")
    cov = n * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    vx = n * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    vy = n * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double")
    r = F.when((vx <= 0.0) | (vy <= 0.0), F.lit(0.0)).otherwise(
        cov / F.sqrt(vx * vy)
    )
    return agg.select(
        F.col("lag").cast("int").alias("lag"), "n_overlap", r.alias("r")
    )


def croston(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Croston's method per group — THE forecasting baseline for
    INTERMITTENT demand (series with zero-demand days, where EWMA/Holt
    systematically under-forecast): separate exponential smoothing of
    the nonzero demand sizes (z) and of the inter-demand intervals (p),
    forecast = z/p, both at α = ½.

    The day grid is gap-filled per group (``sequence`` over the
    group's [min, max] day — calendar-bounded), so zero-demand days
    genuinely advance the interval counter.  Determinism: the
    recurrence is a DAY-ORDERED in-row ``aggregate()`` fold (the Holt
    device) with state (z, p, q, started): demand day → z' = ½(y + z),
    p' = ½(q + p), q' = 1; zero day → q' = q + 1.  Every step is the
    same pinned IEEE tree, so the float states are bit-identical
    cross-engine.

    Scale shape: day-grain contraction, per-group calendar-bounded
    gap-fill + one in-row fold — no shuffle after the contraction.
    Output: (group, n_days, n_demand_days, z_hat, p_hat, forecast) in
    currency units (z folds in cents, surfaced /100).
    """
    return croston_from_daily(_daily_cents(events, group_col), group_col)


def croston_from_daily(
    daily: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """:func:`croston` from an already-contracted ``(g, d, y)``
    day-grain frame — the entry point the STREAMING state sink uses
    (streaming/sinks.daily_cents_state_sink maintains exactly this
    frame), so the live forecast is bit-identical to the batch one by
    construction: same fold over the same calendar-bounded state."""
    grid = (
        daily.groupBy("g")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "g",
            F.explode(
                F.sequence(F.col("d0"), F.col("d1"))
            ).alias("d"),
        )
    )
    dense = grid.join(daily, ["g", "d"], "left").select(
        "g", "d", F.coalesce("y", F.lit(0)).cast("bigint").alias("y")
    )
    arr = dense.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum((F.col("y") > 0).cast("bigint")).alias("n_demand_days"),
        F.array_sort(
            F.collect_list(F.struct(F.col("d"), F.col("y")))
        ).alias("ys"),
    )
    fold = F.aggregate(
        F.col("ys"),
        F.struct(
            F.lit(0.0).alias("z"),
            F.lit(0.0).alias("p"),
            F.lit(0.0).alias("q"),
            F.lit(False).alias("started"),
        ),
        lambda acc, s: F.when(
            s["y"] <= 0,
            F.struct(
                acc["z"].alias("z"),
                acc["p"].alias("p"),
                (acc["q"] + F.lit(1.0)).alias("q"),
                acc["started"].alias("started"),
            ),
        )
        .when(
            ~acc["started"],
            F.struct(
                s["y"].cast("double").alias("z"),
                F.lit(1.0).alias("p"),
                F.lit(1.0).alias("q"),
                F.lit(True).alias("started"),
            ),
        )
        .otherwise(
            F.struct(
                (
                    F.lit(0.5) * (s["y"].cast("double") + acc["z"])
                ).alias("z"),
                (
                    F.lit(0.5) * (acc["q"] + acc["p"])
                ).alias("p"),
                F.lit(1.0).alias("q"),
                F.lit(True).alias("started"),
            )
        ),
    )
    out = arr.withColumn("st", fold)
    return out.select(
        F.col("g").alias(group_col),
        "n_days",
        "n_demand_days",
        (F.col("st.z") / 100.0).alias("z_hat"),
        F.col("st.p").alias("p_hat"),
        F.when(
            F.col("st.p") > 0.0, (F.col("st.z") / F.col("st.p")) / 100.0
        )
        .otherwise(F.lit(0.0))
        .alias("forecast"),
    )


def holt_winters(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Additive Holt–Winters (level + trend + weekly seasonality) per
    group with α = 0.3, β = 0.05, γ = 0.4 (textbook defaults — an
    α = ½ level chases the raw signal and fights the seasonal
    register) — the seasonal completion of the smoothing
    family (:func:`ewma_daily` → :func:`holt_linear` → here): the
    baseline every weekly-cycled ops series (traffic, orders, revenue)
    actually needs, where Holt alone chases the weekend dip as trend.

    Recurrence (T.37 additive form), on the GAP-FILLED day grid so the
    7-slot seasonal register stays calendar-aligned:
    ``l' = α(y − s_i) + (1−α)(l + b); b' = β(l' − l) + (1−β)b;
    s_i' = γ(y − l') + (1−γ)s_i`` with ``i = day_index mod 7``; init
    l = y₀, b = 0, s = 0⃗ (deterministic cold start — γ learns the
    profile within two cycles).

    Determinism protocol: a DAY-ORDERED in-row ``aggregate()`` fold
    (the Holt/Croston device) whose state carries (l, b, s[7], i);
    every step is the same pinned IEEE tree, so the float states are
    bit-identical cross-engine (the oracle carries s0..s6 as recursive
    CTE columns).

    Scale shape: day-grain contraction, per-group calendar-bounded
    gap-fill, one in-row fold — no shuffle after the contraction.
    Output: (group, n_days, level, trend, s_next, forecast1) — the
    one-day-ahead forecast l + b + s[(i) mod 7], all /100 to currency.
    """
    daily = _daily_cents(events, group_col)
    grid = (
        daily.groupBy("g")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "g",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("d"),
        )
    )
    dense = grid.join(daily, ["g", "d"], "left").select(
        "g", "d", F.coalesce("y", F.lit(0)).cast("bigint").alias("y")
    )
    arr = dense.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct(F.col("d"), F.col("y")))
        ).alias("ys"),
    )
    zeros7 = F.array(*[F.lit(0.0) for _ in range(7)])

    def step(acc, s):
        y = s["y"].cast("double")
        si = F.element_at(acc["s"], F.pmod(acc["i"], F.lit(7)) + 1)
        l_new = F.when(
            acc["i"] == 0, y
        ).otherwise(
            F.lit(0.3) * (y - si) + F.lit(0.7) * (acc["l"] + acc["b"])
        )
        b_new = F.when(acc["i"] == 0, F.lit(0.0)).otherwise(
            F.lit(0.05) * (l_new - acc["l"]) + F.lit(0.95) * acc["b"]
        )
        s_upd = F.when(acc["i"] == 0, F.lit(0.4) * (y - l_new)).otherwise(
            F.lit(0.4) * (y - l_new) + F.lit(0.6) * si
        )
        s_new = F.transform(
            acc["s"],
            lambda v, j: F.when(
                j == F.pmod(acc["i"], F.lit(7)), s_upd
            ).otherwise(v),
        )
        return F.struct(
            l_new.alias("l"),
            b_new.alias("b"),
            s_new.alias("s"),
            (acc["i"] + 1).alias("i"),
        )

    fold = F.aggregate(
        F.col("ys"),
        F.struct(
            F.lit(0.0).alias("l"),
            F.lit(0.0).alias("b"),
            zeros7.alias("s"),
            F.lit(0).alias("i"),
        ),
        step,
    )
    out = arr.withColumn("st", fold)
    s_next = F.element_at(
        F.col("st.s"), F.pmod(F.col("st.i"), F.lit(7)) + 1
    )
    return out.select(
        F.col("g").alias(group_col),
        "n_days",
        (F.col("st.l") / 100.0).alias("level"),
        (F.col("st.b") / 100.0).alias("trend"),
        (s_next / 100.0).alias("s_next"),
        ((F.col("st.l") + F.col("st.b") + s_next) / 100.0).alias(
            "forecast1"
        ),
    )


def durbin_watson(events: DataFrame) -> DataFrame:
    """Durbin–Watson statistic of the GLOBAL daily-revenue series —
    the first-line serial-correlation screen (DW ≈ 2 means white
    residuals; → 0 strong positive autocorrelation; → 4 negative):
    ``DW = Σ(y_t − y_{t−1})² / Σ(y_t − ȳ)²`` over the day-ordered
    series.  Complements :func:`acf_lags` (per-lag correlogram) with
    the single standard regression-diagnostic number.

    Exactness: cents are exact BIGINTs; successive differences come
    from one LAG window over the day order; Σd² and Σy² accumulate as
    exact DECIMAL(38,0) (the anova_f second-moment device), and DW is
    the pinned tree ``Σd² / (Σy² − (Σy)²/n)`` — two divisions, no
    cross-row double sums.

    Scale shape: one day-grain contraction (map-side), one window over
    ≤ #calendar-days rows, one global fold.  Output: one row
    (n_days, dw) — zero rows on an empty or 1-day series.
    """
    daily = (
        events.select(
            F.to_date("ts").alias("d"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("y"))
    )
    w = Window.orderBy("d")
    diffed = daily.withColumn("y_prev", F.lag("y").over(w))
    yd = F.col("y").cast("decimal(19,0)")
    dd = (F.col("y") - F.col("y_prev")).cast("decimal(19,0)")
    agg = diffed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("y").cast("bigint").alias("s"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("q"),
        F.sum(dd * dd).cast("decimal(38,0)").alias("sd2"),
    )
    n = F.col("n_days").cast("double")
    den = F.col("q").cast("double") - F.col("s").cast("double") * F.col(
        "s"
    ).cast("double") / n
    return agg.select(
        "n_days",
        F.when(
            (F.col("n_days") > 1) & (den > 0.0),
            F.col("sd2").cast("double") / den,
        )
        .otherwise(F.lit(0.0))
        .alias("dw"),
    ).filter((F.col("n_days") > 1) & F.col("n_days").isNotNull())


def pettitt_test(events: DataFrame) -> DataFrame:
    """Pettitt change-point test on the GLOBAL daily-revenue series —
    the rank-based (distribution-free) single-change-point locator:
    ``U_t = Σ_{i≤t} Σ_{j>t} sgn(y_i − y_j)``, change point at
    ``argmax |U_t|``.  The nonparametric sibling of
    :func:`cusum_changepoint` (which tracks mean shifts in value
    units and is outlier-sensitive where Pettitt is not).

    Exactness: with tie-aware midranks, ``Σ_j sgn(y_i − y_j) =
    2·R_i − (n+1)`` (the cross-terms over i≤t cancel by antisymmetry),
    so ``U_t = Σ_{i≤t} 2·R_i − t(n+1)`` — and DOUBLED midranks
    ``D_i = 2·rank + ties − 1`` are exact BIGINTs, making every U_t an
    exact integer from one cumulative-sum window.  K = max |U_t| over
    t < n, first day wins ties (deterministic ordering).

    Scale shape: day-grain contraction, one rank window + one
    cumulative window over ≤ #calendar-days rows, one top-1 reduce.
    Output: one row (n_days, k_stat, cp_day, u_at_cp).
    """
    daily = (
        events.select(
            F.to_date("ts").alias("d"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("y"))
    )
    wv = Window.orderBy("y")
    ranked = daily.withColumn(
        "d2r",
        (
            2 * F.rank().over(wv)
            + F.count(F.lit(1)).over(Window.partitionBy("y"))
            - 1
        ).cast("bigint"),
    )
    wd = Window.orderBy("d")
    cum = ranked.withColumn(
        "t", F.row_number().over(wd).cast("bigint")
    ).withColumn(
        "cum_d2r", F.sum("d2r").over(wd).cast("bigint")
    )
    n_row = cum.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    # U_t from doubled ranks: Σ D_i = 2·Σ R_i, so U_t = cum − t(n+1)
    u = cum.crossJoin(F.broadcast(n_row)).select(
        "n_days",
        "d",
        "t",
        (F.col("cum_d2r") - F.col("t") * (F.col("n_days") + 1))
        .cast("bigint")
        .alias("u_t"),
    ).filter(F.col("t") < F.col("n_days"))
    return (
        u.orderBy(F.abs(F.col("u_t")).desc(), F.col("d"))
        .limit(1)
        .select(
            "n_days",
            F.abs(F.col("u_t")).cast("bigint").alias("k_stat"),
            # calendar string: engines disagree on DATE vs TIMESTAMP
            # surfacing (the cusum_changepoint convention)
            F.date_format("d", "yyyy-MM-dd").alias("cp_day"),
            F.col("u_t").alias("u_at_cp"),
        )
    )


def tsb_forecast(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Teunter–Syntetos–Babai (TSB) intermittent-demand forecast per
    group — the modern successor to :func:`croston` that updates the
    demand PROBABILITY every period (croston's interval estimate only
    updates on demand days, so it never decays on obsolete items):
    demand day → ``p' = p + α(1−p)``, ``z' = z + β(y−z)``; zero day →
    ``p' = (1−α)p``; forecast = p·z.  α = ¼, β = ½ (dyadic, so each
    step is a short pinned IEEE tree).

    Same calendar-bounded gap-filled day grid and DAY-ORDERED in-row
    ``aggregate()`` fold as croston (state (p, z) seeded from the
    first demand day: p = 1, z = y₀); the float states are
    bit-identical cross-engine by the fold-order protocol.

    Scale shape: day-grain contraction, per-group gap-fill + one
    in-row fold — no shuffle after the contraction.  Output:
    (group, n_days, n_demand_days, p_hat, z_hat, forecast) in currency
    units (z folds in cents, surfaced /100).
    """
    return tsb_from_daily(_daily_cents(events, group_col), group_col)


def tsb_from_daily(
    daily: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """:func:`tsb_forecast` from an already-contracted ``(g, d, y)``
    day-grain frame — the entry point the streaming state sink uses
    (streaming/sinks.daily_cents_state_sink maintains exactly this
    frame), so the live TSB forecast is bit-identical to the batch one
    by construction (the croston_from_daily device)."""
    grid = (
        daily.groupBy("g")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "g",
            F.explode(
                F.expr("sequence(d0, d1, interval 1 day)")
            ).alias("d"),
        )
    )
    filled = (
        grid.join(daily, ["g", "d"], "left")
        .select("g", "d", F.coalesce("y", F.lit(0)).alias("y"))
    )
    arr = filled.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.when(F.col("y") != 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_demand_days"),
        F.array_sort(
            F.collect_list(F.struct(F.col("d"), F.col("y")))
        ).alias("ds"),
    )
    # state (p, z, started): demand → p' = p + (1-p)/4, z' = (y+z)/2;
    # zero → p' = 3p/4; the first demand day seeds (1, y)
    step = lambda acc, e: F.when(  # noqa: E731
        e["y"] != 0,
        F.when(
            acc["started"] == 0,
            F.struct(
                F.lit(1.0).alias("p"),
                e["y"].cast("double").alias("z"),
                F.lit(1).alias("started"),
            ),
        ).otherwise(
            F.struct(
                (acc["p"] + (F.lit(1.0) - acc["p"]) * F.lit(0.25)).alias(
                    "p"
                ),
                ((e["y"].cast("double") + acc["z"]) * F.lit(0.5)).alias(
                    "z"
                ),
                F.lit(1).alias("started"),
            ),
        ),
    ).otherwise(
        F.when(
            acc["started"] == 0, acc
        ).otherwise(
            F.struct(
                (acc["p"] * F.lit(0.75)).alias("p"),
                acc["z"].alias("z"),
                F.lit(1).alias("started"),
            )
        )
    )
    fold = F.aggregate(
        F.col("ds"),
        F.struct(
            F.lit(0.0).alias("p"), F.lit(0.0).alias("z"),
            F.lit(0).alias("started"),
        ),
        step,
    )
    out = arr.withColumn("st", fold).filter(F.col("st.started") == 1)
    return out.select(
        F.col("g").alias(group_col),
        "n_days",
        "n_demand_days",
        F.col("st.p").alias("p_hat"),
        (F.col("st.z") / 100.0).alias("z_hat"),
        (F.col("st.p") * F.col("st.z") / 100.0).alias("forecast"),
    )


def page_hinkley(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Page–Hinkley drift statistic per group — the sequential
    mean-shift monitor streaming systems run per metric: maintain the
    running mean x̄_t and the cumulative deviation
    ``m_t = Σ_{i≤t} (x_i − x̄_i)``; the alarm statistic is
    ``PH = m_T − min_t m_t`` (large when the recent mean rose above
    history; the mirrored ``max_t m_t − m_T`` catches drops).  The
    sequential sibling of :func:`cusum_changepoint` (which needs the
    global mean up front; PH is one-pass).

    Determinism: the recurrence is a DAY-ORDERED in-row
    ``aggregate()`` fold with state (n, sum, m, mn, mx) over the
    day-grain cents series; x̄_t = sum/n is one division per step and
    every step is the same pinned IEEE tree — bit-identical
    cross-engine (the croston/Holt device).

    Scale shape: day-grain contraction + one in-row fold per group.
    Output: (group, n_days, ph_up, ph_down, m_final) in cents units.
    """
    return page_hinkley_from_daily(_daily_cents(events, group_col), group_col)


def page_hinkley_from_daily(
    daily: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """:func:`page_hinkley` from an already-contracted ``(g, d, y)``
    day-grain frame — the entry point the streaming state sink uses,
    making the live drift alarm bit-identical to the batch one (the
    croston_from_daily device)."""
    arr = daily.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.array_sort(
            F.collect_list(F.struct(F.col("d"), F.col("y")))
        ).alias("ds"),
    )
    step = lambda acc, e: F.struct(  # noqa: E731
        (acc["n"] + F.lit(1.0)).alias("n"),
        (acc["s"] + e["y"].cast("double")).alias("s"),
        (
            acc["m"]
            + (
                e["y"].cast("double")
                - (acc["s"] + e["y"].cast("double"))
                / (acc["n"] + F.lit(1.0))
            )
        ).alias("m"),
        F.least(
            acc["mn"],
            acc["m"]
            + (
                e["y"].cast("double")
                - (acc["s"] + e["y"].cast("double"))
                / (acc["n"] + F.lit(1.0))
            ),
        ).alias("mn"),
        F.greatest(
            acc["mx"],
            acc["m"]
            + (
                e["y"].cast("double")
                - (acc["s"] + e["y"].cast("double"))
                / (acc["n"] + F.lit(1.0))
            ),
        ).alias("mx"),
    )
    fold = F.aggregate(
        F.col("ds"),
        F.struct(
            F.lit(0.0).alias("n"), F.lit(0.0).alias("s"),
            F.lit(0.0).alias("m"), F.lit(0.0).alias("mn"),
            F.lit(0.0).alias("mx"),
        ),
        step,
    )
    out = arr.withColumn("st", fold)
    return out.select(
        F.col("g").alias(group_col),
        "n_days",
        (F.col("st.m") - F.col("st.mn")).alias("ph_up"),
        (F.col("st.mx") - F.col("st.m")).alias("ph_down"),
        F.col("st.m").alias("m_final"),
    )


def friedman_test(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Friedman test across groups BLOCKED by weekday — the
    repeated-measures sibling of :func:`kruskal_wallis`: within each
    weekday block, rank the groups by their block total; a group that
    consistently ranks high across all 7 blocks is a real effect even
    when pooled ranks (KW) would drown it in weekday seasonality.
    ``χ²_F = 12/(b·k·(k+1)) · Σ_j R_j² − 3·b·(k+1)`` with the standard
    tie-adjusted denominator left out (midranks keep the statistic
    conservative; same stance as the KW tie adjustment being reported
    separately there).

    Exactness: block totals are exact cents; within-block DOUBLED
    midranks are exact BIGINTs; per-group doubled rank sums R2_j are
    exact; the one rational reduction Σ (R2_j/2)² folds over the
    group-sorted array (the KW device), then χ²_F is one pinned tree.
    Only (block, group) cells present in the data rank — a group
    absent from a block simply isn't in that block's ranking (b = 7
    calendar blocks, k from the data).

    Scale shape: one (weekday × group) contraction, one rank window
    per 7-row block, one k-row fold.  Output: one row
    (n_blocks, n_groups, chi2_f) — zero rows on empty input.
    """
    cell = (
        events.select(
            F.col(group_col).alias("g"),
            F.dayofweek(F.to_date("ts")).alias("blk"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("g", "blk")
        .agg(F.sum("cents").alias("y"))
    )
    wb = Window.partitionBy("blk").orderBy("y")
    ranked = cell.withColumn(
        "d2r",
        (
            2 * F.rank().over(wb)
            + F.count(F.lit(1)).over(Window.partitionBy("blk", "y"))
            - 1
        ).cast("bigint"),
    )
    per_g = ranked.groupBy("g").agg(
        F.sum("d2r").cast("bigint").alias("r2j"),
        F.count(F.lit(1)).cast("bigint").alias("bj"),
    )
    blocks = ranked.agg(
        F.countDistinct("blk").cast("bigint").alias("n_blocks")
    )
    folded = per_g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.array_sort(
            F.collect_list(F.struct(F.col("g"), F.col("r2j")))
        ).alias("gs"),
    ).withColumn(
        "srq",
        F.aggregate(
            F.col("gs"),
            F.lit(0.0),
            lambda acc, x: acc
            + (x["r2j"].cast("double") * F.lit(0.5))
            * (x["r2j"].cast("double") * F.lit(0.5)),
        ),
    )
    out = folded.crossJoin(blocks)  # one row × one row
    b = F.col("n_blocks").cast("double")
    k = F.col("n_groups").cast("double")
    chi2 = (
        F.lit(12.0) * F.col("srq") / (b * k * (k + F.lit(1.0)))
        - F.lit(3.0) * b * (k + F.lit(1.0))
    )
    return out.select(
        "n_blocks",
        "n_groups",
        F.when(F.col("n_groups") > 1, chi2)
        .otherwise(F.lit(0.0))
        .alias("chi2_f"),
    ).filter((F.col("n_groups") > 0) & F.col("n_blocks").isNotNull())


def ljung_box(events: DataFrame, max_lag: int = 7) -> DataFrame:
    """Ljung–Box portmanteau statistic per group — the ONE-NUMBER
    whiteness test over the first ``max_lag`` autocorrelations
    (:func:`acf_lags` shows the correlogram; Q summarizes it the way
    forecasting residual checks consume it):
    ``Q = n(n+2) · Σ_{k≤K} r_k² / (n−k)``.

    Composition: the r_k come verbatim from the :func:`acf_lags`
    machinery (exact DECIMAL moments, one pinned division per lag);
    the cross-lag sum folds LAG-ORDERED over the ≤K-row per-group
    array (the logrank/KW device), so the doubles add in the same
    order in every engine.  Lags with no overlapped pairs or a
    zero-variance series contribute nothing on either side.

    Output: (event_type, n_days, k_lags, q_lb).
    """
    acf = acf_lags(events, max_lag=max_lag).filter(
        F.col("acf").isNotNull()
    )
    folded = acf.groupBy("event_type").agg(
        F.max("n_days").cast("bigint").alias("n_days"),
        F.count(F.lit(1)).cast("bigint").alias("k_lags"),
        F.array_sort(
            F.collect_list(F.struct(F.col("lag"), F.col("acf")))
        ).alias("rs"),
    )
    n = F.col("n_days").cast("double")
    s = F.aggregate(
        F.col("rs"),
        F.lit(0.0),
        lambda acc, e: acc
        + (e["acf"] * e["acf"]) / (n - e["lag"].cast("double")),
    )
    return folded.select(
        "event_type",
        "n_days",
        "k_lags",
        (n * (n + F.lit(2.0)) * s).alias("q_lb"),
    )


def seasonal_mann_kendall(
    events: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """Seasonal Mann–Kendall trend test per group — the Hirsch–Slack
    deseasonalized form of :func:`mann_kendall`: sign pairs are only
    compared WITHIN the same weekday subseries (Monday vs Monday …),
    so a strong weekly cycle can neither fake nor mask a monotone
    drift; ``S = Σ_w S_w`` and ``Var = Σ_w Var_w`` over the 7
    subseries, z with the same continuity correction.

    Exactness: identical integer protocol to mann_kendall per
    (group, weekday) — S_w and the ×18 tie-corrected variance are
    exact BIGINTs — summed across weekdays (still exact), with the
    one IEEE-exact sqrt in z.

    Scale shape: the same Θ(days²)/7-per-weekday calendar-grain
    envelope, never event grain.  Output:
    (group, n_days, s_stat, var18, z).
    """
    daily = (
        events.select(
            F.col(group_col).alias("g"),
            F.to_date("ts").alias("d"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("g", "d")
        .agg(F.sum("cents").alias("y"))
        .withColumn("wd", F.dayofweek("d"))
    )
    a = daily.select(
        "g", "wd", F.col("d").alias("di"), F.col("y").alias("yi")
    )
    b = daily.select(
        F.col("g").alias("g2"), F.col("wd").alias("wd2"),
        F.col("d").alias("dj"), F.col("y").alias("yj"),
    )
    s = (
        a.join(
            b,
            (F.col("g") == F.col("g2"))
            & (F.col("wd") == F.col("wd2"))
            & (F.col("di") < F.col("dj")),
        )
        .groupBy("g")
        .agg(
            F.sum(
                F.signum((F.col("yj") - F.col("yi")).cast("double"))
                .cast("bigint")
            ).cast("bigint").alias("s_stat")
        )
    )
    per_wd = daily.groupBy("g", "wd").agg(
        F.count(F.lit(1)).cast("bigint").alias("nw")
    )
    ties = (
        daily.groupBy("g", "wd", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("g", "wd")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("bigint").alias("tie_term")
        )
    )
    var_wd = per_wd.join(ties, ["g", "wd"], "left").select(
        "g",
        (
            F.col("nw") * (F.col("nw") - 1) * (2 * F.col("nw") + 5)
            - F.coalesce("tie_term", F.lit(0))
        ).cast("bigint").alias("v18w"),
        F.col("nw"),
    )
    base = (
        var_wd.groupBy("g")
        .agg(
            F.sum("nw").cast("bigint").alias("n_days"),
            F.sum("v18w").cast("bigint").alias("var18"),
        )
        .join(s, "g", "left")
        .select(
            "g",
            "n_days",
            F.coalesce("s_stat", F.lit(0)).cast("bigint").alias("s_stat"),
            "var18",
        )
    )
    sqrt_var = F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    z = (
        F.when(
            (F.col("var18") <= 0) | (F.col("s_stat") == 0), F.lit(0.0)
        )
        .when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1).cast("double") / sqrt_var,
        )
        .otherwise((F.col("s_stat") + 1).cast("double") / sqrt_var)
    )
    return base.select(
        F.col("g").alias(group_col), "n_days", "s_stat", "var18",
        z.alias("z"),
    )


def theta_forecast(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Theta-method forecast per group (Assimakopoulos & Nikolopoulos;
    the M3-competition winner): decompose the daily series into the
    θ=0 line (the OLS linear trend — long-run direction) and the θ=2
    line (``z_t = 2·y_t − trend_t`` — doubled local curvature), SES
    the θ=2 line, and average the two lines' one-step extrapolations.
    Complements :func:`holt_linear` (one smoother with a trend state)
    with the decomposition forecasters actually benchmark against.

    Exactness: the trend comes from exact sufficient statistics on
    (day-offset, cents) — the :func:`grouped_trend` protocol, one
    pinned tree for slope/intercept — and the SES fold is DAY-ORDERED
    in-row with α = ½ (each step ``s' = (z + s)·½`` a short pinned
    tree over z = 2·y − (a + b·x)), so every double is bit-identical
    cross-engine.  Groups with <2 days or zero x-variance are dropped.

    Scale shape: day-grain contraction, one stats aggregate + one
    in-row fold per group.  Output: (group, n_days, slope,
    ses_theta2, forecast1) in currency units (cents folds, /100
    surfaced).
    """
    daily = _daily_cents(events, group_col)
    base = daily.groupBy("g").agg(F.min("d").alias("d0"))
    xd = daily.join(base, "g").select(
        "g",
        F.datediff("d", "d0").cast("bigint").alias("x"),
        "y",
    )
    agg = xd.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(28,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(28,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
    )
    derived = agg.select(
        "g",
        "n",
        F.expr(
            "cast(n as double) * cast(sxy as double)"
            " - cast(sx as double) * cast(sy as double)"
        ).alias("num"),
        F.expr(
            "cast(n as double) * cast(sxx as double)"
            " - cast(sx as double) * cast(sx as double)"
        ).alias("den"),
        F.expr("cast(sx as double)").alias("dsx"),
        F.expr("cast(sy as double)").alias("dsy"),
    ).filter((F.col("n") > 1) & (F.col("den") != 0.0)).select(
        "g",
        "n",
        (F.col("num") / F.col("den")).alias("b"),
        (
            (F.col("dsy") - (F.col("num") / F.col("den")) * F.col("dsx"))
            / F.col("n").cast("double")
        ).alias("a"),
    )
    arr = xd.groupBy("g").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("x"), F.col("y")))
        ).alias("xs"),
        F.max("x").cast("bigint").alias("x_last"),
    )
    joined = arr.join(derived, "g")
    # SES over the theta-2 line: z = 2y − (a + b·x), s' = (z + s)/2
    z = lambda e: (  # noqa: E731
        F.lit(2.0) * e["y"].cast("double")
        - (F.col("a") + F.col("b") * e["x"].cast("double"))
    )
    fold = F.aggregate(
        F.col("xs"),
        F.struct(F.lit(0.0).alias("s"), F.lit(0).alias("started")),
        lambda acc, e: F.when(
            acc["started"] == 0,
            F.struct(z(e).alias("s"), F.lit(1).alias("started")),
        ).otherwise(
            F.struct(
                ((z(e) + acc["s"]) * F.lit(0.5)).alias("s"),
                F.lit(1).alias("started"),
            )
        ),
    )
    out = joined.withColumn("st", fold)
    trend_next = F.col("a") + F.col("b") * (
        F.col("x_last") + F.lit(1)
    ).cast("double")
    return out.select(
        F.col("g").alias(group_col),
        F.col("n").alias("n_days"),
        (F.col("b") / F.lit(100.0)).alias("slope"),
        (F.col("st.s") / F.lit(100.0)).alias("ses_theta2"),
        (
            (F.col("st.s") + trend_next) * F.lit(0.5) / F.lit(100.0)
        ).alias("forecast1"),
    )


def binary_segmentation(
    events: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """Two-level binary segmentation per group — the standard
    multi-change-point extension of :func:`cusum_changepoint` (which
    finds exactly one): split at the global CUSUM argmax, then re-run
    the same argmax INSIDE each half, reporting the top-level change
    point and the strongest secondary candidate per side — the
    three-segment readout a regime-shift review actually wants.

    Integer-exact throughout (the cusum device): per segment the
    statistic is multiplied through by the segment length —
    ``C'_k = n_s·prefix_k − k·total_s`` — so every intermediate is an
    exact BIGINT and every argmax is bit-deterministic (earliest day
    wins ties); peak magnitudes surface with two IEEE ops
    (``/n_s /100``).  Segments shorter than 2 days have no interior
    change point and emit no row.

    Scale shape: one day-grain contraction, one global-window pass,
    a broadcast of the per-group split day, one more windowed pass at
    (group, side) grain — all over the calendar-bounded series.
    Output: (group, segment ∈ all/left/right, n_days,
    change_day, peak_dev) ordered by (group, segment).
    """
    daily = _daily_cents(events, group_col)

    def argmax_scored(df: DataFrame, keys: list) -> DataFrame:
        w_all = Window.partitionBy(*keys)
        w_ord = (
            Window.partitionBy(*keys)
            .orderBy("d")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        rn = F.row_number().over(
            Window.partitionBy(*keys).orderBy("d")
        )
        scored = df.select(
            *keys,
            "d",
            (
                F.count(F.lit(1)).over(w_all) * F.sum("y").over(w_ord)
                - rn * F.sum("y").over(w_all)
            ).cast("bigint").alias("c_scaled"),
            F.count(F.lit(1)).over(w_all).cast("bigint").alias("n_days"),
        )
        pick = F.max(
            F.struct(
                F.abs("c_scaled").alias("mag"),
                # earliest day wins equal magnitudes
                (-F.datediff("d", F.lit("1970-01-01").cast("date")))
                .alias("neg_day"),
                F.col("c_scaled").alias("c"),
                F.col("d").alias("d"),
            )
        )
        return (
            scored.groupBy(*keys)
            .agg(F.max("n_days").alias("n_days"), pick.alias("p"))
            .filter(F.col("n_days") > 1)
        )

    top = argmax_scored(daily, ["g"]).select(
        "g",
        F.col("n_days").alias("n_all"),
        F.col("p.d").alias("cp1"),
        F.col("p.c").alias("c1"),
    )
    tagged = daily.join(F.broadcast(top.select("g", "cp1")), "g").select(
        "g",
        F.when(F.col("d") <= F.col("cp1"), F.lit("left"))
        .otherwise(F.lit("right"))
        .alias("segment"),
        "d",
        "y",
    )
    sides = argmax_scored(tagged, ["g", "segment"]).select(
        "g",
        "segment",
        "n_days",
        F.col("p.d").alias("day"),
        F.col("p.c").alias("c"),
    )
    all_rows = top.select(
        "g",
        F.lit("all").alias("segment"),
        F.col("n_all").alias("n_days"),
        F.col("cp1").alias("day"),
        F.col("c1").alias("c"),
    )
    out = all_rows.unionByName(sides)
    return out.select(
        F.col("g").alias(group_col),
        "segment",
        "n_days",
        F.date_format("day", "yyyy-MM-dd").alias("change_day"),
        (
            F.col("c").cast("double")
            / F.col("n_days").cast("double")
            / 100.0
        ).alias("peak_dev"),
    ).orderBy(group_col, "segment")


def jarque_bera(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Jarque-Bera normality test per group over event-grain value
    cents: ``JB = n/6 · (S² + K²/4)`` with skewness ``S = m₃/m₂^1.5``
    and excess kurtosis ``K = m₄/m₂² − 3`` — the moment-based
    normality gate (ln-free by construction: its only irrational step
    is the IEEE-exact sqrt), the distribution-shape sibling of the
    location (anova_f) and scale (levene_bf) tests.

    Exactness protocol: raw power sums Σc, Σc², Σc³, Σc⁴ accumulate as
    exact DECIMAL(38,0) over BIGINT cents (the anova_f moment device;
    DuckDB twin uses HUGEINT).  Power sums beyond 2⁵³ do NOT cast to
    double directly — Spark's BigDecimal→double and DuckDB's
    HUGEINT→double round differently in the last ulp — so each sum is
    split exactly as ``hi·2⁶⁰ + lo`` (both BIGINT; sums are
    non-negative, so truncating div agrees cross-engine) and
    reassembled as ``double(hi)·2⁶⁰ + double(lo)``: the scale by a
    power of two is exact, int64→double conversion is correctly
    rounded on both engines, and the single add rounds identically —
    a pinned, engine-portable big-integer→double.  Central moments
    then evaluate in one pinned IEEE tree per group — m₂ = Σc²/n − μ²,
    m₃ and m₄ by the binomial expansions around the mean μ = Σc/n, in
    textual order both engines share.

    Scale shape: ONE map-side-combined aggregate at group grain; k rows
    out: (group, n, skewness, kurtosis_excess, jb_stat).  Groups with
    zero variance or n < 4 are dropped (the statistic is undefined);
    empty input → zero rows.
    """
    c = F.floor(F.col("value") * 100).cast("bigint")
    cd = c.cast("decimal(19,0)")
    agg = (
        events.select(F.col(group_col).alias("g"), c.alias("c"), cd.alias("cd"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("c").cast("bigint").alias("s1"),
            F.sum(F.col("cd") * F.col("cd")).cast("decimal(38,0)").alias("s2"),
            F.sum(F.col("cd") * F.col("cd") * F.col("cd"))
            .cast("decimal(38,0)")
            .alias("s3"),
            F.sum(F.col("cd") * F.col("cd") * F.col("cd") * F.col("cd"))
            .cast("decimal(38,0)")
            .alias("s4"),
        )
    )
    two60 = 1152921504606846976  # 2^60

    def big_dbl(col: str):
        # pinned big-integer -> double: hi*2^60 (exact) + lo (one add)
        hi = F.expr(f"{col} div {two60}").cast("double")
        lo = F.expr(f"CAST({col} % {two60} AS BIGINT)").cast("double")
        return hi * F.lit(float(two60)) + lo

    n = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / n
    m2 = big_dbl("s2") / n - mu * mu
    m3 = (
        big_dbl("s3") / n
        - F.lit(3.0) * mu * (big_dbl("s2") / n)
        + F.lit(2.0) * mu * mu * mu
    )
    m4 = (
        big_dbl("s4") / n
        - F.lit(4.0) * mu * (big_dbl("s3") / n)
        + F.lit(6.0) * mu * mu * (big_dbl("s2") / n)
        - F.lit(3.0) * mu * mu * mu * mu
    )
    skew = m3 / (m2 * F.sqrt(m2))
    kurt = m4 / (m2 * m2) - F.lit(3.0)
    jb = n / F.lit(6.0) * (skew * skew + kurt * kurt / F.lit(4.0))
    return (
        agg.filter((F.col("n") >= 4) & (m2 > 0.0))
        .select(
            F.col("g").alias(group_col),
            "n",
            skew.alias("skewness"),
            kurt.alias("kurtosis_excess"),
            jb.alias("jb_stat"),
        )
        .orderBy(group_col)
    )


def levene_bf(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Brown-Forsythe test (Levene with group MEDIANS) for variance
    homogeneity across groups — "is the spread the same?", the
    robust pre-check behind anova_f's equal-variance assumption (and
    the deviation-based sibling of the rank tests: KW asks location,
    this asks scale).

    Device: the deviations fold on exact INTEGERS.  Each group's exact
    interpolated median m_j of the cents c has 2·m_j ∈ ℤ (it is either
    a value or the midpoint of two), so ``z = |2c − 2m_j|`` is an exact
    BIGINT per row — twice the classic |c − m_j|, and the F statistic
    is invariant to that uniform ×2.  Sufficient statistics per group
    (n_j, Σz, Σz²) are then exact, the k-row fold reuses the anova_f
    T = Σ Z_j²/n_j device, and F = [(N−k)/(k−1)]·SSB/SSW is one pinned
    tree.

    Scale shape: one exact-median aggregate per group (sort-based
    percentile at group grain), one broadcast join of the k medians
    back onto the rows, one map-side-combined moment aggregate.
    Output one row: (n_rows, n_groups, ssb, ssw, bf_stat); zero rows on
    empty input, bf_stat = 0.0 when degenerate (k < 2 or SSW ≤ 0).
    """
    c = F.floor(F.col("value") * 100).cast("bigint")
    rows = events.select(F.col(group_col).alias("g"), c.alias("c"))
    med = rows.groupBy("g").agg(
        # exact interpolated median: 2·median is integer-valued
        (F.percentile(F.col("c"), F.lit(0.5)) * 2).cast("bigint").alias("m2x")
    )
    z = (
        rows.join(F.broadcast(med), "g")
        .select("g", F.abs(F.col("c") * 2 - F.col("m2x")).alias("z"))
    )
    zd = F.col("z").cast("decimal(19,0)")
    per_g = z.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("nj"),
        F.sum("z").cast("bigint").alias("zj"),
    )
    glob = z.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("z").cast("bigint").alias("zsum"),
        F.sum(zd * zd).cast("decimal(38,0)").alias("q"),
    )
    folded = per_g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.array_sort(
            F.collect_list(F.struct(F.col("g"), F.col("zj"), F.col("nj")))
        ).alias("gs"),
    ).withColumn(
        "t",
        F.aggregate(
            F.col("gs"),
            F.lit(0.0),
            lambda acc, x: acc
            + (x["zj"].cast("double") * x["zj"].cast("double"))
            / x["nj"].cast("double"),
        ),
    )
    out = folded.crossJoin(glob)
    n = F.col("n_rows").cast("double")
    k = F.col("n_groups").cast("double")
    ssb = F.col("t") - F.col("zsum").cast("double") * F.col("zsum").cast(
        "double"
    ) / n
    ssw = F.col("q").cast("double") - F.col("t")
    f_stat = F.when(
        (F.col("n_groups") > 1)
        & (F.col("n_rows") > F.col("n_groups"))
        & (ssw > 0.0),
        (ssb / (k - F.lit(1.0))) / (ssw / (n - k)),
    ).otherwise(F.lit(0.0))
    return out.select(
        "n_rows", "n_groups", ssb.alias("ssb"), ssw.alias("ssw"),
        f_stat.alias("bf_stat"),
    ).filter((F.col("n_groups") > 0) & F.col("n_rows").isNotNull())


def mood_median(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Mood's median test: a 2×k χ² on per-group counts above vs
    at-or-below the GRAND median — the crudest, most outlier-proof of
    the k-sample location tests (kruskal_wallis uses full ranks; this
    uses one bit per row), and the one whose null distribution
    survives any monotone transform of the values.

    Device: the grand exact interpolated median again enters as the
    integer 2·M (levene_bf's trick), so the above/below split
    ``2c > 2M`` is exact integer comparison — no float boundary.  The
    χ² over the 2×k table uses the standard expected counts
    E_aj = n_j·A/N with exact integer inputs and one pinned tree per
    cell, folded in group-sorted order.

    Output one row: (n_rows, n_groups, n_above, chi2); groups appear in
    the statistic regardless of size; zero rows on empty input;
    chi2 = 0.0 when degenerate (k < 2, or the median splits nothing).
    """
    c = F.floor(F.col("value") * 100).cast("bigint")
    rows = events.select(F.col(group_col).alias("g"), c.alias("c"))
    grand = rows.agg(
        (F.percentile(F.col("c"), F.lit(0.5)) * 2).cast("bigint").alias("m2x")
    )
    tagged = rows.crossJoin(F.broadcast(grand)).select(
        "g", (F.col("c") * 2 > F.col("m2x")).cast("bigint").alias("above")
    )
    per_g = tagged.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("nj"),
        F.sum("above").cast("bigint").alias("aj"),
    )
    folded = per_g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("nj").cast("bigint").alias("n_rows"),
        F.sum("aj").cast("bigint").alias("n_above"),
        F.array_sort(
            F.collect_list(F.struct(F.col("g"), F.col("nj"), F.col("aj")))
        ).alias("gs"),
    )
    n = F.col("n_rows").cast("double")
    a = F.col("n_above").cast("double")
    b = n - a
    # χ² fold in group-sorted order: above cell + below cell per group
    chi2 = F.aggregate(
        F.col("gs"),
        F.lit(0.0),
        lambda acc, x: acc
        + (
            (x["aj"].cast("double") - x["nj"].cast("double") * a / n)
            * (x["aj"].cast("double") - x["nj"].cast("double") * a / n)
            / (x["nj"].cast("double") * a / n)
        )
        + (
            (
                (x["nj"] - x["aj"]).cast("double")
                - x["nj"].cast("double") * b / n
            )
            * (
                (x["nj"] - x["aj"]).cast("double")
                - x["nj"].cast("double") * b / n
            )
            / (x["nj"].cast("double") * b / n)
        ),
    )
    return folded.select(
        "n_rows",
        "n_groups",
        "n_above",
        F.when(
            (F.col("n_groups") > 1)
            & (F.col("n_above") > 0)
            & (F.col("n_above") < F.col("n_rows")),
            chi2,
        )
        .otherwise(F.lit(0.0))
        .alias("chi2"),
    ).filter((F.col("n_rows") > 0) & F.col("n_groups").isNotNull())


def ar1_forecast(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """AR(1) fit by Yule-Walker on each group's daily revenue series +
    the one-step-ahead forecast: ``φ = Σ(y_t−ȳ)(y_{t−1}−ȳ) /
    Σ(y_{t−1}−ȳ)²`` over CONSECUTIVE calendar days, ``ŷ_{T+1} = ȳ +
    φ·(y_T − ȳ)`` — the minimal autoregressive model, one notch above
    ewma_daily (which fixes the memory) and the modeling counterpart
    of acf_lags (which only reports the correlogram).

    Exactness: lag pairs come from a day-grid self-join (d−1); all raw
    sums (n₁, Σa, Σb, Σab, Σbb, Σaa over pairs) are exact BIGINTs
    (squares in DECIMAL(38,0) via the hi/lo 2⁶⁰ double conversion);
    φ, the forecast, and the closed-form in-sample SSE
    ``Σ(a − φb − c)² = Σa² + φ²Σb² + n₁c² − 2φΣab − 2cΣa + 2φcΣb``
    (c = ȳ·(1−φ), means over the PAIR overlap) are pinned IEEE trees —
    no cross-row double sums anywhere.

    Output per group: (group, n_pairs, phi, mean_cents, forecast_cents,
    sse); groups need ≥ 3 pairs and a non-degenerate lag variance.
    """
    daily = _daily_cents(events, group_col)
    cur = daily.select(
        "g", F.col("d"), F.col("y").alias("a"),
    )
    prev = daily.select(
        F.col("g").alias("g2"),
        F.date_add(F.col("d"), 1).alias("d"),
        F.col("y").alias("b"),
    )
    pairs = cur.join(
        prev, (F.col("g") == F.col("g2")) & (cur["d"] == prev["d"])
    ).select("g", "a", "b")
    dd = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    agg = pairs.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1"),
        F.sum("a").cast("bigint").alias("sa"),
        F.sum("b").cast("bigint").alias("sb"),
        F.sum(dd("a") * dd("b")).cast("decimal(38,0)").alias("sab"),
        F.sum(dd("b") * dd("b")).cast("decimal(38,0)").alias("sbb"),
        F.sum(dd("a") * dd("a")).cast("decimal(38,0)").alias("saa"),
    )
    last = daily.groupBy("g").agg(F.max_by("y", "d").alias("y_last"))
    two60 = 1152921504606846976

    def big_dbl(col: str):
        hi = F.expr(f"{col} div {two60}").cast("double")
        lo = F.expr(f"CAST({col} % {two60} AS BIGINT)").cast("double")
        return hi * F.lit(float(two60)) + lo

    n1 = F.col("n1").cast("double")
    ma = F.col("sa").cast("double") / n1
    mb = F.col("sb").cast("double") / n1
    cov = big_dbl("sab") - F.col("sa").cast("double") * F.col("sb").cast(
        "double"
    ) / n1
    vb = big_dbl("sbb") - F.col("sb").cast("double") * F.col("sb").cast(
        "double"
    ) / n1
    phi = cov / vb
    # series mean over the full day grid for the forecast anchor
    full = daily.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    mean_c = F.col("sy").cast("double") / F.col("n_days").cast("double")
    out = agg.join(last, "g").join(full, "g")
    c = mean_c * (F.lit(1.0) - phi)
    sse = (
        big_dbl("saa")
        + phi * phi * big_dbl("sbb")
        + n1 * c * c
        - F.lit(2.0) * phi * big_dbl("sab")
        - F.lit(2.0) * c * F.col("sa").cast("double")
        + F.lit(2.0) * phi * c * F.col("sb").cast("double")
    )
    return (
        out.filter((F.col("n1") >= 3) & (vb > 0.0))
        .select(
            F.col("g").alias(group_col),
            F.col("n1").alias("n_pairs"),
            phi.alias("phi"),
            mean_c.alias("mean_cents"),
            (mean_c + phi * (F.col("y_last").cast("double") - mean_c)).alias(
                "forecast_cents"
            ),
            sse.alias("sse"),
        )
        .orderBy(group_col)
    )


def seasonal_strength(
    events: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """Weekday seasonal-strength index per group: the share of the
    daily series' variance explained by the day-of-week profile —
    ``F_s = SSB/SST`` over the 7 weekday classes (the ANOVA identity:
    Var(residual)/Var(series) = 1 − SSB/SST, so this IS Hyndman's
    seasonal strength with the weekday means as the seasonal
    component).  seasonal_baseline reports the profile; this scores
    how much the profile MATTERS — the one-number gate for "should the
    forecast be weekday-aware?".

    Exactness: the anova_f device verbatim (exact BIGINT day cents,
    Σy² in DECIMAL(38,0) via the hi/lo 2⁶⁰ conversion, group-sorted
    T-fold, pinned SSB/SST trees).  Output per group:
    (group, n_days, ssb, sst, strength) — zero rows on empty input.
    """
    daily = _daily_cents(events, group_col).select(
        "g", F.dayofweek("d").alias("wd"), "y"
    )
    per_w = daily.groupBy("g", "wd").agg(
        F.count(F.lit(1)).cast("bigint").alias("nj"),
        F.sum("y").cast("bigint").alias("zj"),
    )
    yd = F.col("y").cast("decimal(19,0)")
    glob = daily.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("y").cast("bigint").alias("z"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("q"),
    )
    folded = per_w.groupBy("g").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("wd"), F.col("zj"), F.col("nj")))
        ).alias("gs")
    ).withColumn(
        "t",
        F.aggregate(
            F.col("gs"),
            F.lit(0.0),
            lambda acc, x: acc
            + (x["zj"].cast("double") * x["zj"].cast("double"))
            / x["nj"].cast("double"),
        ),
    )
    two60 = 1152921504606846976

    def big_dbl(col: str):
        hi = F.expr(f"{col} div {two60}").cast("double")
        lo = F.expr(f"CAST({col} % {two60} AS BIGINT)").cast("double")
        return hi * F.lit(float(two60)) + lo

    out = folded.join(glob, "g")
    n = F.col("n_days").cast("double")
    ssb = F.col("t") - F.col("z").cast("double") * F.col("z").cast(
        "double"
    ) / n
    sst = big_dbl("q") - F.col("z").cast("double") * F.col("z").cast(
        "double"
    ) / n
    return (
        out.filter((F.col("n_days") > 7) & (sst > 0.0))
        .select(
            F.col("g").alias(group_col),
            "n_days",
            ssb.alias("ssb"),
            sst.alias("sst"),
            (ssb / sst).alias("strength"),
        )
        .orderBy(group_col)
    )


def granger_lag1(
    events: DataFrame,
    cause: str = "view",
    effect: str = "purchase",
) -> DataFrame:
    """Lag-1 Granger causality F-test: do yesterday's ``cause`` events
    improve today's ``effect`` forecast beyond the effect's own
    history?  Restricted model ``y_t ~ 1 + y_{t−1}``, unrestricted
    adds ``x_{t−1}``; ``F = (RSS_r − RSS_u) / (RSS_u/(n−3))`` — the
    directional upgrade of ccf_daily (correlation is symmetric;
    Granger asks who LEADS).

    Exactness: day-grid triples (y_t, y_{t−1}, x_{t−1}) from two
    consecutive-day joins; ALL raw sums exact (BIGINT / DECIMAL(38,0)
    with hi/lo 2⁶⁰ conversion); both OLS fits evaluate in closed form
    over centered sums (2×2 normal equations by Cramer's rule), so
    RSS_r, RSS_u, F are pinned IEEE trees — no per-row residual sums.

    Output one row: (n_triples, rss_restricted, rss_unrestricted,
    f_granger); zero rows when < 5 triples or either fit degenerates.
    """
    daily = _daily_cents(events, "event_type")
    yd = daily.filter(F.col("g") == effect).select("d", F.col("y").alias("w"))
    yl = daily.filter(F.col("g") == effect).select(
        F.date_add("d", 1).alias("d"), F.col("y").alias("u")
    )
    xl = daily.filter(F.col("g") == cause).select(
        F.date_add("d", 1).alias("d"), F.col("y").alias("v")
    )
    tri = yd.join(yl, "d").join(xl, "d").select("w", "u", "v")
    dd = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    agg = tri.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("w").cast("bigint").alias("sw"),
        F.sum("u").cast("bigint").alias("su"),
        F.sum("v").cast("bigint").alias("sv"),
        F.sum(dd("w") * dd("w")).cast("decimal(38,0)").alias("sww"),
        F.sum(dd("u") * dd("u")).cast("decimal(38,0)").alias("suu"),
        F.sum(dd("v") * dd("v")).cast("decimal(38,0)").alias("svv"),
        F.sum(dd("u") * dd("w")).cast("decimal(38,0)").alias("suw"),
        F.sum(dd("v") * dd("w")).cast("decimal(38,0)").alias("svw"),
        F.sum(dd("u") * dd("v")).cast("decimal(38,0)").alias("suv"),
    )
    two60 = 1152921504606846976

    def big_dbl(col: str):
        hi = F.expr(f"{col} div {two60}").cast("double")
        lo = F.expr(f"CAST({col} % {two60} AS BIGINT)").cast("double")
        return hi * F.lit(float(two60)) + lo

    n = F.col("n").cast("double")
    cww = big_dbl("sww") - F.col("sw").cast("double") * F.col("sw").cast("double") / n
    cuu = big_dbl("suu") - F.col("su").cast("double") * F.col("su").cast("double") / n
    cvv = big_dbl("svv") - F.col("sv").cast("double") * F.col("sv").cast("double") / n
    cuw = big_dbl("suw") - F.col("su").cast("double") * F.col("sw").cast("double") / n
    cvw = big_dbl("svw") - F.col("sv").cast("double") * F.col("sw").cast("double") / n
    cuv = big_dbl("suv") - F.col("su").cast("double") * F.col("sv").cast("double") / n
    rss_r = cww - cuw * cuw / cuu
    det = cuu * cvv - cuv * cuv
    bu = (cuw * cvv - cvw * cuv) / det
    bv = (cvw * cuu - cuw * cuv) / det
    rss_u = cww - (bu * cuw + bv * cvw)
    f = (rss_r - rss_u) / (rss_u / (n - F.lit(3.0)))
    return agg.filter(
        (F.col("n") >= 5) & (cuu > 0.0) & (det > 0.0)
    ).select(
        F.col("n").alias("n_triples"),
        rss_r.alias("rss_restricted"),
        rss_u.alias("rss_unrestricted"),
        F.when(rss_u > 0.0, f).otherwise(F.lit(0.0)).alias("f_granger"),
    )


def rsi_daily(
    events: DataFrame, period: int = 14, group_col: str = "event_type"
) -> DataFrame:
    """Cutler's RSI (the SMA variant of the relative strength index)
    over each group's daily revenue: ``RSI = 100·G/(G+L)`` where G/L
    sum the up/down moves of the last ``period`` CALENDAR days — the
    classic overbought/oversold momentum gauge; Cutler's SMA form is
    used deliberately because Wilder's recursive smoothing has no
    exact cross-engine fold, while windowed integer sums do.

    Exactness: day-over-day moves Δ are exact BIGINTs from the d−1
    grid join; G and L are range-frame window sums of exact integers
    (calendar RANGE on the epoch-day ordinal, so gaps cannot shift the
    frame); RSI is one IEEE division, 50.0 exactly when the window is
    flat.  Rows emit only where the frame holds a full ``period`` of
    moves.  Output: (group, day, gains_cents, losses_cents, rsi).
    """
    daily = _daily_cents(events, group_col).select(
        "g",
        "d",
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).alias("x"),
        "y",
    )
    prev = daily.select(
        F.col("g").alias("g2"), (F.col("x") + 1).alias("x"),
        F.col("y").alias("y_prev"),
    )
    moves = daily.join(
        prev, (F.col("g") == F.col("g2")) & (daily["x"] == prev["x"])
    ).select(
        "g", "d", daily["x"].alias("x"),
        (F.col("y") - F.col("y_prev")).alias("delta"),
    )
    w = (
        Window.partitionBy("g")
        .orderBy("x")
        .rangeBetween(-(period - 1), 0)
    )
    framed = moves.select(
        "g",
        "d",
        F.sum(F.greatest(F.col("delta"), F.lit(0)))
        .over(w)
        .cast("bigint")
        .alias("gains_cents"),
        F.sum(F.greatest(-F.col("delta"), F.lit(0)))
        .over(w)
        .cast("bigint")
        .alias("losses_cents"),
        F.count(F.lit(1)).over(w).alias("n_moves"),
    )
    g_ = F.col("gains_cents").cast("double")
    l_ = F.col("losses_cents").cast("double")
    return framed.filter(F.col("n_moves") == period).select(
        F.col("g").alias(group_col),
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "gains_cents",
        "losses_cents",
        F.when(
            F.col("gains_cents") + F.col("losses_cents") > 0,
            F.lit(100.0) * g_ / (g_ + l_),
        )
        .otherwise(F.lit(50.0))
        .alias("rsi"),
    )


def price_osc(
    events: DataFrame,
    fast: int = 5,
    slow: int = 20,
    group_col: str = "event_type",
) -> DataFrame:
    """SMA price oscillator over each group's daily revenue: fast-window
    mean minus slow-window mean, plus the percentage form — the
    crossing-zero momentum signal (the SMA-based sibling of MACD,
    chosen because EWMA-of-EWMA has no exact cross-engine fold while
    calendar-range integer sums do; ewma_daily covers the dyadic
    exponential face).

    Exactness: both numerators are range-frame sums of exact BIGINT
    cents over calendar RANGE frames; each mean is one IEEE division
    and the oscillator one subtraction.  Rows emit only where the slow
    frame is FULL (``slow`` consecutive observed days).  Output:
    (group, day, sma_fast, sma_slow, osc, osc_pct).
    """
    daily = _daily_cents(events, group_col).select(
        "g",
        "d",
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).alias("x"),
        "y",
    )
    wf = Window.partitionBy("g").orderBy("x").rangeBetween(-(fast - 1), 0)
    ws = Window.partitionBy("g").orderBy("x").rangeBetween(-(slow - 1), 0)
    framed = daily.select(
        "g",
        "d",
        F.sum("y").over(wf).cast("bigint").alias("sf"),
        F.count(F.lit(1)).over(wf).alias("nf"),
        F.sum("y").over(ws).cast("bigint").alias("ss"),
        F.count(F.lit(1)).over(ws).alias("ns"),
    )
    sma_f = F.col("sf").cast("double") / F.lit(float(fast)) / F.lit(100.0)
    sma_s = F.col("ss").cast("double") / F.lit(float(slow)) / F.lit(100.0)
    return framed.filter(
        (F.col("nf") == fast) & (F.col("ns") == slow)
    ).select(
        F.col("g").alias(group_col),
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        sma_f.alias("sma_fast"),
        sma_s.alias("sma_slow"),
        (sma_f - sma_s).alias("osc"),
        F.when(
            F.col("ss") > 0, (sma_f - sma_s) / sma_s * F.lit(100.0)
        )
        .otherwise(F.lit(0.0))
        .alias("osc_pct"),
    )


def squared_rank_scale(
    events: DataFrame,
    group_a: str = "view",
    group_b: str = "click",
    group_col: str = "event_type",
) -> DataFrame:
    """Mood's squared-rank test for SCALE (Conover): are two groups'
    daily revenues equally DISPERSED?  mwu_drift asks location with
    ranks; this squares the centered ranks so extreme ranks (either
    end) score high — a nonparametric Brown-Forsythe that needs no
    median and survives any monotone outlier.

    Statistic: ``T = Σ_{i∈A} (rank_i − (N+1)/2)²`` over the pooled
    daily series, against its exact permutation moments
    ``E[T] = n_A·S̄``, ``Var[T] = n_A·n_B/(N(N−1))·(S₂ − N·S̄²)``
    (S̄, S₂ the pooled mean/raw-second-moment of the scores) —
    tie-aware via midranks.

    Exactness: doubled midranks r2 are exact BIGINTs (the
    kruskal_wallis device), so QUADRUPLED scores ``q4 = (r2−(N+1))²``
    are exact BIGINTs too; T, ΣS, ΣS² accumulate exactly (the hi/lo
    2⁶⁰ conversion for ΣS²) and z = (T − E)/√Var is one pinned tree.
    Output one row: (n_a, n_b, t4_a, z_scale); zero rows unless both
    groups are present, z = 0.0 when Var degenerates.
    """
    daily = _daily_cents(
        events.filter(F.col(group_col).isin(group_a, group_b)), group_col
    )
    wv = Window.orderBy("y")
    ranked = daily.withColumn(
        "r2",
        (
            2 * F.rank().over(wv)
            + F.count(F.lit(1)).over(Window.partitionBy("y"))
            - 1
        ).cast("bigint"),
    )
    tot = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    scored = ranked.crossJoin(F.broadcast(tot)).select(
        "g",
        (
            (F.col("r2") - (F.col("n_rows") + 1))
            * (F.col("r2") - (F.col("n_rows") + 1))
        ).alias("q4"),
    )
    qd = F.col("q4").cast("decimal(19,0)")
    per_g = scored.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("nj"),
        F.sum("q4").cast("bigint").alias("tj"),
    )
    glob = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q4").cast("bigint").alias("s1"),
        F.sum(qd * qd).cast("decimal(38,0)").alias("s2"),
    )
    a = per_g.filter(F.col("g") == group_a).select(
        F.col("nj").alias("n_a"), F.col("tj").alias("t4_a")
    )
    b = per_g.filter(F.col("g") == group_b).select(
        F.col("nj").alias("n_b")
    )
    out = a.crossJoin(b).crossJoin(glob)
    two60 = 1152921504606846976

    def big_dbl(col: str):
        hi = F.expr(f"{col} div {two60}").cast("double")
        lo = F.expr(f"CAST({col} % {two60} AS BIGINT)").cast("double")
        return hi * F.lit(float(two60)) + lo

    n = F.col("n").cast("double")
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    sbar = F.col("s1").cast("double") / n
    e_t = na * sbar
    var_t = (
        na
        * nb
        / (n * (n - F.lit(1.0)))
        * (big_dbl("s2") - n * sbar * sbar)
    )
    z = (F.col("t4_a").cast("double") - e_t) / F.sqrt(var_t)
    return out.select(
        "n_a",
        "n_b",
        "t4_a",
        F.when(var_t > 0.0, z).otherwise(F.lit(0.0)).alias("z_scale"),
    ).filter((F.col("n_a") > 0) & (F.col("n_b") > 0))


def ansari_bradley(
    events: DataFrame,
    group_a: str = "view",
    group_b: str = "click",
    group_col: str = "event_type",
) -> DataFrame:
    """Ansari-Bradley two-sample scale test on the pooled daily
    revenues: ranks folded from BOTH ends (extreme ranks score LOW),
    so a group whose values crowd the edges of the pooled ordering —
    higher dispersion — collects a small score sum.  The folded-rank
    complement of :func:`squared_rank_scale` (which squares centered
    ranks instead); classical practice runs both since they weight the
    tails differently.

    Exactness: doubled midranks r2 are exact BIGINTs, so DOUBLED AB
    scores ``s2 = min(r2, 2(N+1) − r2)`` are exact BIGINTs; the test
    compares T2_A = Σ_{i∈A} s2 against its exact permutation moments
    E[T2_A] = n_A·mean(s2), Var[T2_A] = n_A·n_B/(N(N−1))·(Σs2²
    − N·mean²) — the same tie-robust moment device, z one pinned tree.
    Output one row: (n_a, n_b, t2_a, z_scale); zero rows unless both
    groups present, z = 0.0 when Var degenerates.
    """
    daily = _daily_cents(
        events.filter(F.col(group_col).isin(group_a, group_b)), group_col
    )
    wv = Window.orderBy("y")
    ranked = daily.withColumn(
        "r2",
        (
            2 * F.rank().over(wv)
            + F.count(F.lit(1)).over(Window.partitionBy("y"))
            - 1
        ).cast("bigint"),
    )
    tot = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    scored = ranked.crossJoin(F.broadcast(tot)).select(
        "g",
        F.least(
            F.col("r2"), 2 * (F.col("n_rows") + 1) - F.col("r2")
        ).alias("s2"),
    )
    sd = F.col("s2").cast("decimal(19,0)")
    per_g = scored.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("nj"),
        F.sum("s2").cast("bigint").alias("tj"),
    )
    glob = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("s2").cast("bigint").alias("s1"),
        F.sum(sd * sd).cast("decimal(38,0)").alias("sq"),
    )
    a = per_g.filter(F.col("g") == group_a).select(
        F.col("nj").alias("n_a"), F.col("tj").alias("t2_a")
    )
    b = per_g.filter(F.col("g") == group_b).select(
        F.col("nj").alias("n_b")
    )
    out = a.crossJoin(b).crossJoin(glob)
    two60 = 1152921504606846976

    def big_dbl(col: str):
        hi = F.expr(f"{col} div {two60}").cast("double")
        lo = F.expr(f"CAST({col} % {two60} AS BIGINT)").cast("double")
        return hi * F.lit(float(two60)) + lo

    n = F.col("n").cast("double")
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    sbar = F.col("s1").cast("double") / n
    var_t = (
        na
        * nb
        / (n * (n - F.lit(1.0)))
        * (big_dbl("sq") - n * sbar * sbar)
    )
    z = (F.col("t2_a").cast("double") - na * sbar) / F.sqrt(var_t)
    return out.select(
        "n_a",
        "n_b",
        "t2_a",
        F.when(var_t > 0.0, z).otherwise(F.lit(0.0)).alias("z_scale"),
    ).filter((F.col("n_a") > 0) & (F.col("n_b") > 0))


def wilcoxon_signed(
    events: DataFrame,
    group_a: str = "view",
    group_b: str = "click",
    group_col: str = "event_type",
) -> DataFrame:
    """Wilcoxon signed-rank test on the DAY-PAIRED daily revenues of
    two groups — the paired sibling of mwu_drift: each calendar day
    contributes one difference d = A − B, zero differences drop
    (classical practice), and W⁺ sums the |d|-midranks of the positive
    days.  Pairing removes the shared daily seasonality both groups
    ride, exactly like mcnemar vs ab_conversion on the binary side.

    Exactness: d is an exact BIGINT (cents); doubled midranks of |d|
    are exact (the KW device), so the DOUBLED statistic
    ``W2⁺ = Σ_{d>0} r2`` is an exact BIGINT with exact moments
    ``E[W2⁺] = n(n+1)/2`` and ``12·Var[W2⁺] = 2n(n+1)(2n+1)
    − Σ(t³−t)`` (tie-corrected) — both exact integers, z one pinned
    tree.  Output one row: (n_pairs, n_nonzero, w2_plus, z_signed);
    zero rows when no day has both groups.
    """
    daily = _daily_cents(
        events.filter(F.col(group_col).isin(group_a, group_b)), group_col
    )
    a = daily.filter(F.col("g") == group_a).select("d", F.col("y").alias("ya"))
    b = daily.filter(F.col("g") == group_b).select("d", F.col("y").alias("yb"))
    pairs = a.join(b, "d").select(
        (F.col("ya") - F.col("yb")).alias("diff")
    )
    pcount = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    nz = pairs.filter(F.col("diff") != 0).select(
        F.abs(F.col("diff")).alias("ad"),
        (F.col("diff") > 0).cast("bigint").alias("pos"),
    )
    wv = Window.orderBy("ad")
    ranked = nz.withColumn(
        "r2",
        (
            2 * F.rank().over(wv)
            + F.count(F.lit(1)).over(Window.partitionBy("ad"))
            - 1
        ).cast("bigint"),
    )
    ties = (
        nz.groupBy("ad")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("bigint")
            .alias("tie_sum")
        )
    )
    agg = (
        ranked.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("r2") * F.col("pos"))
            .cast("bigint")
            .alias("w2_plus"),
        )
        .crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(pcount))
    )
    n = F.col("n").cast("double")
    e_w2 = n * (n + F.lit(1.0)) / F.lit(2.0)
    var12 = (
        F.lit(2.0) * n * (n + F.lit(1.0)) * (F.lit(2.0) * n + F.lit(1.0))
        - F.col("tie_sum").cast("double")
    )
    z = (F.col("w2_plus").cast("double") - e_w2) / F.sqrt(
        var12 / F.lit(12.0)
    )
    return agg.select(
        "n_pairs",
        F.col("n").alias("n_nonzero"),
        F.coalesce("w2_plus", F.lit(0)).cast("bigint").alias("w2_plus"),
        F.when((F.col("n") > 0) & (var12 > 0.0), z)
        .otherwise(F.lit(0.0))
        .alias("z_signed"),
    ).filter(F.col("n_pairs") > 0)


def page_trend(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Page's L test for an ORDERED alternative across groups, blocked
    by weekday — the trend-powered sibling of :func:`friedman_test`
    exactly as cochran_armitage is to the 2×k χ²: Friedman asks "do
    the groups differ?"; Page asks "do they INCREASE along the
    hypothesized order?" (here: lexicographic group order, the
    documented convention), one degree of freedom, far more power
    against monotone orderings.

    ``L = Σ_j c_j·R_j`` with c_j the group's 1-based rank in the
    hypothesized order and R_j its Friedman rank sum; doubled ranks
    make ``L2 = Σ c_j·R2_j`` an exact BIGINT.  Moments (tie-naive, the
    classical table's assumption — midranks keep L2 conservative, the
    friedman stance): ``E[L2] = b·k(k+1)²/2``,
    ``Var[L2] = b·k²(k+1)(k²−1)/36``; z is one pinned tree.  Output
    one row: (n_blocks, n_groups, l2, z_trend) — zero rows when empty,
    0.0 when k < 3 or any block is incomplete (the statistic's moments
    assume complete blocks).
    """
    cell = (
        events.select(
            F.col(group_col).alias("g"),
            F.dayofweek(F.to_date("ts")).alias("blk"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("g", "blk")
        .agg(F.sum("cents").alias("y"))
    )
    wb = Window.partitionBy("blk").orderBy("y")
    ranked = cell.withColumn(
        "d2r",
        (
            2 * F.rank().over(wb)
            + F.count(F.lit(1)).over(Window.partitionBy("blk", "y"))
            - 1
        ).cast("bigint"),
    )
    per_g = ranked.groupBy("g").agg(
        F.sum("d2r").cast("bigint").alias("r2j"),
        F.count(F.lit(1)).cast("bigint").alias("bj"),
    )
    wg = Window.orderBy("g")
    scored = per_g.withColumn(
        "cj", F.row_number().over(wg).cast("bigint")
    )
    blocks = ranked.agg(
        F.countDistinct("blk").cast("bigint").alias("n_blocks")
    )
    folded = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.col("cj") * F.col("r2j")).cast("bigint").alias("l2"),
        F.min("bj").cast("bigint").alias("min_bj"),
        F.max("bj").cast("bigint").alias("max_bj"),
    ).crossJoin(blocks)
    b = F.col("n_blocks").cast("double")
    k = F.col("n_groups").cast("double")
    e_l2 = b * k * (k + F.lit(1.0)) * (k + F.lit(1.0)) / F.lit(2.0)
    var_l2 = (
        b * k * k * (k + F.lit(1.0)) * (k * k - F.lit(1.0)) / F.lit(36.0)
    )
    z = (F.col("l2").cast("double") - e_l2) / F.sqrt(var_l2)
    complete = (
        (F.col("min_bj") == F.col("n_blocks"))
        & (F.col("max_bj") == F.col("n_blocks"))
    )
    return folded.select(
        "n_blocks",
        "n_groups",
        "l2",
        F.when((F.col("n_groups") >= 3) & complete & (var_l2 > 0.0), z)
        .otherwise(F.lit(0.0))
        .alias("z_trend"),
    ).filter(F.col("n_blocks") > 0)


def cox_stuart(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Cox-Stuart trend test per group: pair day i with day i + ⌊n'/2⌋
    over the group's day-ordered revenue series and SIGN-test the
    differences — the assumption-free trend check that needs neither
    ranks (mann_kendall's O(n²) pairs) nor a model (grouped_trend's
    OLS): just "is the second half systematically above the first?".

    Classical construction: odd-length series drop the middle day;
    zero differences drop; S⁺ ~ Binomial(m, ½) under H0, so
    ``z = (S⁺ − m/2)/√(m/4)`` — counts exact BIGINTs, z one pinned
    tree.  Day alignment is POSITIONAL (i-th observed day), matching
    the classical test on possibly-gapped series.

    Output per group: (group, n_days, n_diffs, s_plus, z_trend); zero
    rows on empty input, z = 0.0 when m = 0.
    """
    daily = _daily_cents(events, group_col)
    wd = Window.partitionBy("g").orderBy("d")
    idx = daily.withColumn(
        "i", F.row_number().over(wd).cast("bigint")
    )
    counts = idx.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    lead = idx.join(counts, "g").select(
        "g",
        "nd",
        "i",
        "y",
        (F.col("i") + F.expr("nd div 2")).alias("j"),
    )
    second = idx.select(
        F.col("g").alias("g2"), F.col("i").alias("j"), F.col("y").alias("y2")
    )
    # first-half rows pair with their +floor(n/2) partner; odd length
    # drops the middle row automatically (i <= floor(n/2))
    pairs = (
        lead.filter(F.col("i") <= F.expr("nd div 2"))
        .join(
            second,
            (F.col("g") == F.col("g2")) & (lead["j"] == second["j"]),
        )
        .select("g", "nd", (F.col("y2") - F.col("y")).alias("diff"))
    )
    agg = pairs.groupBy("g", "nd").agg(
        F.sum((F.col("diff") != 0).cast("bigint")).cast("bigint").alias("m"),
        F.sum((F.col("diff") > 0).cast("bigint")).cast("bigint").alias("s_plus"),
    )
    m = F.col("m").cast("double")
    z = (
        F.col("s_plus").cast("double") - m / F.lit(2.0)
    ) / F.sqrt(m / F.lit(4.0))
    return agg.select(
        F.col("g").alias(group_col),
        F.col("nd").alias("n_days"),
        F.col("m").alias("n_diffs"),
        "s_plus",
        F.when(F.col("m") > 0, z).otherwise(F.lit(0.0)).alias("z_trend"),
    ).orderBy(group_col)


def dixon_q(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Dixon's Q for single-outlier screening per group: the gap
    between the most extreme daily revenue and its nearest neighbor,
    over the full range — ``Q_low = (x₍₂₎−x₍₁₎)/(x₍ₙ₎−x₍₁₎)``,
    ``Q_high = (x₍ₙ₎−x₍ₙ₋₁₎)/(x₍ₙ₎−x₍₁₎)`` — the small-sample
    complement of mad_outliers (which scores every point): Q asks
    specifically "is the single most extreme day discordant?", the
    classical lab-data screen for n ≲ 30 (a daily month).

    Exactness: the four order statistics (min, 2nd-min, max, 2nd-max)
    are exact BIGINT cents from one sorted-array fold per group; each
    Q is one IEEE division.  Output per group: (group, n_days, q_low,
    q_high); groups need n ≥ 3 and a nonzero range.
    """
    daily = _daily_cents(events, group_col)
    per_g = daily.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.min("y").cast("bigint").alias("x1"),
        F.max("y").cast("bigint").alias("xn"),
        # 2nd smallest / largest via the sorted distinct-2 slice
        F.array_sort(F.collect_list("y")).alias("ys"),
    )
    x2 = F.element_at(F.col("ys"), 2).cast("bigint")
    xn1 = F.element_at(F.col("ys"), -2).cast("bigint")
    rng = (F.col("xn") - F.col("x1")).cast("double")
    return (
        per_g.filter((F.col("n_days") >= 3) & (F.col("xn") > F.col("x1")))
        .select(
            F.col("g").alias(group_col),
            "n_days",
            ((x2 - F.col("x1")).cast("double") / rng).alias("q_low"),
            ((F.col("xn") - xn1).cast("double") / rng).alias("q_high"),
        )
        .orderBy(group_col)
    )


def _day_paired_cents(
    events: DataFrame, group_a: str, group_b: str, group_col: str
) -> DataFrame:
    """(x, y) exact daily cents of two groups inner-joined on calendar
    day — the shared pairing of wilcoxon_signed / lins_ccc /
    bland_altman."""
    daily = _daily_cents(
        events.filter(F.col(group_col).isin(group_a, group_b)), group_col
    )
    a = daily.filter(F.col("g") == group_a).select(
        "d", F.col("y").alias("x")
    )
    b = daily.filter(F.col("g") == group_b).select(
        "d", F.col("y").alias("y")
    )
    return a.join(b, "d").select("x", "y")


def lins_ccc(
    events: DataFrame,
    group_a: str = "view",
    group_b: str = "click",
    group_col: str = "event_type",
) -> DataFrame:
    """Lin's concordance correlation coefficient between two groups'
    day-paired daily revenues: ``CCC = 2·s_xy / (s_x² + s_y² +
    (x̄−ȳ)²)`` (population moments, Lin 1989) — agreement along the
    45° line, the method-comparison statistic that penalizes both
    scatter (like Pearson) AND location/scale bias (unlike Pearson).
    CCC = r·C_b factors into precision (r) and accuracy (the bias
    correction C_b), both reported.

    Exactness: the five sufficient statistics over day pairs are exact
    (BIGINT / DECIMAL(38,0) with the hi/lo 2⁶⁰ conversion); CCC, r,
    and C_b are pinned IEEE trees.  Output one row: (n_pairs,
    pearson_r, c_b, ccc); zero rows without ≥ 2 pairs or degenerate
    variance on either side.
    """
    pairs = _day_paired_cents(events, group_a, group_b, group_col)
    dd = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(dd("x") * dd("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(dd("y") * dd("y")).cast("decimal(38,0)").alias("syy"),
        F.sum(dd("x") * dd("y")).cast("decimal(38,0)").alias("sxy"),
    )
    two60 = 1152921504606846976

    def big_dbl(col: str):
        hi = F.expr(f"{col} div {two60}").cast("double")
        lo = F.expr(f"CAST({col} % {two60} AS BIGINT)").cast("double")
        return hi * F.lit(float(two60)) + lo

    n = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / n
    my = F.col("sy").cast("double") / n
    # population (1/n) moments, per Lin's original definition
    vx = big_dbl("sxx") / n - mx * mx
    vy = big_dbl("syy") / n - my * my
    cov = big_dbl("sxy") / n - mx * my
    ccc = F.lit(2.0) * cov / (vx + vy + (mx - my) * (mx - my))
    r = cov / F.sqrt(vx * vy)
    return agg.filter(
        (F.col("n") > 1) & (vx > 0.0) & (vy > 0.0)
    ).select(
        F.col("n").alias("n_pairs"),
        r.alias("pearson_r"),
        (ccc / r).alias("c_b"),
        ccc.alias("ccc"),
    )


def bland_altman(
    events: DataFrame,
    group_a: str = "view",
    group_b: str = "click",
    group_col: str = "event_type",
) -> DataFrame:
    """Bland-Altman limits of agreement on the same day-paired series:
    mean difference ± 1.96·SD(differences) — the method-comparison
    companion of :func:`lins_ccc` (CCC gives one number; Bland-Altman
    gives the INTERVAL a difference should fall in, the form clinical
    and measurement studies actually report).

    Exactness: differences are exact BIGINT cents; mean and sample SD
    come from exact sums via pinned trees, the 1.96 multiplier is a
    literal, and the surface divides by 100 once.  Output one row:
    (n_pairs, mean_diff, sd_diff, loa_low, loa_high); zero rows
    without ≥ 2 pairs.
    """
    pairs = _day_paired_cents(events, group_a, group_b, group_col).select(
        (F.col("x") - F.col("y")).alias("diff")
    )
    dd = F.col("diff").cast("decimal(19,0)")
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("diff").cast("bigint").alias("s"),
        F.sum(dd * dd).cast("decimal(38,0)").alias("q"),
    )
    two60 = 1152921504606846976
    hi = F.expr(f"q div {two60}").cast("double")
    lo = F.expr(f"CAST(q % {two60} AS BIGINT)").cast("double")
    qd = hi * F.lit(float(two60)) + lo
    n = F.col("n").cast("double")
    mean_c = F.col("s").cast("double") / n
    sd_c = F.sqrt(
        (n * qd - F.col("s").cast("double") * F.col("s").cast("double"))
        / (n * (n - F.lit(1.0)))
    )
    return agg.filter(F.col("n") > 1).select(
        F.col("n").alias("n_pairs"),
        (mean_c / F.lit(100.0)).alias("mean_diff"),
        (sd_c / F.lit(100.0)).alias("sd_diff"),
        ((mean_c - F.lit(1.96) * sd_c) / F.lit(100.0)).alias("loa_low"),
        ((mean_c + F.lit(1.96) * sd_c) / F.lit(100.0)).alias("loa_high"),
    )


def max_drawdown(
    events: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """Maximum drawdown of each group's daily-revenue series: the
    largest peak-to-trough fall, both in exact cents (``dd_cents =
    max_t(peak_t − y_t)``) and as a fraction of the running peak
    (``dd_frac = max_t((peak_t − y_t)/peak_t)``) — the standard
    worst-case-decline risk statistic (finance's counterpart of the
    CUSUM family above).  The two maxima are reported independently
    (each is a well-defined max; an argmax tie-break would be
    arbitrary).

    Exactness: the running peak is a window MAX over exact BIGINT
    cents, the cents drawdown stays integer end-to-end, and the
    fractional form is one IEEE division per day followed by a MAX
    over doubles (deterministic in both engines).

    Shape at 100 TB: day-grain contraction first (one map-side-combined
    aggregate), then a per-group ordered window over CALENDAR-bounded
    rows — never event grain.  Output: (group, n_days, peak_cents,
    dd_cents, dd_frac).
    """
    daily = _daily_cents(events, group_col)
    w = (
        Window.partitionBy("g")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = daily.select(
        "g",
        "y",
        F.max("y").over(w).alias("peak"),
    ).select(
        "g",
        "peak",
        (F.col("peak") - F.col("y")).alias("dd"),
        F.when(
            F.col("peak") > 0,
            (F.col("peak") - F.col("y")).cast("double")
            / F.col("peak").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("ddf"),
    )
    return (
        dd.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.max("peak").cast("bigint").alias("peak_cents"),
            F.max("dd").cast("bigint").alias("dd_cents"),
            F.max("ddf").alias("dd_frac"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_days",
            "peak_cents",
            "dd_cents",
            "dd_frac",
        )
    )


def bollinger_bands(
    events: DataFrame,
    period: int = 20,
    k: float = 2.0,
    group_col: str = "event_type",
) -> DataFrame:
    """Bollinger bands over each group's daily revenue: rolling mean ±
    ``k`` population standard deviations of the last ``period``
    CALENDAR days, plus %B (where today sits inside the band) — the
    volatility envelope that complements the SMA oscillator
    (:func:`price_osc` asks direction; bands ask dispersion).

    Exactness: S and SS are calendar-RANGE window sums of exact BIGINT
    cents (and their squares), so the pinned tree ``m = S/n``,
    ``var = SS/n − m²``, ``sd = sqrt(max(var, 0))`` is a fixed IEEE
    sequence from exactly-represented integers in both engines;
    rows emit only on FULL frames.  %B is one further division,
    0.5 exactly when the band is degenerate (sd = 0).

    Output: (group, day, mean_rev, sd_rev, band_low, band_high, pct_b)
    in currency units.
    """
    daily = _daily_cents(events, group_col).select(
        "g",
        "d",
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).alias("x"),
        "y",
    )
    w = (
        Window.partitionBy("g")
        .orderBy("x")
        .rangeBetween(-(period - 1), 0)
    )
    # squared cents overflow BIGINT a few multiples above the bench
    # scale — exact DECIMAL(38,0) here, HUGEINT in the oracle (same
    # exact integer, hence the same final double)
    ydec = F.col("y").cast("decimal(38,0)")
    framed = daily.select(
        "g",
        "d",
        "y",
        F.sum("y").over(w).cast("bigint").alias("s"),
        F.sum(ydec * ydec).over(w).cast("decimal(38,0)").alias("ss"),
        F.count(F.lit(1)).over(w).alias("n"),
    ).filter(F.col("n") == period)
    n_ = F.lit(float(period))
    m = F.col("s").cast("double") / n_
    var = F.col("ss").cast("double") / n_ - m * m
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    lo = m - F.lit(float(k)) * sd
    hi = m + F.lit(float(k)) * sd
    y_ = F.col("y").cast("double")
    return framed.select(
        F.col("g").alias(group_col),
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        (m / F.lit(100.0)).alias("mean_rev"),
        (sd / F.lit(100.0)).alias("sd_rev"),
        (lo / F.lit(100.0)).alias("band_low"),
        (hi / F.lit(100.0)).alias("band_high"),
        F.when(hi > lo, (y_ - lo) / (hi - lo))
        .otherwise(F.lit(0.5))
        .alias("pct_b"),
    )


def ma_crossover(
    events: DataFrame,
    fast: int = 5,
    slow: int = 20,
    group_col: str = "event_type",
) -> DataFrame:
    """Moving-average crossover signals ("golden cross" / "death
    cross") on each group's daily revenue: the days where the
    ``fast``-day SMA crosses the ``slow``-day SMA from below (golden)
    or above (death) — the classic regime-change trigger built on the
    same calendar frames as :func:`price_osc`.

    FULLY integer-exact — no floats anywhere: ``SMA_f > SMA_s`` is
    evaluated as ``S_f·slow > S_s·fast`` in exact BIGINT cents (the
    cross-multiplication dodge), and a cross requires yesterday's
    comparison on the CONSECUTIVE previous calendar day (a gap day
    cannot fabricate a signal).  Rows emit only on days whose slow
    frame and whose previous day's slow frame are both FULL.

    Output: (group, day, direction, sf_cents, ss_cents) — one row per
    signal day, direction ∈ {'golden', 'death'}.
    """
    daily = _daily_cents(events, group_col).select(
        "g",
        "d",
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).alias("x"),
        "y",
    )
    wf = Window.partitionBy("g").orderBy("x").rangeBetween(-(fast - 1), 0)
    ws = Window.partitionBy("g").orderBy("x").rangeBetween(-(slow - 1), 0)
    framed = daily.select(
        "g",
        "d",
        "x",
        F.sum("y").over(wf).cast("bigint").alias("sf"),
        F.count(F.lit(1)).over(wf).alias("nf"),
        F.sum("y").over(ws).cast("bigint").alias("ss"),
        F.count(F.lit(1)).over(ws).alias("ns"),
    ).filter((F.col("nf") == fast) & (F.col("ns") == slow))
    # above = 1 iff fast SMA strictly above slow SMA (exact integers)
    cmp_ = framed.select(
        "g",
        "d",
        "x",
        "sf",
        "ss",
        (
            F.col("sf") * F.lit(int(slow)) > F.col("ss") * F.lit(int(fast))
        ).cast("int").alias("above"),
    )
    prev = cmp_.select(
        F.col("g").alias("g2"),
        (F.col("x") + 1).alias("x"),
        F.col("above").alias("above_prev"),
    )
    crossed = cmp_.join(
        prev, (F.col("g") == F.col("g2")) & (cmp_["x"] == prev["x"])
    ).filter(F.col("above") != F.col("above_prev"))
    return crossed.select(
        F.col("g").alias(group_col),
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.when(F.col("above") == 1, F.lit("golden"))
        .otherwise(F.lit("death"))
        .alias("direction"),
        F.col("sf").alias("sf_cents"),
        F.col("ss").alias("ss_cents"),
    )


def jonckheere(
    events: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """Jonckheere–Terpstra test for an ORDERED alternative across the
    groups' daily revenues (groups ordered lexicographically): are the
    k distributions stochastically increasing in group order?  The
    ordered-alternative companion to :func:`kruskal_wallis` (any
    difference) and Page's trend test (ranked blocks) — strictly more
    powerful than KW when the hypothesis IS an ordering.

    ``JT = Σ_{i<j} U_ij`` with ``U_ij = #{a∈i, b∈j: y_a < y_b} +
    ½·ties``.  The doubled statistic ``jt2 = 2·JT`` is an exact BIGINT
    computed WITHOUT any pairwise join: contract to the distinct-value
    grid (value, group → count), take per-group cumulative counts up
    the value order (one window), and fold ``Σ_v Σ_{i<j} (2·cum_i(<v)
    + c_i(v))·c_j(v)`` with the k ordered groups pivoted to columns —
    value-dictionary grain, never data² (the two_hop / distributed-rank
    discipline).  Under H0: ``μ = (N² − Σn_i²)/4`` and the no-tie
    ``σ² = (N²(2N+3) − Σn_i²(2n_i+3))/72``; z is one pinned IEEE tree
    over exact integers (doubled forms, the kruskal_wallis device).

    Output: one row (n_total, n_groups, jt2, mu2, z).
    """
    daily = _daily_cents(events, group_col).select(
        F.col("g"), F.col("y")
    )
    groups = [
        r["g"]
        for r in daily.select("g").distinct().orderBy("g").collect()
    ]  # config-grain collect: k = #event types
    k = len(groups)
    if k < 2:
        return daily.sparkSession.createDataFrame(
            [],
            "n_total bigint, n_groups int, jt2 bigint, mu2 bigint,"
            " z double",
        )
    # distinct-value grid with one count column per ordered group
    grid = (
        daily.groupBy("y")
        .pivot("g", groups)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    cols = [F.col(f"`{g}`").cast("bigint").alias(f"c{i}") for i, g in enumerate(groups)]
    grid = grid.select(F.col("y"), *cols)
    # cum_i(<v): strictly-below cumulative — value-dictionary grain
    # (≤ calendar days × k rows), so the global window is bounded
    wle = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, -1)
    below = [
        F.coalesce(F.sum(f"c{i}").over(wle), F.lit(0)).alias(f"b{i}")
        for i in range(k)
    ]
    g2 = grid.select("*", *below)
    pair_terms = None
    for i in range(k):
        for j in range(i + 1, k):
            term = (
                (F.lit(2) * F.col(f"b{i}") + F.col(f"c{i}"))
                * F.col(f"c{j}")
            )
            pair_terms = term if pair_terms is None else pair_terms + term
    agg = g2.agg(
        F.sum(pair_terms).cast("bigint").alias("jt2"),
        *[F.sum(f"c{i}").cast("bigint").alias(f"n{i}") for i in range(k)],
    )
    n_total = None
    sum_sq = None
    sum_cub = None
    for i in range(k):
        ni = F.col(f"n{i}")
        n_total = ni if n_total is None else n_total + ni
        sq = ni * ni
        sum_sq = sq if sum_sq is None else sum_sq + sq
        cb = sq * (F.lit(2) * ni + F.lit(3))
        sum_cub = cb if sum_cub is None else sum_cub + cb
    res = agg.select(
        n_total.cast("bigint").alias("n_total"),
        F.lit(int(k)).cast("int").alias("n_groups"),
        "jt2",
        # mu2 = 2·μ = (N² − Σn_i²)/2, exact (N² − Σn_i² is always even)
        ((n_total * n_total - sum_sq) / F.lit(2))
        .cast("bigint")
        .alias("mu2"),
        (
            n_total * n_total * (F.lit(2) * n_total + F.lit(3)) - sum_cub
        ).cast("bigint").alias("var72"),
    )
    # z = (jt2 − mu2) / (2·sqrt(var72/72)) — pinned IEEE tree
    return res.select(
        "n_total",
        "n_groups",
        "jt2",
        "mu2",
        F.when(
            F.col("var72") > 0,
            (F.col("jt2") - F.col("mu2")).cast("double")
            / (
                F.lit(2.0)
                * F.sqrt(F.col("var72").cast("double") / F.lit(72.0))
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("z"),
    )


def obv_daily(
    events: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """On-balance volume per group: the running sum of each day's
    activity VOLUME (event count) signed by that day's revenue
    direction — volume-confirms-price, the classic accumulation/
    distribution gauge complementing the price-only momentum family
    (:func:`rsi_daily`, :func:`price_osc`).

    A day contributes ``sign(y_d − y_{d−1}) · v_d`` only when the
    previous CALENDAR day was observed (a gap contributes zero — no
    fabricated direction).  Everything is exact BIGINT: signs from an
    integer comparison on the d−1 grid join, volumes are counts, and
    the cumulative sum is an order-free integer window.

    Output: (group, day, move_sign, volume, obv).
    """
    day = (
        events.select(
            F.col(group_col).alias("g"),
            F.to_date("ts").alias("d"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("g", "d")
        .agg(
            F.sum("cents").alias("y"),
            F.count(F.lit(1)).cast("bigint").alias("v"),
        )
        .select(
            "g",
            "d",
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).alias(
                "x"
            ),
            "y",
            "v",
        )
    )
    prev = day.select(
        F.col("g").alias("g2"), (F.col("x") + 1).alias("x"),
        F.col("y").alias("y_prev"),
    )
    signed = day.join(
        prev,
        (F.col("g") == F.col("g2")) & (day["x"] == prev["x"]),
        "left",
    ).select(
        "g",
        "d",
        day["x"].alias("x"),
        "v",
        F.when(F.col("y_prev").isNull(), F.lit(0))
        .when(F.col("y") > F.col("y_prev"), F.lit(1))
        .when(F.col("y") < F.col("y_prev"), F.lit(-1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("move_sign"),
    )
    w = (
        Window.partitionBy("g")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return signed.select(
        F.col("g").alias(group_col),
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "move_sign",
        F.col("v").alias("volume"),
        F.sum(F.col("move_sign") * F.col("v"))
        .over(w)
        .cast("bigint")
        .alias("obv"),
    )


def capm_beta(
    events: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """Per-group market beta: regress each group's day-over-day revenue
    MOVES against the all-groups ("market") moves — the systematic- vs
    idiosyncratic-variation split (CAPM's slope), the cross-series
    counterpart of :func:`grouped_trend`'s time regression.

    Moves pair only CONSECUTIVE calendar days, and both sides are
    exact BIGINT cents.  ``β = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`` and
    ``α = (Σy − β·Σx)/n`` with every product sum carried in exact
    DECIMAL(38,0) (squared moves overflow BIGINT ~10× above bench
    scale — the icc_reliability lesson applied at design time) —
    numerator and denominator are exactly-represented integers, so β
    is ONE IEEE division in both engines.

    Output: (group, n_days, beta, alpha).
    """
    # the day-grain contraction feeds THREE derivations (market, the
    # group moves, and the group lag side) — persist it or the fact
    # scan re-executes three times
    daily = (
        _daily_cents(events, group_col)
        .select(
            "g",
            F.datediff(
                F.col("d"), F.lit("1970-01-01").cast("date")
            ).alias("x"),
            "y",
        )
        .persist()
    )
    market = daily.groupBy("x").agg(F.sum("y").alias("m"))
    mprev = market.select((F.col("x") + 1).alias("x"), F.col("m").alias("m_prev"))
    dm = market.join(mprev, "x").select(
        "x", (F.col("m") - F.col("m_prev")).alias("dx")
    )
    gprev = daily.select(
        F.col("g").alias("g2"), (F.col("x") + 1).alias("x"),
        F.col("y").alias("y_prev"),
    )
    dg = daily.join(
        gprev, (F.col("g") == F.col("g2")) & (daily["x"] == gprev["x"])
    ).select("g", daily["x"].alias("x"), (F.col("y") - F.col("y_prev")).alias("dy"))
    j = dg.join(dm, "x")
    xdec = F.col("dx").cast("decimal(38,0)")
    ydec = F.col("dy").cast("decimal(38,0)")
    agg = j.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dx").cast("decimal(38,0)").alias("sx"),
        F.sum("dy").cast("decimal(38,0)").alias("sy"),
        F.sum(xdec * xdec).cast("decimal(38,0)").alias("sxx"),
        F.sum(xdec * ydec).cast("decimal(38,0)").alias("sxy"),
    )
    ndec = F.col("n").cast("decimal(38,0)")
    num = (ndec * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "decimal(38,0)"
    )
    den = (ndec * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "decimal(38,0)"
    )
    beta = F.when(
        den != 0, num.cast("double") / den.cast("double")
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n").alias("n_days"),
        beta.alias("beta"),
        (
            (
                F.col("sy").cast("double")
                - beta * F.col("sx").cast("double")
            )
            / F.col("n").cast("double")
        ).alias("alpha"),
    )
