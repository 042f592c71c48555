"""Event-stream product analytics: ordered funnels and cohort retention
(SURVEY.md §2.3 extension surface — the `events` table).

The reference expresses per-user sequential logic as a reduce over the
grouped value list (SURVEY.md M5-M7: `map[user][]event` in RAM); these
operators keep that per-user contract but run it JVM-side: ONE shuffle
on ``user_id``, then higher-order array functions over the per-user
event-time lists — no Python workers, partial aggregation on the
collect, per-task memory bounded by the busiest single user (the same
bound the reference imposes on every reduce key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: default funnel: the fixture's natural conversion path
FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_users(
    events: DataFrame, steps: Sequence[str] = FUNNEL_STEPS
) -> DataFrame:
    """Per-user ordered-funnel times: for steps (s1, s2, ..., sk) compute
    t1 = earliest s1 event, t2 = earliest s2 event STRICTLY after t1,
    ... tk = earliest sk strictly after t(k-1).  A user's funnel depth is
    the number of non-null t columns.

    Single-shuffle design: one ``groupBy(user_id)`` collects each step's
    event-time list (partial-aggregated map-side, so the shuffle carries
    per-user-per-step time arrays, not raw events — the type filter
    prunes every non-step event at the scan).  The sequential "strictly
    after" chain is then per-row ``array_min(filter(...))`` — pure
    whole-stage-codegen expressions, no window, no Python.  Ties between
    different steps at the same microsecond resolve by the strict ``>``
    comparison identically in any engine — no ordering ambiguity.

    Returns ``(user_id, t1..tk)`` with tn null once the chain breaks.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    aggs = [
        # collect_list drops the nulls the when() leaves for other steps
        F.collect_list(
            F.when(F.col("event_type") == s, F.col("ts"))
        ).alias(f"_ts{i}")
        for i, s in enumerate(steps, start=1)
    ]
    per_user = (
        events.filter(F.col("event_type").isin(*steps))
        .groupBy("user_id")
        .agg(*aggs)
    )

    def _earliest_after(arr: Column, prev: Column) -> Column:
        # min over the unordered list — collect_list order never matters
        return F.array_min(F.filter(arr, lambda x: x > prev))

    cols: list[Column] = [F.array_min(F.col("_ts1")).alias("t1")]
    prev = F.array_min(F.col("_ts1"))
    for i in range(2, len(steps) + 1):
        nxt = _earliest_after(F.col(f"_ts{i}"), prev)
        cols.append(nxt.alias(f"t{i}"))
        prev = nxt
    return per_user.select("user_id", *cols)


def funnel_counts(
    events: DataFrame, steps: Sequence[str] = FUNNEL_STEPS
) -> DataFrame:
    """One-row funnel summary: how many users reached each step in
    order.  Column ``users_<step>`` counts users whose chain extends at
    least that far; counts are non-increasing along the funnel.  The
    final aggregate is a count of non-nulls over the per-user table —
    a second (1-row) reduction after :func:`funnel_users`' single
    shuffle.
    """
    per_user = funnel_users(events, steps)
    return per_user.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"users_{s}")
            for i, s in enumerate(steps, start=1)
        ]
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort-retention matrix: users grouped by first-activity
    date, counted as active in each 7-day offset bucket they return in.

    Two narrow shuffles: (1) the distinct (user, activity-date) grid —
    events collapse to at most #users × #days rows at the scan's
    partial-distinct, (2) per-user first date, joined back on user_id
    and re-aggregated to the cohort × offset grain.  All date math is
    integer day arithmetic (floor of day-diff / 7) — engine-exact; the
    cohort label is a formatted string so the column round-trips every
    engine's date repr identically.
    """
    days = events.select("user_id", F.to_date("ts").alias("d")).distinct()
    first = days.groupBy("user_id").agg(F.min("d").alias("cohort_d"))
    return (
        days.join(first, "user_id")
        .select(
            F.date_format("cohort_d", "yyyy-MM-dd").alias("cohort_date"),
            F.floor(F.datediff(F.col("d"), F.col("cohort_d")) / 7)
            .cast("bigint")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_date", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


def last_touch_attribution(events: DataFrame) -> DataFrame:
    """Last-touch attribution: every purchase credits the user's most
    recent PRECEDING non-purchase event; purchases with no prior touch
    credit ``direct``.  Output is the credit tally per source type.

    The self-as-of lookup needs no join at all: one window per user
    ordered by (ts, event_id) — the unique event id breaks timestamp
    ties so the frame order is total — and ``last(ignorenulls)`` over
    the UNBOUNDED..-1 frame picks the nearest earlier touch.  One
    shuffle on user_id; partition height is the user's event history
    (the same per-key bound the reference's grouped reduce imposes).
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        events.withColumn("source_type", touch)
        .filter(F.col("event_type") == "purchase")
        .select(F.coalesce("source_type", F.lit("direct")).alias("source_type"))
        .groupBy("source_type")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition counts: how often each event type
    follows each other type within a user's history —
    ``(prev_type, next_type, n)``.

    One window per user ordered by the total (ts, event_id) key gives
    every event its predecessor via ``lag`` — a single shuffle on
    user_id, then an ordinary #types² aggregate.  The totally-ordered
    tie-break makes the transition sequence (and the counts) identical
    in any engine.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def position_attribution(events: DataFrame) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: each purchase
    closes a *journey* (the touches since the user's previous purchase);
    within a journey the first and last touch earn 40% each and the
    middles split the remaining 20% — the standard marketing-credit
    model beyond :func:`last_touch_attribution`'s winner-takes-all.

    Credits are integer MICRO-units (parts-per-million), so every rule is
    exact integer arithmetic with no float in sight: k=1 → 1e6, k=2 →
    5e5 each, k≥3 → 4e5 / ``200000 div (k-2)`` / 4e5 (the middle share
    truncates — at most k−2 micro-units per journey evaporate,
    documented, deterministic, and identical cross-engine; banker's
    redistribution would need a remainder cascade for no analytic gain).
    Purchases with an empty journey credit ``direct``.

    Shape: journey segmentation is one per-user window (count of
    preceding purchases — same single shuffle as sessionize), journey
    size/position one more window at the same partitioning (no second
    shuffle: same key), and the tally is a map-side-combined aggregate
    on source_type.  The final ``sum(micros)/1e6`` is the protocol's one
    IEEE division.
    """
    w_hist = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_journey = events.withColumn(
        "journey",
        F.count(F.when(F.col("event_type") == "purchase", 1)).over(w_hist),
    )
    touches = with_journey.filter(F.col("event_type") != "purchase")
    purchases = with_journey.filter(F.col("event_type") == "purchase").select(
        "user_id", "journey"
    )
    w_j = Window.partitionBy("user_id", "journey").orderBy("ts", "event_id")
    sized = (
        touches.join(purchases, ["user_id", "journey"], "left_semi")
        .withColumn("pos", F.row_number().over(w_j))
        .withColumn("k", F.count(F.lit(1)).over(
            Window.partitionBy("user_id", "journey")
        ))
    )
    micros = (
        F.when(F.col("k") == 1, F.lit(1_000_000))
        .when(F.col("k") == 2, F.lit(500_000))
        .when(F.col("pos") == 1, F.lit(400_000))
        .when(F.col("pos") == F.col("k"), F.lit(400_000))
        .otherwise(F.expr("200000 div (k - 2)"))
    )
    credited = sized.select(
        F.col("event_type").alias("source_type"), micros.alias("micros")
    )
    direct = (
        with_journey.filter(F.col("event_type") == "purchase")
        .join(
            touches.select("user_id", "journey").distinct(),
            ["user_id", "journey"],
            "left_anti",
        )
        .select(
            F.lit("direct").alias("source_type"),
            F.lit(1_000_000).alias("micros"),
        )
    )
    return (
        credited.unionByName(direct)
        .groupBy("source_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            (F.sum("micros").cast("double") / F.lit(1e6)).alias("credit"),
        )
    )


def event_dedup(events: DataFrame, window_seconds: int = 60) -> DataFrame:
    """Windowed duplicate-event suppression (debounce): collapse bursts
    of the same ``(user_id, event_type)`` arriving within
    ``window_seconds`` of each other to their FIRST event, reporting how
    many repeats were suppressed — the bot-click / double-fire cleanup
    every clickstream pipeline runs before counting anything.

    Semantics are gaps-and-islands (the same machinery as
    :func:`~p2_mapreduce_spark.streaming.events.assign_sessions`): a new
    island starts when the gap from the PREVIOUS event exceeds the
    window, so a long burst collapses to one survivor however long it
    lasts (a plain ``lag > N`` filter would re-admit every other event
    of a steady burst).  Tie-break on ``(ts, event_id)`` keeps the
    election deterministic; gap arithmetic is timestamp subtraction
    (exact day-time interval, NTZ-safe).

    One shuffle on ``(user_id, event_type)``; both windows and the
    groupBy reuse that partitioning.  Returns the surviving events as
    ``(event_id, user_id, event_type, ts, n_suppressed)``."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    brk = (
        (
            F.col("ts") - F.lag("ts", 1).over(w)
            > F.expr(f"INTERVAL '{int(window_seconds)}' SECOND")
        )
        .cast("int")
    )
    islands = events.withColumn(
        "island",
        F.sum(F.coalesce(brk, F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    first = F.min(F.struct("ts", "event_id"))
    return (
        islands.groupBy("user_id", "event_type", "island")
        .agg(
            first.alias("f"),
            (F.count(F.lit(1)) - 1).alias("n_suppressed"),
        )
        .select(
            F.col("f.event_id").alias("event_id"),
            "user_id",
            "event_type",
            F.col("f.ts").alias("ts"),
            "n_suppressed",
        )
    )


def ab_conversion(events: DataFrame, convert_type: str = "purchase") -> DataFrame:
    """Deterministic A/B experiment readout: users split into variants by
    an md5 coin on ``user_id`` (the same user ALWAYS lands in the same
    arm — reproducible across runs, snapshots, and engines, unlike an
    RNG split), conversion = reaching ``convert_type`` at least once;
    output is the 2×2 table plus rates and the Pearson χ² statistic.

    Shape at 100 TB: two user-grain distincts (exposed, converted) whose
    partial aggregates collapse map-side; the converter flag comes from
    one left join on user_id; everything after is a single-row
    conditional aggregate — no variant shuffle, no pivot.

    Arithmetic: counts are exact BIGINTs; ``ad − bc`` and the margin
    products stay in BIGINT (exact); χ² and rates are one pinned IEEE
    tree mirrored in the oracle, so the statistic is bit-identical
    cross-engine.  (The χ² → p-value CDF is deliberately out of scope:
    no IEEE-pinned erf/gamma exists across engines — compare χ² against
    3.841 for the usual α=0.05, 1 dof.)"""
    coin = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 18, 15), 16, 10)
        .cast("long")
        % 2
    )
    exposed = events.select("user_id").distinct()
    converted = (
        events.filter(F.col("event_type") == convert_type)
        .select("user_id")
        .distinct()
        .withColumn("conv", F.lit(1))
    )
    tagged = (
        exposed.join(converted, "user_id", "left")
        .select(
            coin.alias("arm"),
            F.coalesce("conv", F.lit(0)).cast("bigint").alias("conv"),
        )
    )
    cells = tagged.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias("conv_b"),
    )
    # a=conv_a b=miss_a c=conv_b d=miss_b; chi2 = N(ad-bc)^2 / margins
    return cells.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.expr("cast(conv_a as double) / cast(n_a as double)").alias("rate_a"),
        F.expr("cast(conv_b as double) / cast(n_b as double)").alias("rate_b"),
        F.expr(
            "CASE WHEN n_a > 0 AND n_b > 0"
            " AND conv_a + conv_b > 0"
            " AND (n_a - conv_a) + (n_b - conv_b) > 0 THEN"
            " cast(n_a + n_b as double)"
            " * cast(conv_a * (n_b - conv_b) - (n_a - conv_a) * conv_b as double)"
            " * cast(conv_a * (n_b - conv_b) - (n_a - conv_a) * conv_b as double)"
            " / (cast(n_a * n_b as double)"
            "    * cast((conv_a + conv_b)"
            "           * ((n_a - conv_a) + (n_b - conv_b)) as double))"
            " END"
        ).alias("chi2"),
    )


def conversion_lag(
    events: DataFrame, from_type: str = "view", to_type: str = "purchase"
) -> DataFrame:
    """Time-to-convert distribution: per user, the lag from the FIRST
    ``from_type`` event to the first ``to_type`` event strictly after
    it, summarized as ONE row — ``(n_users, n_converted, p50_lag_s,
    p90_lag_s)``.

    Reuses :func:`funnel_users`' single-shuffle step machinery for the
    per-user (t1, t2) pair; lags are exact integer seconds, and the
    percentiles are Spark's exact type-R7 interpolation — the same
    cross-engine-pinned estimator as relational.approx_quantiles — over
    the converted-user lag set (user grain, already contracted).  At
    100 TB swap the exact percentile for profile.hist_state — the input
    grain (one lag per converted user) is unchanged.
    """
    fu = funnel_users(events, [from_type, to_type])
    # exact µs difference floored to whole seconds: timestampdiff
    # truncates intervals while some engines count boundary CROSSINGS —
    # the integer-µs div is the one formulation every engine agrees on
    lags = fu.select(
        F.col("t1"),
        F.expr(
            "(unix_micros(cast(t2 as timestamp))"
            " - unix_micros(cast(t1 as timestamp))) div 1000000"
        ).alias("lag_s"),
    )
    pct = F.array(F.lit(0.5), F.lit(0.9))
    return lags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count("lag_s").cast("bigint").alias("n_converted"),
        F.percentile("lag_s", pct).alias("_p"),
    ).select(
        "n_users",
        "n_converted",
        F.col("_p")[0].alias("p50_lag_s"),
        F.col("_p")[1].alias("p90_lag_s"),
    )


def activity_islands(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Gaps-and-islands: each user's maximal runs of CONSECUTIVE active
    days — streak analytics (retention/engagement reporting).  The
    classic trick stays one pass: distinct (user, day), then
    ``day - row_number()`` inside the user is constant exactly along a
    consecutive run, so grouping on that anchor yields the islands.

    The window partitions by user — parallel across users, bounded by
    days-per-user within (≤ a few thousand for any real retention
    window), the shape window functions are designed for.  Output:
    (user_id, start_day, end_day, n_days) as 'yyyy-MM-dd' strings
    (engine-portable date surface).
    """
    days = (
        events.select(F.col(user_col), F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy(user_col).orderBy("day")
    anchored = days.withColumn(
        "anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    return (
        anchored.groupBy(user_col, "anchor")
        .agg(
            F.date_format(F.min("day"), "yyyy-MM-dd").alias("start_day"),
            F.date_format(F.max("day"), "yyyy-MM-dd").alias("end_day"),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
        )
        .drop("anchor")
    )


def daily_new_returning(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Daily active users split into new vs returning, plus cumulative
    reach — the growth-accounting readout every event pipeline serves.

    One distinct to (user, day) grain, first-seen via a per-user MIN
    (map-side combined), one day-grain aggregate; the cumulative-reach
    window runs over the DAY-grain table (grain-bounded, like the
    calendar rollups).  The user-day distinct is the only data-sized
    shuffle; at 100 TB swap the exact distinct for the daily-HLL state
    table (wau_hll) with identical downstream shape.

    Output: (day, n_active, n_new, n_returning, cum_users) with day as
    'yyyy-MM-dd' (engine-portable date surface).
    """
    days = (
        events.select(F.col(user_col).alias("u"), F.to_date("ts").alias("d"))
        .distinct()
    )
    first_seen = days.groupBy("u").agg(F.min("d").alias("first_d"))
    per_day = (
        days.join(first_seen, "u")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active"),
            F.sum(F.when(F.col("d") == F.col("first_d"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_day.withColumn("cum_users", F.sum("n_new").over(w).cast("bigint"))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n_active",
            (F.col("n_active") - F.col("n_new")).alias("n_returning"),
            "n_new",
            "cum_users",
        )
    )


#: Wilson 95% score-interval formula trees, SHARED verbatim between the
#: Spark side (F.expr) and the DuckDB oracle (f-string) — the OLS2_*
#: device.  Inputs: columns ``p`` (success fraction, DOUBLE) and ``n``
#: (trial count, DOUBLE).  Every literal is written in e-notation so
#: BOTH engines parse it as DOUBLE (DuckDB reads bare ``1.96`` as
#: DECIMAL and would compute a different — exact-decimal — tree); z is
#: spelled as the product ``1.96e0 * 1.96e0`` rather than ``3.8416`` so
#: z² is the same correctly-rounded double product on both sides.
#: +, *, /, sqrt are each IEEE-correctly-rounded in both engines, so an
#: identical parse tree gives bit-identical results.
_WILSON_Z2 = "(1.96e0 * 1.96e0)"
WILSON_CENTER = (
    f"((p + {_WILSON_Z2} / (2.0e0 * n)) / (1.0e0 + {_WILSON_Z2} / n))"
)
WILSON_HALF = (
    f"((1.96e0 * sqrt(p * (1.0e0 - p) / n + {_WILSON_Z2} / (4.0e0 * n * n)))"
    f" / (1.0e0 + {_WILSON_Z2} / n))"
)


def wilson_ci(events: DataFrame, success_min: float = 10.0) -> DataFrame:
    """Per-event-type success-rate readout with the Wilson 95% score
    interval — the binomial CI that stays inside [0,1] and behaves at
    small n and extreme p̂, which is why metric pipelines report it
    instead of the naive normal interval (p̂ ± z√(p̂(1−p̂)/n) is wider
    than [0,1] exactly when you need it most).

    Success = ``value >= success_min`` (an exact double comparison).

    Shape at 100 TB: one map-side-combined conditional aggregate at
    event_type grain — no shuffle of the fact table beyond the hash
    exchange on the (tiny) type key; the interval arithmetic runs on
    the #types-row aggregate.  Counts are exact BIGINTs; the interval
    is one pinned IEEE tree (:data:`WILSON_CENTER` /
    :data:`WILSON_HALF`) mirrored verbatim in the oracle, so the bounds
    are bit-identical cross-engine (sqrt is IEEE-correctly-rounded in
    both engines).
    """
    per = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum(F.when(F.col("value") >= success_min, 1).otherwise(0))
        .cast("bigint")
        .alias("n_success"),
    )
    base = per.select(
        "event_type",
        "n_obs",
        "n_success",
        (F.col("n_success").cast("double") / F.col("n_obs").cast("double")).alias(
            "p"
        ),
        F.col("n_obs").cast("double").alias("n"),
    )
    return base.select(
        "event_type",
        "n_obs",
        "n_success",
        F.col("p").alias("phat"),
        F.expr(f"{WILSON_CENTER} - {WILSON_HALF}").alias("wilson_lo"),
        F.expr(f"{WILSON_CENTER} + {WILSON_HALF}").alias("wilson_hi"),
    )


def decayed_engagement(events: DataFrame, max_age: int = 40) -> DataFrame:
    """Per-user exponentially time-decayed engagement score with a
    ONE-DAY half-life in exact integer arithmetic: each event
    contributes ``value · 2^(−age_days)`` where age is measured back
    from the newest event date in the table — the recency-weighted
    score feeds ranking, churn triage, and sample weighting, and decay
    with a power-of-two base is the trick that keeps it bit-exact: the
    contribution is computed as ``(cents · 10⁴) div 2^age`` in BIGINT
    (truncating integral quotient — identical in Spark ``div`` and
    DuckDB ``//`` for non-negative operands), summed exactly, and
    divided by 10⁶ once at the surface.  No float accumulates across
    rows, so the result is independent of partitioning, engine, and
    summation order (the unordered-float-sum hazard).  Events older
    than ``max_age`` days contribute exactly 0 (their quotient
    underflows anyway at 10⁴ micro-units).

    Shape at 100 TB: the anchor date is a one-row broadcast aggregate;
    the score is one map-side-combined SUM at user grain — a single
    hash exchange on ``user_id``.
    """
    anchor = events.agg(F.max(F.to_date("ts")).alias("anchor_d"))
    aged = events.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.datediff(F.col("anchor_d"), F.to_date("ts")).alias("age"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    term = F.expr(
        f"CASE WHEN age <= {int(max_age)} THEN (cents * 10000)"
        " div shiftleft(CAST(1 AS BIGINT), age) ELSE CAST(0 AS BIGINT) END"
    )
    return (
        aged.select("user_id", term.alias("term"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("term").cast("bigint").alias("decayed_micro"),
        )
        .select(
            "user_id",
            "n_events",
            "decayed_micro",
            (F.col("decayed_micro").cast("double") / F.lit(1000000.0)).alias(
                "decayed_value"
            ),
        )
    )


def audience_overlap(events: DataFrame) -> DataFrame:
    """Pairwise AUDIENCE overlap between event types: for each type
    pair, how many distinct users did both, either, and the Jaccard —
    the segment-overlap matrix behind "should these two features share
    a funnel?".

    Shape at 100 TB: the fact table collapses to distinct (user, type)
    in one map-side-combined aggregate; pair generation happens INSIDE
    each user's type set (``n_types``² per user, with n_types bounded
    by the type vocabulary — never a users×users or fact-table
    self-join); per-type audience sizes broadcast back onto the
    #type-pairs-row result.  All counts exact BIGINTs, Jaccard one IEEE
    division.
    """
    ut = events.select("user_id", "event_type").distinct()
    per_type = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_aud")
    )
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    both = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    pa = per_type.select(
        F.col("event_type").alias("type_a"), F.col("n_aud").alias("n_a")
    )
    pb = per_type.select(
        F.col("event_type").alias("type_b"), F.col("n_aud").alias("n_b")
    )
    return (
        both.join(F.broadcast(pa), "type_a")
        .join(F.broadcast(pb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double")
            ).alias("jaccard"),
        )
    )


def funnel_windowed(
    events: DataFrame,
    steps: Sequence[str] = FUNNEL_STEPS,
    window_hours: int = 24,
) -> DataFrame:
    """Conversion funnel with a CONVERSION WINDOW (the Amplitude/Mixpanel
    default): every later step must land strictly after the previous one
    AND within ``window_hours`` of the user's FIRST step-1 event.
    :func:`funnel_counts` answers "ever converted, in order"; this
    answers "converted in order within T" — the form used for campaign
    and session funnels.

    Semantics are the deterministic greedy chain (earliest qualifying
    event per step, ties broken by the strict ``>`` at µs grain), with
    the window cutoff ``t1 + T`` applied to every step — so a user whose
    only click comes 25 h after the first view drops at step 2 even if
    a purchase follows.

    Scale shape: identical to :func:`funnel_users` — the type filter
    prunes non-step events at the scan, ONE shuffle on user_id carries
    per-step time arrays (map-side partial-aggregated), the chain is
    whole-stage-codegen array math, and the funnel table is a 1-row
    aggregate exploded to #steps rows.  Timestamp arithmetic is exact
    integer-µs (NTZ + INTERVAL hour), bit-identical cross-engine; the
    conversion rate is ONE double division per row.

    Returns ``(step, step_name, n_users, pct_of_first)`` ordered by
    funnel position, ``pct_of_first`` NULL when step 1 is empty.

    Reference parity: per-key reduce over grouped values (SURVEY.md
    M5-M7); the window constraint is pure per-key logic the reference
    would run inside its reduce fn.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    aggs = [
        F.collect_list(
            F.when(F.col("event_type") == s, F.col("ts"))
        ).alias(f"_ts{i}")
        for i, s in enumerate(steps, start=1)
    ]
    per_user = (
        events.filter(F.col("event_type").isin(*steps))
        .groupBy("user_id")
        .agg(*aggs)
    )
    t1 = F.array_min(F.col("_ts1"))
    limit = F.expr(
        f"array_min(_ts1) + INTERVAL '{int(window_hours)}' HOUR"
    )
    def _qualifying(arr: Column, prev: Column) -> Column:
        # bind prev via closure — F.filter treats a 2-arg lambda as
        # (element, index), so defaults can't be used to capture it
        return F.array_min(
            F.filter(arr, lambda x: (x > prev) & (x <= limit))
        )

    cols: list[Column] = [t1.alias("t1")]
    prev = t1
    for i in range(2, len(steps) + 1):
        nxt = _qualifying(F.col(f"_ts{i}"), prev)
        cols.append(nxt.alias(f"t{i}"))
        prev = nxt
    chained = per_user.select(*cols)
    counts = chained.agg(
        *[
            F.count(F.col(f"t{i}")).cast("bigint").alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    stack_args = ", ".join(
        f"{i}, '{s}', n{i}" for i, s in enumerate(steps, start=1)
    )
    return counts.select(
        F.expr(
            f"stack({len(steps)}, {stack_args}) AS (step, step_name, n_users)"
        ),
        F.col("n1").alias("_n1"),
    ).select(
        F.col("step").cast("bigint").alias("step"),
        "step_name",
        "n_users",
        F.when(
            F.col("_n1") > 0,
            F.col("n_users").cast("double") / F.col("_n1").cast("double"),
        ).alias("pct_of_first"),
    )


def ab_quantile_diff(
    events: DataFrame, metric_type: str = "purchase"
) -> DataFrame:
    """A/B QUANTILE treatment effect: the difference of arm MEDIANS of
    the ``metric_type`` event value — the robust companion of
    :func:`ab_conversion`'s rate readout (median shifts survive the
    revenue outliers that drag means; the standard experiment guardrail
    pair is rate + median).

    Arms are the same deterministic md5 coin on ``user_id`` as
    :func:`ab_conversion` — a user is ALWAYS in the same arm across
    both readouts, engines, and reruns.

    The per-arm median is an EXACT order statistic over cents: the
    TWO-PHASE distributed rank (range-repartition by (arm, cents, id),
    within-partition row_number, #partitions×2 offset table broadcast
    back — no single task ever sorts an arm, the quality_calibration
    lesson), then ranks ⌈n/2⌉ and ⌈(n+1)/2⌉ picked and averaged with
    ONE pinned division: ``median = cast(lo + hi as double) / 200.0``
    (cents → value units folded into the same tree, mirrored verbatim
    in the oracle — no percentile() interpolation-tree hazard).

    Returns one row ``(n_a, n_b, median_a, median_b, median_diff)``;
    an empty arm surfaces NULLs, never a crash.

    Reference parity: per-key reduce + the M6/M9 sort surface
    (SURVEY.md §2.2) re-expressed as a distributed rank.
    """
    coin = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 18, 15), 16, 10
        ).cast("long")
        % 2
    )
    t = (
        events.filter(F.col("event_type") == metric_type)
        .select(
            coin.alias("arm"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
            F.col("event_id").alias("id"),
        )
        .repartitionByRange(F.col("arm"), F.col("cents"), F.col("id"))
        .withColumn("pid", F.spark_partition_id())
    )
    w_in = Window.partitionBy("pid", "arm").orderBy("cents", "id")
    t = t.withColumn("rn", F.row_number().over(w_in))
    per = t.groupBy("pid", "arm").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("arm")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("pid", "arm", "off")
    totals = per.groupBy("arm").agg(F.sum("cnt").cast("bigint").alias("n"))
    ranked = (
        t.join(F.broadcast(offsets), ["pid", "arm"])
        .join(F.broadcast(totals), "arm")
        .select("arm", "cents", "n", (F.col("off") + F.col("rn")).alias("r"))
    )
    mids = ranked.filter(
        (F.col("r") == F.expr("(n + 1) div 2"))
        | (F.col("r") == F.expr("(n + 2) div 2"))
    )
    per_arm = mids.groupBy("arm", "n").agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    one = per_arm.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 0, F.col("lo"))).alias("lo_a"),
        F.max(F.when(F.col("arm") == 0, F.col("hi"))).alias("hi_a"),
        F.max(F.when(F.col("arm") == 1, F.col("lo"))).alias("lo_b"),
        F.max(F.when(F.col("arm") == 1, F.col("hi"))).alias("hi_b"),
    )
    return one.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.expr("cast(lo_a + hi_a as double) / 200.0e0").alias("median_a"),
        F.expr("cast(lo_b + hi_b as double) / 200.0e0").alias("median_b"),
        F.expr(
            "cast(lo_b + hi_b as double) / 200.0e0"
            " - cast(lo_a + hi_a as double) / 200.0e0"
        ).alias("median_diff"),
    )


def activity_histogram(events: DataFrame) -> DataFrame:
    """Engagement-depth distribution: how many users were active on
    exactly d distinct days — the L28-style power-user curve product
    teams read before/after launches (the x-axis of "how sticky is
    this product"), complementing :func:`daily_new_returning` (time
    axis) and :func:`cohort_retention` (cohort axis).

    Two map-side-collapsing aggregates: events → distinct (user, day)
    grid → per-user day count → histogram at day-count grain (≤
    #calendar-days rows).  Share is floor-ppm exact integer; no
    windows, no joins.

    Returns ``(n_active_days, n_users, share_ppm)``.
    """
    days = events.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    per_user = days.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_active_days")
    )
    hist = per_user.groupBy("n_active_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    total = per_user.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return (
        hist.join(F.broadcast(total))
        .select(
            F.col("n_active_days").cast("bigint").alias("n_active_days"),
            "n_users",
            F.expr("(n_users * 1000000) div n_total").alias("share_ppm"),
        )
    )


def cuped_adjust(
    events: DataFrame,
    split_date: str = "2024-01-16",
    metric_type: str = "purchase",
) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al., WSDM'13 — the
    industry-standard experiment sensitivity booster): each user's
    POST-period metric is adjusted by their PRE-period baseline,
    ``adj = post − θ·(pre − mean(pre))``, with θ = cov(pre, post) /
    var(pre) estimated POOLED across arms.  Same md5-coin arms as
    :func:`ab_conversion` / :func:`ab_quantile_diff`, so the three
    readouts describe one experiment.

    Exactness: per-user pre/post cents are exact BIGINTs (users with no
    pre-period activity contribute pre = 0 — no silent drop bias);
    the five sufficient statistics (n, Σx, Σy, Σxy, Σx²) accumulate in
    DECIMAL(38,0) after widening BEFORE multiplication, θ and every
    mean are single pinned IEEE trees, and ``rho2`` (the variance-
    reduction fraction 1 − Var(adj)/Var(post)) is the same exact-int
    correlation-squared tree as :func:`timeseries.grouped_trend`'s R².
    Degenerate pre-period variance (all-equal baselines) surfaces
    θ = NULL and the unadjusted means.

    Scale: events collapse once to user grain (map-side combined); the
    pooled stats are a one-row broadcast; per-arm adjusted means are a
    2-row conditional aggregate.  Returns one row per arm:
    ``(arm, n_users, mean_post, mean_adjusted, theta, rho2)``.
    """
    coin = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 18, 15), 16, 10
        ).cast("long")
        % 2
    )
    cents = F.floor(F.col("value") * 100).cast("bigint")
    split = F.lit(split_date).cast("timestamp_ntz")
    per_user = (
        events.filter(F.col("event_type") == metric_type)
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < split, cents).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("ts") >= split, cents).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
        .select(coin.alias("arm"), "x", "y")
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(
            (F.col("x").cast("decimal(19,0)") * F.col("y")).cast(
                "decimal(38,0)"
            )
        ).alias("sxy"),
        F.sum(
            (F.col("x").cast("decimal(19,0)") * F.col("x")).cast(
                "decimal(38,0)"
            )
        ).alias("sxx"),
        F.sum(
            (F.col("y").cast("decimal(19,0)") * F.col("y")).cast(
                "decimal(38,0)"
            )
        ).alias("syy"),
    )
    theta = F.when(
        (
            F.col("n").cast("double") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )
        != 0,
        (
            F.col("n").cast("double") * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double")
        )
        / (
            F.col("n").cast("double") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        ),
    )
    rho2 = F.when(
        (
            (
                F.col("n").cast("double") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
            != 0
        )
        & (
            (
                F.col("n").cast("double") * F.col("syy").cast("double")
                - F.col("sy").cast("double") * F.col("sy").cast("double")
            )
            != 0
        ),
        (
            F.col("n").cast("double") * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double")
        )
        * (
            F.col("n").cast("double") * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double")
        )
        / (
            (
                F.col("n").cast("double") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
            * (
                F.col("n").cast("double") * F.col("syy").cast("double")
                - F.col("sy").cast("double") * F.col("sy").cast("double")
            )
        ),
    )
    stats = pooled.select(
        theta.alias("theta"),
        rho2.alias("rho2"),
        F.expr("cast(sx as double) / cast(n as double)").alias("mean_x_all"),
    )
    per_arm = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("asy"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("asx"),
    )
    return (
        per_arm.join(F.broadcast(stats))
        .select(
            F.col("arm").cast("bigint").alias("arm"),
            "n_users",
            F.expr("cast(asy as double) / cast(n_users as double)").alias(
                "mean_post"
            ),
            (
                F.expr("cast(asy as double) / cast(n_users as double)")
                - F.coalesce(F.col("theta"), F.lit(0.0))
                * (
                    F.expr("cast(asx as double) / cast(n_users as double)")
                    - F.col("mean_x_all")
                )
            ).alias("mean_adjusted"),
            "theta",
            "rho2",
        )
    )


def did_effect(
    events: DataFrame,
    split_date: str = "2024-01-16",
    metric_type: str = "purchase",
) -> DataFrame:
    """Difference-in-differences readout: the 2×2 (arm × period) mean
    grid and the DiD estimator ``(B_post − B_pre) − (A_post − A_pre)``
    — the quasi-experimental effect estimate when the split is not
    randomized-at-once (staggered rollouts, geo launches), completing
    the experimentation family (rate: :func:`ab_conversion`, median:
    :func:`ab_quantile_diff`, variance-reduced mean:
    :func:`cuped_adjust`).

    Same md5 arms and calendar split as :func:`cuped_adjust`.  The
    whole computation is ONE map-side-combined conditional aggregate
    over exact cents (four sums + four counts); each cell mean and the
    estimator are pinned IEEE trees over exact BIGINTs.  An empty cell
    surfaces NULL (no silent zero).

    Returns one row: ``(mean_a_pre, mean_a_post, mean_b_pre,
    mean_b_post, did_cents)``.
    """
    coin = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 18, 15), 16, 10
        ).cast("long")
        % 2
    )
    cents = F.floor(F.col("value") * 100).cast("bigint")
    split = F.lit(split_date).cast("timestamp_ntz")
    tagged = events.filter(F.col("event_type") == metric_type).select(
        coin.alias("arm"),
        (F.col("ts") >= split).alias("post"),
        cents.alias("c"),
    )

    def cell(arm, post):
        cond = (F.col("arm") == arm) & (F.col("post") == post)
        s = F.sum(F.when(cond, F.col("c")).otherwise(0)).cast("decimal(38,0)")
        n = F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")
        return s, n

    sa0, na0 = cell(0, False)
    sa1, na1 = cell(0, True)
    sb0, nb0 = cell(1, False)
    sb1, nb1 = cell(1, True)
    one = tagged.agg(
        sa0.alias("sa0"), na0.alias("na0"),
        sa1.alias("sa1"), na1.alias("na1"),
        sb0.alias("sb0"), nb0.alias("nb0"),
        sb1.alias("sb1"), nb1.alias("nb1"),
    )

    def mean(s, n):
        return F.when(
            F.col(n) > 0,
            F.col(s).cast("double") / F.col(n).cast("double"),
        )

    m_a0, m_a1 = mean("sa0", "na0"), mean("sa1", "na1")
    m_b0, m_b1 = mean("sb0", "nb0"), mean("sb1", "nb1")
    return one.select(
        m_a0.alias("mean_a_pre"),
        m_a1.alias("mean_a_post"),
        m_b0.alias("mean_b_pre"),
        m_b1.alias("mean_b_post"),
        ((m_b1 - m_b0) - (m_a1 - m_a0)).alias("did_cents"),
    )


def funnel_lag(
    events: DataFrame, steps: Sequence[str] = FUNNEL_STEPS
) -> DataFrame:
    """Time-IN-funnel: the exact median gap between consecutive funnel
    steps, per step pair — the "where do users stall" companion to
    :func:`funnel_counts` (how many) and :func:`funnel_windowed`
    (how many within T); medians, not means, because abandonment tails
    are heavy by construction.

    Gaps come from :func:`funnel_users`' greedy chains (one user_id
    shuffle); the per-pair median is the TWO-PHASE distributed rank
    over (pair, gap, user) — user-grain input, no single-task sort —
    with the doubled-median trick keeping the result an exact BIGINT
    (``median_x2_us``; consumers halve it).

    Returns ``(step_pair, n_users, median_x2_us)`` in funnel order.
    """
    per_user = funnel_users(events, steps)
    gaps = None
    for i in range(2, len(steps) + 1):
        pair = (
            per_user.filter(F.col(f"t{i}").isNotNull())
            .select(
                F.lit(f"{steps[i - 2]}->{steps[i - 1]}").alias("p"),
                F.expr(
                    f"timestampdiff(MICROSECOND, t{i - 1}, t{i})"
                ).alias("gap"),
                F.col("user_id").alias("id"),
            )
        )
        gaps = pair if gaps is None else gaps.unionByName(pair)
    t = gaps.repartitionByRange(
        F.col("p"), F.col("gap"), F.col("id")
    ).withColumn("pid", F.spark_partition_id())
    w_in = Window.partitionBy("pid", "p").orderBy("gap", "id")
    t = t.withColumn("rn", F.row_number().over(w_in))
    per = t.groupBy("pid", "p").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.partitionBy("p")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("pid", "p", "off")
    totals = per.groupBy("p").agg(F.sum("cnt").cast("bigint").alias("n"))
    ranked = (
        t.join(F.broadcast(offsets), ["pid", "p"])
        .join(F.broadcast(totals), "p")
        .select("p", "gap", "n", (F.col("off") + F.col("rn")).alias("r"))
    )
    mids = ranked.filter(
        (F.col("r") == F.expr("(n + 1) div 2"))
        | (F.col("r") == F.expr("(n + 2) div 2"))
    )
    return (
        mids.groupBy("p", "n")
        .agg((F.min("gap") + F.max("gap")).cast("bigint").alias("median_x2_us"))
        .select(
            F.col("p").alias("step_pair"),
            F.col("n").alias("n_users"),
            "median_x2_us",
        )
    )


def life_table(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """User-lifetime life table (Kaplan-Meier survival, churn hazard):
    for each observed lifetime t (days between a user's first and last
    event), the users still at risk, the users whose lifetime ends at
    exactly t, the discrete hazard d(t)/n(t), and the survival curve —
    the retention statistic actuarial/churn teams read, complementing
    :func:`cohort_retention` (activity by calendar week) with
    time-to-event semantics.

    With a CLOSED extract every lifetime is fully observed (no right
    censoring), so Kaplan-Meier telescopes to the EXACT rational
    ``S(t) = |lifetime > t| / N`` — no per-step product, no ln, no
    float accumulation; hazard and survival are each one IEEE division
    floor-quantized to ppm.  (A live extract would add a censored
    column and the product-limit form; the at-risk/event columns here
    are exactly its inputs.)

    Shape at 100 TB: one user-grain aggregate (map-side combined
    min/max), one lifetime-grain count, then all windows run at
    OBSERVED-LIFETIME grain — bounded by the observation window in
    days, never by users or events.

    Output: (t_days, n_at_risk, n_churn, hazard_ppm, survival_ppm).
    """
    lt = (
        events.select(F.col(user_col).alias("u"), F.to_date("ts").alias("d"))
        .groupBy("u")
        .agg(F.datediff(F.max("d"), F.min("d")).alias("t_days"))
        .groupBy("t_days")
        .agg(F.count(F.lit(1)).alias("n_churn"))
    )
    # day-grain descending cumulative: at-risk(t) = Σ_{t' ≥ t} d(t')
    w_desc = Window.orderBy(F.col("t_days").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.col("t_days").desc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return lt.select(
        F.col("t_days").cast("bigint").alias("t_days"),
        F.sum("n_churn").over(w_desc).cast("bigint").alias("n_at_risk"),
        F.col("n_churn").cast("bigint").alias("n_churn"),
        F.sum("n_churn").over(w_all).alias("n_total"),
    ).select(
        "t_days",
        "n_at_risk",
        "n_churn",
        F.floor(
            F.lit(1_000_000.0) * F.col("n_churn") / F.col("n_at_risk")
        ).cast("bigint").alias("hazard_ppm"),
        F.floor(
            F.lit(1_000_000.0)
            * (F.col("n_at_risk") - F.col("n_churn"))
            / F.col("n_total")
        ).cast("bigint").alias("survival_ppm"),
    )


def seq_pattern(
    events: DataFrame,
    pattern: str = "vc*p",
    type_letters: dict[str, str] | None = None,
) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern detection: per user, order
    the event stream, encode each event type as one letter, and count
    the non-overlapping occurrences of a regex ``pattern`` over the
    resulting string — e.g. the default ``vc*p`` is "a view, any number
    of clicks, then a purchase" (the row-pattern query SQL:2016 added
    and Spark lacks; cf. Flink CEP / Trino MATCH_RECOGNIZE).

    Encoding events as ONE CHARACTER each makes the sequence a string
    and the pattern engine the built-in JVM regex — no state machine in
    Python, no self-join per pattern step, and leftmost-non-overlapping
    match semantics that every regex engine implements identically.

    Plan: one shuffle to (user, ordered letters) — the collect is
    map-side partial-aggregated as (ts, id, letter) structs and sorted
    per row with ``array_sort`` (ties broken by event_id, so the string
    is total-order deterministic).  ``regexp_count`` then runs per row,
    whole-stage codegen.  Per-task memory is bounded by the busiest
    single user — the same per-key contract as funnel_users; at 100 TB
    you'd sessionize first (sessionize()) and match within sessions,
    which this composes with (feed it session-scoped user keys).

    Returns ``(user_id, seq_len, n_matches)`` for users whose stream
    matches at least once.
    """
    letters = type_letters or {
        "click": "c", "error": "e", "purchase": "p", "signup": "s", "view": "v",
    }
    enc = F.create_map(
        *[F.lit(x) for kv in sorted(letters.items()) for x in kv]
    )
    per_user = (
        events.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), enc[F.col("event_type")].alias("ch")
            ).alias("ev"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("ev")).alias("evs"))
        .select(
            "user_id",
            F.concat_ws("", F.transform("evs", lambda e: e["ch"])).alias("seq"),
        )
    )
    return (
        per_user.select(
            "user_id",
            F.length("seq").cast("bigint").alias("seq_len"),
            F.regexp_count("seq", F.lit(pattern)).cast("bigint").alias("n_matches"),
        )
        .filter(F.col("n_matches") > 0)
    )


def cohort_ltv(events: DataFrame, max_age_days: int = 30) -> DataFrame:
    """Cohort lifetime-value curve: users cohorted by FIRST-EVENT day,
    cumulative purchase revenue per cohort by account age — the
    unit-economics payback chart (does week-4 LTV clear acquisition
    cost?).  Complements cohort_retention (presence) with money.

    Exactness: revenue quantizes to BIGINT cents ONCE at the scan and
    stays integral through every aggregate; the cumulative sum surfaces
    as value units via one /100.0 per output row.

    Plan: first-event day = one (user) min-aggregate (map-side
    combined); purchases join the cohort map on user_id (at 100 TB the
    cohort map is user-dictionary-grain — AQE broadcasts it when it
    fits, else it's one hash shuffle); daily cohort revenue contracts
    to (cohort_day, age) grain BEFORE the cumulative window, whose
    partition is one cohort's ≤``max_age_days`` rows — calendar grain,
    the same bounded-window exception as cumulative_revenue.

    Returns ``(cohort_day, age_days, n_users, cum_revenue)``.
    """
    firsts = events.groupBy("user_id").agg(F.min("ts").alias("t0"))
    cohorts = firsts.select(
        "user_id",
        F.to_date("t0").alias("cohort_day"),
        F.col("t0"),
    )
    sizes = cohorts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    rev = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .join(cohorts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("age_days"),
            "cents",
        )
        .filter(F.col("age_days") <= max_age_days)
        .groupBy("cohort_day", "age_days")
        .agg(F.sum("cents").alias("day_cents"))
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("age_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        rev.withColumn("cum_cents", F.sum("day_cents").over(w))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            # dates surface as strings (the repo's cross-engine date
            # convention — parquet DATE vs pandas Timestamp reprs differ)
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("age_days").cast("bigint").alias("age_days"),
            "n_users",
            (F.col("cum_cents").cast("double") / F.lit(100.0)).alias("cum_revenue"),
        )
    )


def welch_ttest(events: DataFrame, metric_type: str = "purchase") -> DataFrame:
    """Welch's unequal-variance t-test on a continuous metric between
    the two md5-coin experiment arms — the readout for revenue-per-
    purchase style metrics where variances genuinely differ (CLT
    regime; complements ab_conversion's rate z-test and
    ab_quantile_diff's median shift).

    Sufficient statistics only: each arm contracts to (n, Σcents,
    Σcents²) — BIGINT/DECIMAL(38,0) exact, map-side combined, ONE
    shuffle of two rows total.  The t statistic and Welch-Satterthwaite
    df are then a FIXED double expression tree over those exact
    integers (sample variance via the computational identity
    n·Σx² − (Σx)² over n·(n−1), each double op correctly rounded) —
    bit-equal cross-engine, no per-row floats anywhere.

    Arm assignment mirrors ab_conversion: md5-parity of user_id —
    deterministic, engine-invariant, independent of partitioning.

    Returns one row: ``(n_a, n_b, mean_a, mean_b, t_stat, df)``.
    """
    m = (
        events.filter(F.col("event_type") == metric_type)
        .select(
            F.when(
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 18, 15), 16, 10)
                .cast("bigint") % 2 == 0,
                F.lit("a"),
            )
            .otherwise(F.lit("b"))
            .alias("arm"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    stats = m.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).cast("decimal(38,0)").alias("s2"),
    )
    piv = stats.groupBy().agg(
        *[
            f(arm).alias(f"{c}_{arm}")
            for arm in ("a", "b")
            for c, f in (
                ("n", lambda a: F.max(F.when(F.col("arm") == a, F.col("n")))),
                ("s1", lambda a: F.max(F.when(F.col("arm") == a, F.col("s1")))),
                ("s2", lambda a: F.max(F.when(F.col("arm") == a, F.col("s2")))),
            )
        ]
    )
    def mean(s, n):
        return s.cast("double") / (n.cast("double") * F.lit(100.0))
    def var_over_n(s1, s2, n):
        # sample variance / n, in value units²: (n·Σx² − (Σx)²) / (n·(n−1)·n·100²).
        # numerator exact in DECIMAL(38,0) (HUGEINT in the oracle), ONE
        # cast to double; denominator a left-assoc DOUBLE product chain
        # mirrored op-for-op (a BIGINT n³ would exceed 2^53 exactness —
        # and overflow outright — long before 100 TB row counts)
        num = (n.cast("decimal(38,0)") * s2 - s1 * s1).cast("double")
        nd = n.cast("double")
        den = nd * (nd - F.lit(1.0)) * nd * F.lit(10000.0)
        return num / den
    na, nb = F.col("n_a"), F.col("n_b")
    ma, mb = mean(F.col("s1_a"), na), mean(F.col("s1_b"), nb)
    va, vb = var_over_n(F.col("s1_a"), F.col("s2_a"), na), var_over_n(
        F.col("s1_b"), F.col("s2_b"), nb
    )
    se2 = va + vb
    t = (ma - mb) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (va * va) / (na.cast("double") - F.lit(1.0))
        + (vb * vb) / (nb.cast("double") - F.lit(1.0))
    )
    return piv.select(
        na.alias("n_a"), nb.alias("n_b"),
        ma.alias("mean_a"), mb.alias("mean_b"),
        t.alias("t_stat"), dof.alias("df"),
    )


def session_pattern(
    events: DataFrame,
    pattern: str = "vc*p",
    gap_minutes: int = 30,
    type_letters: dict[str, str] | None = None,
) -> DataFrame:
    """Session-scoped row-pattern match — the documented
    :func:`seq_pattern` × sessionize composition, explicit: the regex
    runs over each SESSION's letter string, so a view in one visit and
    a purchase a week later no longer count as a conversion path (the
    semantics product analytics actually wants, and the state-bounding
    form for 100 TB: per-task memory is the busiest single SESSION,
    not the busiest user's lifetime).

    One user-grain shuffle total: session assignment (lag + cumsum) and
    the per-(user, session) collect share the same partitioning.

    Returns ``(user_id, session_seq, seq_len, n_matches)`` for sessions
    that match at least once.
    """
    from p2_mapreduce_spark.streaming.events import assign_sessions

    letters = type_letters or {
        "click": "c", "error": "e", "purchase": "p", "signup": "s", "view": "v",
    }
    enc = F.create_map(
        *[F.lit(x) for kv in sorted(letters.items()) for x in kv]
    )
    per_session = (
        assign_sessions(events, gap_minutes)
        .select(
            "user_id",
            "session_seq",
            F.struct(
                F.col("ts"), F.col("event_id"), enc[F.col("event_type")].alias("ch")
            ).alias("ev"),
        )
        .groupBy("user_id", "session_seq")
        .agg(F.array_sort(F.collect_list("ev")).alias("evs"))
        .select(
            "user_id",
            F.col("session_seq").cast("bigint").alias("session_seq"),
            F.concat_ws("", F.transform("evs", lambda e: e["ch"])).alias("seq"),
        )
    )
    return (
        per_session.select(
            "user_id",
            "session_seq",
            F.length("seq").cast("bigint").alias("seq_len"),
            F.regexp_count("seq", F.lit(pattern)).cast("bigint").alias("n_matches"),
        )
        .filter(F.col("n_matches") > 0)
    )


#: Fixed-point scale for the Markov-attribution absorption probabilities
#: (the pagerank device: quantize once, integer arithmetic every round).
MARKOV_SCALE = 1_000_000_000_000
MARKOV_ROUNDS = 12
#: Non-converting channel states (everything except the conversion event).
MARKOV_CHANNELS = ("click", "error", "signup", "view")


def markov_attribution(
    events: DataFrame,
    conversion: str = "purchase",
    rounds: int = MARKOV_ROUNDS,
) -> DataFrame:
    """Data-driven multi-touch attribution by REMOVAL EFFECT over a
    first-order Markov journey model (Anderl et al.'s framework — the
    model-based member of the attribution family beside last-touch and
    position rules): per channel, how much does the chain's conversion
    probability drop when that channel's state is deleted (transitions
    into it re-point to the NULL absorber)?  Output ``(channel,
    p_full_q, p_removed_q, removal_ppm, attribution_ppm)`` — removal
    effects normalized to attribution shares.

    Journey model: per user, event types ordered by time, truncated at
    the first conversion; chains run START → touches → CONV (converted)
    or NULL (journey ended unconverted).  Transition weights are raw
    counts; absorption probabilities evaluate by ``rounds`` fixed-point
    iterations from p≡0 with p(CONV)=1 — monotone convergence, and in
    MARKOV_SCALE integer arithmetic (``Σ n(s→t)·p_q(t) div total(s)``)
    every round is bit-identical cross-engine, so the whole model
    value-hashes against an unrolled SQL oracle (the pagerank device).
    Both engines truncate identically, so the bounded-round estimate is
    exact-comparable even before convergence.

    Scale shape: the corpus contracts to per-user journey arrays in ONE
    shuffle, then to a (variant, state, next) count table at CONFIG
    grain (≤ (channels+1) variants × states²).  The fixed point itself
    runs as ONE JVM higher-order ``aggregate`` expression over each
    variant's collected transition array — the per-round recurrence
    ``p'(s) = Σ n(s→t)·p(t) div tot(s)`` in the exact same bigint
    arithmetic the former join-per-round loop used (integer ops are
    associative/exact, so the fold is value-identical by construction;
    re-proved against the unrolled oracle at both scales) — removing
    all ``rounds`` iteration barriers/jobs; total cost is one shuffle
    plus O(variants · rounds · states · transitions) scalar work,
    independent of event volume.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        events.select(
            "user_id",
            "event_id",
            "ts",
            F.col("event_type").alias("et"),
        )
        .withColumn("rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rn", "et"))
            ).alias("path_s")
        )
        .select(
            "user_id",
            F.expr("transform(path_s, x -> x.et)").alias("path"),
        )
    )
    # truncate at first conversion; chain = START + touches + absorber
    chains = seq.select(
        F.expr(
            f"""
            CASE WHEN array_position(path, '{conversion}') > 0
                 THEN concat(
                     array('START'),
                     slice(path, 1,
                           cast(array_position(path, '{conversion}') - 1
                                as int)),
                     array('CONV'))
                 ELSE concat(array('START'), path, array('NULL_ST'))
            END
            """
        ).alias("chain")
    )
    trans = chains.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(chain) - 1), "
                "i -> named_struct('s', element_at(chain, i), "
                "'t', element_at(chain, i + 1)))"
            )
        ).alias("e")
    ).select(F.col("e.s").alias("s"), F.col("e.t").alias("t"))
    base = trans.groupBy("s", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    spark = events.sparkSession
    variants = spark.createDataFrame(
        [("full",)] + [(c,) for c in MARKOV_CHANNELS], "removed string"
    )
    # removal: transitions INTO the removed channel re-point to NULL;
    # the removed state's outgoing rows drop (unreachable)
    vt = (
        base.crossJoin(F.broadcast(variants))
        .filter((F.col("s") != F.col("removed")))
        .select(
            "removed",
            "s",
            F.when(F.col("t") == F.col("removed"), F.lit("NULL_ST"))
            .otherwise(F.col("t"))
            .alias("t"),
            "n",
        )
        .groupBy("removed", "s", "t")
        .agg(F.sum("n").alias("n"))
    )
    totals = vt.groupBy("removed", "s").agg(F.sum("n").alias("tot"))
    vt = vt.join(totals, ["removed", "s"])
    # Fold the whole fixed point into one JVM expression per variant:
    # collect each variant's (s, t, n, tot) transition rows into an
    # array and iterate `rounds` times over a state→p_q map.  States
    # with a p value are exactly the SOURCE states (`srcs`), matching
    # the loop's groupBy grain; absorbers (CONV/NULL_ST) never appear
    # as sources, so their pinned values live in the CASE — the same
    # role the former LEFT join + coalesce played.  `try_element_at(acc,
    # x.t)` is NULL for non-source targets, coalesced to 0 exactly as
    # before (plain `element_at` would THROW under Spark-4 ANSI mode if
    # a non-absorber target were ever absent — ADVICE r09: keep the old
    # LEFT-join NULL→0 degradation); every add/multiply/div is the same
    # bigint op in the same per-(removed, s) grouping, so each round is
    # bit-identical to the former join-per-round job.
    per = (
        vt.groupBy("removed")
        .agg(F.collect_list(F.struct("s", "t", "n", "tot")).alias("tr"))
        .withColumn(
            "srcs", F.expr("array_distinct(transform(tr, x -> x.s))")
        )
    )
    zero_map = (
        "map_from_entries(transform(srcs, "
        "s0 -> struct(s0, cast(0 as bigint))))"
    )
    if int(rounds) < 1:
        final_map = zero_map
    else:
        final_map = f"""
        aggregate(
          sequence(1, {int(rounds)}),
          {zero_map},
          (acc, i) -> map_from_entries(transform(srcs, s0 ->
            struct(s0,
              aggregate(
                filter(tr, x -> x.s = s0),
                cast(0 as bigint),
                (a, x) -> a + x.n *
                  (CASE WHEN x.t = 'CONV'
                        THEN cast({MARKOV_SCALE} as bigint)
                        WHEN x.t = 'NULL_ST' THEN cast(0 as bigint)
                        ELSE coalesce(try_element_at(acc, x.t),
                                      cast(0 as bigint)) END)
              ) div element_at(filter(tr, x -> x.s = s0), 1).tot
            )
          ))
        )
        """
    # ONE checkpoint of the (variants)-row result: `start` feeds four
    # downstream branches (full/rem × scored/tot_re) — without it the
    # whole corpus contraction replans and re-executes per branch.
    start = per.select(
        "removed",
        F.expr(f"element_at({final_map}, 'START')")
        .cast("long")
        .alias("p_q"),
    ).localCheckpoint()
    full = start.filter(F.col("removed") == "full").select(
        F.col("p_q").alias("p_full_q")
    )
    rem = start.filter(F.col("removed") != "full")
    scored = rem.crossJoin(F.broadcast(full)).select(
        F.col("removed").alias("channel"),
        "p_full_q",
        F.col("p_q").alias("p_removed_q"),
        F.when(
            F.col("p_full_q") > 0,
            F.expr("(p_full_q - p_q) * 1000000 div p_full_q"),
        ).otherwise(F.lit(0)).cast("bigint").alias("removal_ppm"),
    )
    tot_re = scored.agg(
        F.sum(F.greatest("removal_ppm", F.lit(0))).alias("sum_re")
    )
    return scored.crossJoin(F.broadcast(tot_re)).select(
        "channel",
        "p_full_q",
        "p_removed_q",
        "removal_ppm",
        F.when(
            F.col("sum_re") > 0,
            F.expr(
                "greatest(removal_ppm, 0) * 1000000 div sum_re"
            ),
        ).otherwise(F.lit(0)).cast("bigint").alias("attribution_ppm"),
    )


def logrank_test(events: DataFrame, conversion: str = "purchase") -> DataFrame:
    """Log-rank test between two user cohorts' time-to-conversion
    survival curves — the A/B face of the survival family
    (``life_table`` describes ONE curve; log-rank decides whether two
    differ): cohort = whether the user's journey STARTS with a 'view'
    (organic entry) vs anything else; event = first conversion; censor
    = the user's last observed event.  Output one row ``(n_days, o1,
    e1, v, z)`` — observed conversions in cohort 1, their expectation
    and variance under the null (hypergeometric at each conversion
    day), and the z statistic.

    Determinism protocol: per-day terms are single IEEE divisions of
    exact BIGINT counts, and the cross-day sums — the one place a
    floating aggregate's ORDER would leak into the result — run as a
    day-ordered ``aggregate()`` fold over a collected day-grain array
    (the LSH-dot-product device), so e1, v, and z are bit-identical
    cross-engine; ``sqrt`` is IEEE-correctly-rounded.

    Scale shape: users contract to one (cohort, day, converted) row in
    one shuffle; everything after runs at observed-day grain (bounded
    by the observation window).  At-risk counts come from a suffix sum
    of leavers over the full day × cohort grid — missing grid cells
    contribute zero leavers, so the suffix count at day t equals the
    number of users with conversion-or-censor day ≥ t with NO join back
    to the user-grain table (the round-4 form fanned every cohort's
    user set into one task per day through a two-value join key).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    per_user = (
        events.select(
            "user_id",
            "event_id",
            "ts",
            F.col("event_type").alias("et"),
        )
        .withColumn("rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("et"))).alias("first_et"),
            F.min("ts").alias("t0"),
            F.max("ts").alias("t_last"),
            F.min(F.when(F.col("et") == conversion, F.col("ts"))).alias(
                "t_conv"
            ),
        )
        .select(
            F.when(F.col("first_et") == "view", F.lit(1))
            .otherwise(F.lit(2))
            .alias("cohort"),
            F.when(
                F.col("t_conv").isNotNull(),
                F.datediff(F.col("t_conv"), F.col("t0")),
            )
            .otherwise(F.datediff(F.col("t_last"), F.col("t0")))
            .cast("bigint")
            .alias("day"),
            F.col("t_conv").isNotNull().alias("converted"),
        )
    )
    day_counts = per_user.groupBy("cohort", "day").agg(
        F.sum(F.when(F.col("converted"), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leave"),
    )
    days = day_counts.select("day").distinct()
    # full day × cohort grid so both cohorts' n/d align per day.
    # STATIC cohort enumeration: a cohort with zero members must still
    # contribute (n=0, d=0) rows — its terms vanish (e_t = v_t = 0)
    # instead of silently emptying the whole comparison
    spark = events.sparkSession
    grid = days.crossJoin(
        F.broadcast(spark.createDataFrame([(1,), (2,)], "cohort int"))
    ).select("day", "cohort")
    # n_g at day t = number of cohort-g users with conversion-or-censor
    # day >= t = suffix sum of leavers over the grid (grid days missing
    # from a cohort's day table contribute leave=0, so the suffix count
    # carries that cohort's next observed day's at-risk) — day-grain
    # join + day-grain window, no user-grain fan-out
    w_risk = (
        Window.partitionBy("cohort")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    cells = (
        grid.join(day_counts, ["day", "cohort"], "left")
        .select(
            "day",
            "cohort",
            F.coalesce(F.col("d"), F.lit(0)).cast("bigint").alias("d"),
            F.coalesce(F.col("leave"), F.lit(0))
            .cast("bigint")
            .alias("leave"),
        )
        .withColumn("n_at", F.sum("leave").over(w_risk))
    )
    p1 = cells.filter(F.col("cohort") == 1).select(
        "day", F.col("n_at").alias("n1"), F.col("d").alias("d1")
    )
    p2 = cells.filter(F.col("cohort") == 2).select(
        F.col("day").alias("day2"),
        F.col("n_at").alias("n2"),
        F.col("d").alias("d2"),
    )
    merged = (
        p1.join(p2, p1.day == p2.day2)
        .select("day", "n1", "d1", "n2", "d2")
        .filter((F.col("d1") + F.col("d2")) > 0)
        .filter((F.col("n1") + F.col("n2")) > 1)
    )
    terms = merged.select(
        "day",
        "d1",
        (
            (F.col("d1") + F.col("d2")).cast("double")
            * F.col("n1").cast("double")
            / (F.col("n1") + F.col("n2")).cast("double")
        ).alias("e_t"),
        (
            (F.col("d1") + F.col("d2")).cast("double")
            * F.col("n1").cast("double")
            * F.col("n2").cast("double")
            * (F.col("n1") + F.col("n2") - F.col("d1") - F.col("d2")).cast(
                "double"
            )
            / (
                (F.col("n1") + F.col("n2")).cast("double")
                * (F.col("n1") + F.col("n2")).cast("double")
                * (F.col("n1") + F.col("n2") - 1).cast("double")
            )
        ).alias("v_t"),
    )
    # day-ordered folds: the ONLY floating sums, in a pinned order
    folded = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("d1").cast("bigint").alias("o1"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("day", "e_t"))),
            F.lit(0.0),
            lambda acc, x: acc + x["e_t"],
        ).alias("e1"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("day", "v_t"))),
            F.lit(0.0),
            lambda acc, x: acc + x["v_t"],
        ).alias("v"),
    )
    return folded.select(
        "n_days",
        "o1",
        "e1",
        "v",
        F.when(
            F.col("v") > 0,
            (F.col("o1").cast("double") - F.col("e1")) / F.sqrt(F.col("v")),
        )
        .otherwise(F.lit(0.0))
        .alias("z"),
    )


def next_event_accuracy(events: DataFrame) -> DataFrame:
    """Top-1 next-event prediction accuracy of the first-order Markov
    model — the EVAL face of the transition matrix (event_transitions
    builds it, markov_attribution uses it for credit; this measures
    whether it PREDICTS): for every consecutive pair in a user journey,
    predict the globally most frequent successor of the current type
    and score the hit rate per current type.

    All-integer protocol: the transition matrix is a |types|² count
    aggregate; the per-type argmax breaks ties deterministically
    (count desc, successor asc); accuracy is one pinned division of
    exact BIGINTs.  The majority-class baseline rides along — a model
    gate needs "better than always-predict-the-mode", not a bare
    number.

    Output: (prev_type, n_pairs, predicted, n_correct, accuracy,
    baseline_share).  Scale shape: one user-grain window pass to form
    pairs, then everything at |types|²/config grain.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wa = Window.partitionBy("prev_type").orderBy(
        F.col("n").desc(), F.col("next_type").asc()
    )
    pred = pairs.withColumn("rn", F.row_number().over(wa)).filter(
        F.col("rn") == 1
    ).select("prev_type", F.col("next_type").alias("predicted"),
             F.col("n").alias("n_correct"))
    totals = pairs.groupBy("prev_type").agg(
        F.sum("n").cast("bigint").alias("n_pairs")
    )
    # majority-class baseline: global modal NEXT type share
    nxt = pairs.groupBy("next_type").agg(F.sum("n").alias("cn"))
    wb = Window.orderBy(F.col("cn").desc(), F.col("next_type").asc())
    base = (
        nxt.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .crossJoin(
            F.broadcast(pairs.agg(F.sum("n").alias("grand")))
        )
        .select(
            (
                F.col("cn").cast("double") / F.col("grand").cast("double")
            ).alias("baseline_share")
        )
    )
    return (
        totals.join(pred, "prev_type")
        .crossJoin(F.broadcast(base))
        .select(
            "prev_type",
            "n_pairs",
            "predicted",
            "n_correct",
            (
                F.col("n_correct").cast("double")
                / F.col("n_pairs").cast("double")
            ).alias("accuracy"),
            "baseline_share",
        )
    )


def rmst(
    events: DataFrame,
    taus: Sequence[int] = (7, 14, 30),
    user_col: str = "user_id",
) -> DataFrame:
    """Restricted mean survival time (RMST) of user lifetimes at
    horizons τ — "how many of the first τ days does the average user
    survive?", the single-number summary clinicians and retention
    teams quote from a Kaplan-Meier curve, robust where median
    survival is undefined (more than half the cohort outliving the
    window).

    With the CLOSED extract of :func:`life_table` (every lifetime
    fully observed), the KM integral telescopes to an EXACT sum:
    RMST(τ) = ∫₀^τ S(t)dt = Σ_{t<τ} |L > t| / N = Σ_u min(L_u, τ)/N
    — so the statistic is one user-grain aggregate per horizon, no
    survival-curve product, no fold, and the hash compares a single
    IEEE division over exact BIGINTs.

    Scale shape: one user-grain min/max aggregate (map-side combined),
    then a #horizons-sized broadcast cross join — never more than
    |users| × |taus| rows, aggregated map-side.
    Output: (tau, n_users, sum_capped_days, rmst_days).
    """
    lt = events.groupBy(F.col(user_col).alias("u")).agg(
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))).alias(
            "life"
        )
    )
    tau_df = events.sparkSession.createDataFrame(
        [(int(t),) for t in taus], ["tau"]
    )
    return (
        lt.crossJoin(F.broadcast(tau_df))
        .groupBy("tau")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(F.least(F.col("life"), F.col("tau")))
            .cast("bigint")
            .alias("sum_capped_days"),
        )
        .select(
            F.col("tau").cast("int").alias("tau"),
            "n_users",
            "sum_capped_days",
            (
                F.col("sum_capped_days").cast("double")
                / F.col("n_users").cast("double")
            ).alias("rmst_days"),
        )
    )


def cohens_d(
    events: DataFrame, group_a: str = "view", group_b: str = "click"
) -> DataFrame:
    """Cohen's d between two event types' per-event values — the
    standardized mean-difference EFFECT SIZE that belongs next to
    :func:`welch_ttest` (the t answers "is the difference real?";
    d answers "is it big enough to matter?" in pooled-SD units):
    ``d = (m_a − m_b) / s_p``, ``s_p² = ((n_a−1)s_a² + (n_b−1)s_b²) /
    (n_a + n_b − 2)``.

    Exactness: per-group Σ and Σ² over exact cents (second moments in
    DECIMAL(38,0) — the anova_f device); variances clear the means by
    ``n·Σx² − (Σx)²`` over n(n−1), and d is one pinned IEEE tree whose
    only non-rational step is the IEEE-exact sqrt.  Output: one row
    (n_a, n_b, mean_a, mean_b, cohens_d) in currency units — zero rows
    if either group is absent or the pooled variance degenerates.
    """
    sides = events.filter(
        F.col("event_type").isin(group_a, group_b)
    ).select(
        (F.col("event_type") == group_a).cast("int").alias("is_a"),
        F.floor(F.col("value") * 100).cast("bigint").alias("c"),
    )
    cd = F.col("c").cast("decimal(19,0)")
    agg = sides.groupBy("is_a").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(cd * cd).cast("decimal(38,0)").alias("q"),
    )
    a = agg.filter(F.col("is_a") == 1).select(
        F.col("n").alias("n_a"), F.col("s").alias("s_a"),
        F.col("q").alias("q_a"),
    )
    b = agg.filter(F.col("is_a") == 0).select(
        F.col("n").alias("n_b"), F.col("s").alias("s_b"),
        F.col("q").alias("q_b"),
    )
    out = a.crossJoin(b)  # one row × one row
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    # (n−1)·s² = (n·Σx² − (Σx)²) / n — exact numerators, one division
    ssa = (
        na * F.col("q_a").cast("double")
        - F.col("s_a").cast("double") * F.col("s_a").cast("double")
    ) / na
    ssb = (
        nb * F.col("q_b").cast("double")
        - F.col("s_b").cast("double") * F.col("s_b").cast("double")
    ) / nb
    sp = F.sqrt((ssa + ssb) / (na + nb - F.lit(2.0)))
    d = (
        F.col("s_a").cast("double") / na
        - F.col("s_b").cast("double") / nb
    ) / sp
    return out.select(
        "n_a",
        "n_b",
        (F.col("s_a").cast("double") / na / F.lit(100.0)).alias("mean_a"),
        (F.col("s_b").cast("double") / nb / F.lit(100.0)).alias("mean_b"),
        F.when(
            (F.col("n_a") + F.col("n_b") > 2) & (ssa + ssb > 0.0), d
        )
        .otherwise(F.lit(0.0))
        .alias("cohens_d"),
    ).filter((F.col("n_a") > 0) & (F.col("n_b") > 0))


def mcnemar_test(events: DataFrame, event_type: str = "purchase") -> DataFrame:
    """McNemar's test on PAIRED user behavior across the two halves of
    the observed calendar — "did the purchasing population change?",
    asked the paired way (each user is their own control): only the
    DISCORDANT users matter, b = purchased-then-stopped, c =
    started-purchasing, ``χ² = (b − c)² / (b + c)``.  The paired
    sibling of :func:`ab_conversion` (which compares independent
    groups).

    Exactness: the calendar midpoint is day-grain integer arithmetic
    from the global (min, max) date (one broadcast row); per-user
    half-flags are exact conditional aggregates; b, c are exact
    BIGINTs and χ² is one pinned division.  Output: one row
    (n_users, b_cnt, c_cnt, mcnemar_chi2).

    Scale shape: one user-grain aggregate (map-side combined) against
    a broadcast midpoint — no window, no self-join.
    """
    days = events.select(F.to_date("ts").alias("d"))
    span = days.agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    ).select(
        # integer `div`, not /2-then-cast: double→int casts truncate in
        # Spark but round in DuckDB — floor division agrees everywhere
        F.expr("date_add(d0, CAST(datediff(d1, d0) div 2 AS INT))").alias(
            "mid"
        )
    )
    per_user = (
        events.crossJoin(F.broadcast(span))
        .select(
            "user_id",
            (
                (F.col("event_type") == event_type)
                & (F.to_date("ts") <= F.col("mid"))
            ).cast("int").alias("h1"),
            (
                (F.col("event_type") == event_type)
                & (F.to_date("ts") > F.col("mid"))
            ).cast("int").alias("h2"),
        )
        .groupBy("user_id")
        .agg(
            F.max("h1").alias("y1"),
            F.max("h2").alias("y2"),
        )
    )
    agg = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(
            ((F.col("y1") == 1) & (F.col("y2") == 0)).cast("int")
        ).cast("bigint").alias("b_cnt"),
        F.sum(
            ((F.col("y1") == 0) & (F.col("y2") == 1)).cast("int")
        ).cast("bigint").alias("c_cnt"),
    )
    chi2 = F.when(
        F.col("b_cnt") + F.col("c_cnt") > 0,
        (
            (F.col("b_cnt") - F.col("c_cnt")).cast("double")
            * (F.col("b_cnt") - F.col("c_cnt")).cast("double")
        )
        / (F.col("b_cnt") + F.col("c_cnt")).cast("double"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "n_users", "b_cnt", "c_cnt", chi2.alias("mcnemar_chi2")
    ).filter(F.col("n_users") > 0)


def odds_ratio(
    events: DataFrame,
    exposure_type: str = "view",
    outcome_type: str = "purchase",
) -> DataFrame:
    """Exposure→outcome odds ratio per user with the Haldane–Anscombe
    ½ correction — the epidemiology-grade association readout ("are
    first-touch viewers more likely to ever purchase?") that the
    funnel rates don't standardize: exposure = the user's FIRST event
    (by ts, event_id) is ``exposure_type``; outcome = the user ever
    fires ``outcome_type``.  OR = (a+½)(d+½) / ((b+½)(c+½)) — finite
    even with empty cells.

    Exactness: the first event comes from one min_by struct aggregate
    (total order by (ts, event_id)); a, b, c, d are exact conditional
    counts; the OR is one pinned IEEE tree over half-integer doubles
    (k + 0.5 is exactly representable).  Output: one row
    (n_exposed, n_unexposed, a, b, c, d, odds_ratio).
    """
    per_user = events.groupBy("user_id").agg(
        F.min(
            F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"))
        )["event_type"].alias("first_type"),
        F.max(
            (F.col("event_type") == outcome_type).cast("int")
        ).alias("outcome"),
    )
    flags = per_user.select(
        (F.col("first_type") == exposure_type).cast("int").alias("e"),
        F.col("outcome").alias("o"),
    )
    agg = flags.agg(
        F.sum(F.col("e") * F.col("o")).cast("bigint").alias("a"),
        F.sum(F.col("e") * (1 - F.col("o"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("e")) * F.col("o")).cast("bigint").alias("c"),
        F.sum((1 - F.col("e")) * (1 - F.col("o")))
        .cast("bigint")
        .alias("d"),
    )
    orr = (
        (F.col("a").cast("double") + F.lit(0.5))
        * (F.col("d").cast("double") + F.lit(0.5))
    ) / (
        (F.col("b").cast("double") + F.lit(0.5))
        * (F.col("c").cast("double") + F.lit(0.5))
    )
    return agg.select(
        (F.col("a") + F.col("b")).alias("n_exposed"),
        (F.col("c") + F.col("d")).alias("n_unexposed"),
        "a", "b", "c", "d",
        orr.alias("odds_ratio"),
    ).filter((F.col("a") + F.col("b") + F.col("c") + F.col("d")) > 0)


def cochran_q(events: DataFrame) -> DataFrame:
    """Cochran's Q test across the event-type REPERTOIRE — "do the
    k behaviors differ in adoption?", asked the within-subject way
    (each user is a block of k binary outcomes: fired the type or
    not): ``Q = (k−1)·(k·ΣC_j² − (ΣC_j)²) / (k·ΣR_i − ΣR_i²)`` over
    column totals C_j (users per type) and row totals R_i (types per
    user).  The binary sibling of :func:`friedman` blocking and the
    k-group extension of :func:`mcnemar_test`.

    Exactness: all four moments are exact integers from the distinct
    (user, type) incidence list — squares in DECIMAL(38,0) (the
    anova_f device) — and Q is one pinned IEEE division.  Degenerate
    denominators (every user fired every type) surface Q = 0.

    Scale shape: one (user, type)-distinct contraction, one user-grain
    and one type-grain aggregate, one-row report.  Output:
    (n_users, k_types, q_stat).
    """
    flags = events.select("user_id", "event_type").distinct()
    cj = flags.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ri = flags.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("r")
    )
    cd = F.col("c").cast("decimal(19,0)")
    rd = F.col("r").cast("decimal(19,0)")
    col_m = cj.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_types"),
        F.sum("c").cast("bigint").alias("sum_c"),
        F.sum(cd * cd).cast("decimal(38,0)").alias("sum_c2"),
    )
    row_m = ri.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("r").cast("bigint").alias("sum_r"),
        F.sum(rd * rd).cast("decimal(38,0)").alias("sum_r2"),
    )
    out = col_m.crossJoin(row_m)  # one row × one row
    k = F.col("k_types").cast("double")
    num = k * F.col("sum_c2").cast("double") - F.col("sum_c").cast(
        "double"
    ) * F.col("sum_c").cast("double")
    den = k * F.col("sum_r").cast("double") - F.col("sum_r2").cast(
        "double"
    )
    q = F.when(
        (F.col("k_types") > 1) & (den > 0.0),
        (k - F.lit(1.0)) * num / den,
    ).otherwise(F.lit(0.0))
    return out.select(
        "n_users", F.col("k_types").cast("int").alias("k_types"),
        q.alias("q_stat"),
    ).filter(F.col("n_users") > 0)


#: SPRT constants for :func:`sprt_daily`, computed ONCE in Python and
#: embedded as the SAME double literals in both the Spark plan and the
#: SQL oracle (__spark_entry__ imports these) — the engine-portable way
#: to use ln in a statistic: the transcendental evaluates at BUILD time
#: in one runtime (CPython libm), never independently per engine.
SPRT_P0 = 0.15
SPRT_P1 = 0.25
SPRT_ALPHA = 0.05
SPRT_BETA = 0.05


def _sprt_consts() -> tuple[float, float, float, float]:
    import math

    l1 = math.log(SPRT_P1 / SPRT_P0)  # per-success LLR increment
    l0 = math.log((1.0 - SPRT_P1) / (1.0 - SPRT_P0))  # per-failure
    a = math.log((1.0 - SPRT_BETA) / SPRT_ALPHA)  # accept-H1 boundary
    b = math.log(SPRT_BETA / (1.0 - SPRT_ALPHA))  # accept-H0 boundary
    return l1, l0, a, b


def sprt_daily(events: DataFrame, success_type: str = "purchase") -> DataFrame:
    """Wald's sequential probability ratio test on the daily conversion
    stream: monitor P(event is a ``success_type``) day by day and emit
    the running log-likelihood ratio against H0: p = 0.15 vs
    H1: p = 0.25 with the classic decision boundaries — the sequential
    monitor that STOPS as soon as the evidence is decisive, where
    ab_conversion / wilson_ci wait for a fixed horizon.

    ``LLR_n = k_n·ln(p1/p0) + (n_n−k_n)·ln((1−p1)/(1−p0))`` is LINEAR
    in the exact cumulative counts (k_n, n_n), so the only
    transcendentals are four CONSTANTS evaluated once in Python and
    shipped as identical double literals to both engines (module
    docstring above) — the statistic itself is one pinned
    multiply-add per day.

    Scale shape: the fact stream contracts to (day, trials, successes)
    map-side; the cumulative window runs at CALENDAR grain (one
    bounded partition — the reviewed-funnel pattern).  Output per day:
    (day, n_cum, k_cum, llr, state) where state ∈ accept_h1 /
    accept_h0 / continue, sticky once a boundary is crossed (the
    sequential test's stopping rule).
    """
    l1, l0, a, b = _sprt_consts()
    daily = (
        events.select(
            F.to_date("ts").alias("d"),
            (F.col("event_type") == success_type).cast("bigint").alias("s"),
        )
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("s").cast("bigint").alias("k"),
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "d",
        F.sum("n").over(w).cast("bigint").alias("n_cum"),
        F.sum("k").over(w).cast("bigint").alias("k_cum"),
    )
    llr = F.col("k_cum").cast("double") * F.lit(l1) + (
        F.col("n_cum") - F.col("k_cum")
    ).cast("double") * F.lit(l0)
    with_llr = cum.select(
        "d", "n_cum", "k_cum", llr.alias("llr")
    )
    # sticky decision: the FIRST boundary crossing decides; later days
    # report that decision (min-day-of-crossing broadcast, one row)
    crossings = with_llr.select(
        F.min(F.when(F.col("llr") >= F.lit(a), F.col("d"))).alias("d_h1"),
        F.min(F.when(F.col("llr") <= F.lit(b), F.col("d"))).alias("d_h0"),
    )
    out = with_llr.crossJoin(F.broadcast(crossings))
    decided_h1 = (
        F.col("d_h1").isNotNull()
        & (F.col("d_h0").isNull() | (F.col("d_h1") <= F.col("d_h0")))
        & (F.col("d") >= F.col("d_h1"))
    )
    decided_h0 = (
        F.col("d_h0").isNotNull()
        & (F.col("d_h1").isNull() | (F.col("d_h0") < F.col("d_h1")))
        & (F.col("d") >= F.col("d_h0"))
    )
    return out.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_cum",
        "k_cum",
        "llr",
        F.when(decided_h1, F.lit("accept_h1"))
        .when(decided_h0, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("state"),
    )


def stuart_maxwell(events: DataFrame) -> DataFrame:
    """Stuart-Maxwell marginal-homogeneity test: did the POPULATION's
    dominant behavior shift between the two calendar halves?  The k=3
    generalization of :func:`mcnemar_test` — each user contributes one
    PAIRED categorical observation (their modal event type among
    view/click/purchase in each half; ties break lexicographically),
    and the test asks whether the first-half and second-half marginal
    distributions of that 3×3 transition table agree.

    ``χ² = d' S⁻¹ d`` on the first two categories, with
    d_i = row_i − col_i and S the 2×2 covariance
    (S_ii = r_i + c_i − 2·n_ii, S_12 = −(n_12 + n_21)) — the 2×2
    inverse in closed form (Cramer), so with the nine exact BIGINT
    cell counts the statistic is one pinned IEEE tree.

    Scale shape: the calendar midpoint is one broadcast row (the
    mcnemar device); per-user modal picks are two user-grain argmax
    aggregates; the 3×3 table is a 9-row contraction.  Output one
    row: (n_users, chi2, df); zero rows when no user qualifies,
    chi2 = 0.0 when S degenerates.
    """
    kinds = ("click", "purchase", "view")  # lexicographic, k=3
    days = events.select(F.to_date("ts").alias("d"))
    span = days.agg(F.min("d").alias("d0"), F.max("d").alias("d1")).select(
        F.expr(
            "date_add(d0, CAST(datediff(d1, d0) div 2 AS INT))"
        ).alias("mid")
    )
    tagged = (
        events.filter(F.col("event_type").isin(*kinds))
        .crossJoin(F.broadcast(span))
        .select(
            "user_id",
            (F.to_date("ts") <= F.col("mid")).alias("first_half"),
            "event_type",
        )
    )
    counts = tagged.groupBy("user_id", "first_half", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # modal pick: max count, ties to the lexicographically smallest type
    modal = counts.groupBy("user_id", "first_half").agg(
        F.min_by(
            "event_type",
            F.struct((-F.col("cnt")).alias("neg"), "event_type"),
        ).alias("m")
    )
    pairs = (
        modal.filter(F.col("first_half"))
        .select("user_id", F.col("m").alias("m1"))
        .join(
            modal.filter(~F.col("first_half")).select(
                "user_id", F.col("m").alias("m2")
            ),
            "user_id",
        )
    )
    cell = pairs.groupBy("m1", "m2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )

    def c(i: int, j: int):
        return F.sum(
            F.when(
                (F.col("m1") == kinds[i]) & (F.col("m2") == kinds[j]),
                F.col("n"),
            ).otherwise(0)
        ).cast("bigint")

    agg = cell.agg(
        F.sum("n").cast("bigint").alias("n_users"),
        *[
            c(i, j).alias(f"n{i}{j}")
            for i in range(3)
            for j in range(3)
        ],
    )
    r = [
        sum((F.col(f"n{i}{j}") for j in range(3)), F.lit(0).cast("bigint"))
        for i in range(3)
    ]
    cc = [
        sum((F.col(f"n{i}{j}") for i in range(3)), F.lit(0).cast("bigint"))
        for j in range(3)
    ]
    d1 = (r[0] - cc[0]).cast("double")
    d2 = (r[1] - cc[1]).cast("double")
    s11 = (r[0] + cc[0] - 2 * F.col("n00")).cast("double")
    s22 = (r[1] + cc[1] - 2 * F.col("n11")).cast("double")
    s12 = -(F.col("n01") + F.col("n10")).cast("double")
    det = s11 * s22 - s12 * s12
    chi2 = (
        d1 * d1 * s22 - F.lit(2.0) * d1 * d2 * s12 + d2 * d2 * s11
    ) / det
    return agg.select(
        "n_users",
        F.when(det > 0.0, chi2).otherwise(F.lit(0.0)).alias("chi2"),
        F.lit(2).cast("bigint").alias("df"),
    ).filter(F.col("n_users") > 0)


def risk_ratio(
    events: DataFrame,
    exposure_type: str = "view",
    outcome_type: str = "purchase",
) -> DataFrame:
    """Relative risk + risk difference on :func:`odds_ratio`'s exact
    2×2 table — the other two thirds of the epidemiology trio: OR is
    symmetric and case-control-safe; RR = [a/(a+b)] / [c/(c+d)] is the
    number people actually mean by "X times more likely", and
    RD = a/(a+b) − c/(c+d) is the absolute-impact form (1/RD = number
    needed to treat).  Same exposure/outcome construction (first event
    by (ts, event_id); ever-fires outcome) so the three measures read
    off ONE user-grain table.

    Exactness: the four cells are exact BIGINTs; each risk is one IEEE
    division and RR/RD are pinned trees; degenerate margins (no
    exposed or no unexposed users) emit 0.0 sentinels rather than
    dividing by zero.  Output: one row (n_exposed, n_unexposed,
    risk_exposed, risk_unexposed, risk_ratio, risk_diff).
    """
    per_user = events.groupBy("user_id").agg(
        F.min(
            F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"))
        )["event_type"].alias("first_type"),
        F.max(
            (F.col("event_type") == outcome_type).cast("int")
        ).alias("outcome"),
    )
    flags = per_user.select(
        (F.col("first_type") == exposure_type).cast("int").alias("e"),
        F.col("outcome").alias("o"),
    )
    agg = flags.agg(
        F.sum(F.col("e") * F.col("o")).cast("bigint").alias("a"),
        F.sum(F.col("e") * (1 - F.col("o"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("e")) * F.col("o")).cast("bigint").alias("c"),
        F.sum((1 - F.col("e")) * (1 - F.col("o")))
        .cast("bigint")
        .alias("d"),
    )
    ne = F.col("a") + F.col("b")
    nu = F.col("c") + F.col("d")
    re_ = F.col("a").cast("double") / ne.cast("double")
    ru = F.col("c").cast("double") / nu.cast("double")
    ok = (ne > 0) & (nu > 0)
    return agg.select(
        ne.alias("n_exposed"),
        nu.alias("n_unexposed"),
        F.when(ne > 0, re_).otherwise(F.lit(0.0)).alias("risk_exposed"),
        F.when(nu > 0, ru).otherwise(F.lit(0.0)).alias("risk_unexposed"),
        F.when(ok & (ru > 0.0), re_ / ru)
        .otherwise(F.lit(0.0))
        .alias("risk_ratio"),
        F.when(ok, re_ - ru).otherwise(F.lit(0.0)).alias("risk_diff"),
    ).filter((ne + nu) > 0)


def nelson_aalen(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Nelson–Aalen cumulative hazard over user lifetimes — the
    integral companion to :func:`life_table`'s Kaplan–Meier face: for
    each observed lifetime t, ``H(t) = Σ_{t' ≤ t} d(t')/n(t')`` where
    d/n are the churn events and the at-risk set at t'.  H(t) is the
    estimator survival modelers feed to proportional-hazard baselines;
    KM answers "what fraction survives", NA answers "how much hazard
    has accrued" (and −ln S(t) ≈ H(t) is the classic cross-check).

    Exactness: d and n are exact BIGINTs from the same two aggregates
    as life_table, and the estimator follows the repo's exact-ppm
    protocol (life_table's device): each increment is floor-quantized
    to ppm FIRST (one IEEE division + floor, bit-identical in both
    engines), then the cumulative sum runs over exact BIGINT ppm — so
    the fold is order-free and hash-comparable (a float cumulative sum
    would depend on the engines' window summation order).  The grid is
    at OBSERVED-LIFETIME grain, bounded by the observation window in
    days — never user/event grain.

    Output: (t_days, n_at_risk, n_churn, hazard_ppm, cum_hazard_ppm).
    """
    lt = (
        events.select(F.col(user_col).alias("u"), F.to_date("ts").alias("d"))
        .groupBy("u")
        .agg(F.datediff(F.max("d"), F.min("d")).alias("t_days"))
        .groupBy("t_days")
        .agg(F.count(F.lit(1)).alias("n_churn"))
    )
    w_desc = Window.orderBy(F.col("t_days").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    base = lt.select(
        F.col("t_days").cast("bigint").alias("t_days"),
        F.sum("n_churn").over(w_desc).cast("bigint").alias("n_at_risk"),
        F.col("n_churn").cast("bigint").alias("n_churn"),
    ).select(
        "t_days",
        "n_at_risk",
        "n_churn",
        F.floor(
            F.lit(1_000_000.0) * F.col("n_churn") / F.col("n_at_risk")
        ).cast("bigint").alias("hazard_ppm"),
    )
    w_asc = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return base.select(
        "t_days",
        "n_at_risk",
        "n_churn",
        "hazard_ppm",
        F.sum("hazard_ppm").over(w_asc).cast("bigint").alias(
            "cum_hazard_ppm"
        ),
    )


def icc_reliability(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """ICC(2,1) — the two-way random-effects, absolute-agreement,
    single-measure intraclass correlation (Shrout & Fleiss) — treating
    each calendar DAY as a subject and each group (event type) as a
    rater scoring it with its daily revenue.  Completes the round-8
    reliability batch: Cronbach's α asks internal consistency, Lin's
    CCC compares two raters; ICC(2,1) generalizes agreement to k
    raters with rater effects in the model.

    Only days where ALL k raters observed (a full row of the day ×
    rater grid) enter, making the design balanced as the estimator
    requires.  From exact BIGINT cent sums: the two-way mean squares
    ``MSR`` (rows/days), ``MSC`` (columns/raters), ``MSE`` (residual),
    then ``ICC = (MSR − MSE) / (MSR + (k−1)·MSE + (k/n)·(MSC − MSE))``.
    Every sum of squares is a pinned IEEE tree over exactly-represented
    integers (sums and squared sums of cents), identical in both
    engines.

    Output: one row (n_days, k_raters, msr, msc, mse, icc).
    """
    daily = _daily_cents_ea(events, group_col)
    k_groups = [
        r["g"] for r in daily.select("g").distinct().orderBy("g").collect()
    ]  # config-grain: #event types
    k = len(k_groups)
    if k < 2:
        return events.sparkSession.createDataFrame(
            [], "n_days bigint, k_raters int, msr double, msc double,"
            " mse double, icc double"
        )
    full_days = (
        daily.groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("nk"),
            F.sum("y").alias("row_sum"),
        )
        .filter(F.col("nk") == k)
    )
    cells = daily.join(full_days.select("d"), "d")
    per_rater = cells.groupBy("g").agg(F.sum("y").alias("col_sum"))
    # squared cent sums overflow BIGINT already at ~10x the bench scale
    # (a day's all-rater revenue squared is ~2.7e18 cents² at sf1) —
    # exact DECIMAL(38,0) arithmetic here, HUGEINT on the DuckDB side:
    # same exact integer, hence the same final double
    ydec = F.col("y").cast("decimal(38,0)")
    stats = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("nk_cells"),
        F.sum("y").cast("bigint").alias("total"),
        F.sum(ydec * ydec).cast("decimal(38,0)").alias("ss_cells"),
    )
    rdec = F.col("row_sum").cast("decimal(38,0)")
    row_part = full_days.agg(
        F.sum(rdec * rdec).cast("decimal(38,0)").alias("ss_rows")
    )
    cdec = F.col("col_sum").cast("decimal(38,0)")
    col_part = per_rater.agg(
        F.sum(cdec * cdec).cast("decimal(38,0)").alias("ss_cols")
    )
    j = stats.join(F.broadcast(row_part)).join(F.broadcast(col_part))
    n_ = (F.col("nk_cells") / F.lit(k)).cast("bigint")  # exact: nk = n·k
    kd = F.lit(float(k))
    nd = n_.cast("double")
    total_d = F.col("total").cast("double")
    grand = total_d * total_d / (nd * kd)
    ss_rows_d = F.col("ss_rows").cast("double") / kd - grand
    ss_cols_d = F.col("ss_cols").cast("double") / nd - grand
    ss_tot = F.col("ss_cells").cast("double") - grand
    ss_err = ss_tot - ss_rows_d - ss_cols_d
    msr = ss_rows_d / (nd - F.lit(1.0))
    msc = ss_cols_d / (kd - F.lit(1.0))
    mse = ss_err / ((nd - F.lit(1.0)) * (kd - F.lit(1.0)))
    denom = (
        msr
        + (kd - F.lit(1.0)) * mse
        + (kd / nd) * (msc - mse)
    )
    return j.filter(n_ >= 2).select(
        n_.alias("n_days"),
        F.lit(int(k)).cast("int").alias("k_raters"),
        msr.alias("msr"),
        msc.alias("msc"),
        mse.alias("mse"),
        F.when(denom != 0.0, (msr - mse) / denom)
        .otherwise(F.lit(0.0))
        .alias("icc"),
    )


def _daily_cents_ea(events: DataFrame, group_col: str) -> DataFrame:
    """(g, d, y): daily exact-cent revenue per group (the timeseries
    module's shared contraction, local twin to avoid a cross-module
    import cycle)."""
    return (
        events.select(
            F.col(group_col).alias("g"),
            F.to_date("ts").alias("d"),
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("g", "d")
        .agg(F.sum("cents").alias("y"))
    )


def krippendorff_alpha(events: DataFrame) -> DataFrame:
    """Krippendorff's α (nominal, two raters) on the SAME paired
    user-grain observation :func:`stuart_maxwell` tests: each user's
    modal event type in the first vs second calendar half.  Completes
    the chance-corrected agreement family — Cohen's κ (two fixed
    raters), Fleiss' κ (many raters, fixed n), Stuart–Maxwell
    (marginal shift); α is the reliability face that generalizes to
    missing data and is THE standard for annotation-quality gates on
    training corpora.

    For two complete raters the coincidence matrix is ``o_ck = n_ck +
    n_kc``, so ``α = 1 − D_o/D_e`` reduces to exact integers:
    ``D_o·N = 2·offdiag``, ``D_e·N(N−1) = N² − Σ_c m_c²`` with margins
    ``m_c = row_c + col_c`` and ``N = 2·n_units`` — the final α is ONE
    IEEE division of exact BIGINTs (pinned tree, hash-comparable).

    Scale shape: identical to stuart_maxwell — one broadcast midpoint
    row, two user-grain argmax aggregates, then category-grain (k ≤ 3)
    margins.  Output one row: (n_units, do_pairs, de_num, alpha);
    α = 0.0 sentinel when D_e degenerates (all ratings one category).
    """
    kinds = ("click", "purchase", "view")
    days = events.select(F.to_date("ts").alias("d"))
    span = days.agg(F.min("d").alias("d0"), F.max("d").alias("d1")).select(
        F.expr(
            "date_add(d0, CAST(datediff(d1, d0) div 2 AS INT))"
        ).alias("mid")
    )
    tagged = (
        events.filter(F.col("event_type").isin(*kinds))
        .crossJoin(F.broadcast(span))
        .select(
            "user_id",
            (F.to_date("ts") <= F.col("mid")).alias("first_half"),
            "event_type",
        )
    )
    counts = tagged.groupBy("user_id", "first_half", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    modal = counts.groupBy("user_id", "first_half").agg(
        F.min_by(
            "event_type",
            F.struct((-F.col("cnt")).alias("neg"), "event_type"),
        ).alias("m")
    )
    pairs = (
        modal.filter(F.col("first_half"))
        .select("user_id", F.col("m").alias("m1"))
        .join(
            modal.filter(~F.col("first_half")).select(
                "user_id", F.col("m").alias("m2")
            ),
            "user_id",
        )
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        (
            F.lit(2)
            * F.sum((F.col("m1") != F.col("m2")).cast("bigint"))
        ).cast("bigint").alias("do_pairs"),
    )
    margins = (
        pairs.select(F.explode(F.array("m1", "m2")).alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .agg(F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("sum_sq"))
    )
    j = agg.join(F.broadcast(margins))
    de = (
        F.lit(4) * F.col("n_units") * F.col("n_units") - F.col("sum_sq")
    ).cast("bigint")
    num = (F.col("do_pairs") * (F.lit(2) * F.col("n_units") - F.lit(1))).cast(
        "bigint"
    )
    return j.filter(F.col("n_units") > 0).select(
        "n_units",
        "do_pairs",
        de.alias("de_num"),
        F.when(
            de > 0,
            F.lit(1.0) - num.cast("double") / de.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("alpha"),
    )
