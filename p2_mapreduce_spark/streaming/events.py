"""Event-time operators over the ``events`` table.

Batch first (driver-oracle-checkable), then the Structured Streaming twin
of the same aggregation — same logical plan, incremental execution with a
watermark for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from p2_mapreduce_spark.functions.numeric import dsum


def tumbling_window_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time window aggregate (batch).  ``window()`` is a
    plain projection (bucket = floor(ts)) followed by a hash aggregate —
    one shuffle on (bucket, event_type); partial aggs make the shuffle
    tiny at any scale."""
    return (
        events.groupBy(
            F.window("ts", width).start.alias("bucket_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("sum_value"),
        )
    )


def assign_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Event-level session assignment: the input rows plus a per-user
    ``session_seq`` (0-based) that increments whenever the idle gap
    exceeds ``gap_minutes``.  The building block :func:`sessionize`
    aggregates, and composable session-scoped analytics (e.g. the
    per-session funnel) group by.

    The event_id tie-break makes the lag/cumsum deterministic under
    equal timestamps; gap arithmetic is timestamp subtraction → an exact
    day-time interval, which works for both TIMESTAMP and TIMESTAMP_NTZ
    inputs (``unix_micros`` rejects NTZ) and never consults the session
    time zone — the cross-engine contract with the oracle's epoch_us
    difference on µs-truncated naive timestamps.
    """
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.withColumn(
        "is_break",
        (
            F.col("ts") - F.lag(F.col("ts"), 1).over(w_user)
            > F.expr(f"INTERVAL '{int(gap_minutes)}' MINUTE")
        ).cast("int"),
    ).withColumn(
        "session_seq",
        F.sum(F.coalesce(F.col("is_break"), F.lit(0))).over(
            w_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).drop("is_break")


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    longer than ``gap_minutes``.  lag + running cumsum over a per-user
    window — one shuffle on user_id; no Python.

    Skew note: a single hyperactive user serializes into one task; at
    100 TB bound sessions per user per day (composite partition key
    (user_id, date)) or move to ``session_window`` in streaming.
    """
    return assign_sessions(events, gap_minutes).groupBy(
        "user_id", "session_seq"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        dsum("value").alias("sum_value"),
    )


def sliding_window_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding event-time windows (batch): each event lands in
    width/slide buckets (here 2).  Spark's ``window(width, slide)``
    expands rows map-side before the hash aggregate — shuffle volume is
    (width/slide)× the tumbling case, the price of overlap; buckets are
    epoch-aligned (same origin the oracle reconstructs arithmetically)."""
    return events.groupBy(
        F.window("ts", width, slide).start.alias("bucket_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native ``session_window`` (gap-merged event-time sessions) in
    batch.  Same grouping semantics as :func:`sessionize`'s island
    algorithm but expressed as a first-class session window — Spark merges
    overlapping [ts, ts+gap) intervals per user in one shuffle; the
    window start is the session's first event time.

    The session_window column must be the grouping expression itself —
    interval merging happens inside the aggregation; projecting ``.start``
    before grouping would freeze each event's provisional [ts, ts+gap)
    window and nothing would merge."""
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("last_ts"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id",
            "n_events",
            "last_ts",
            "sum_value",
        )
    )


def as_event_time(df: DataFrame, *cols: str) -> DataFrame:
    """Normalize event-time columns to TIMESTAMP.  Parquet written without
    ``isAdjustedToUTC`` reads back as TIMESTAMP_NTZ, which Spark rejects
    as a watermark / event-time column
    (``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE``).  Under the engine's pinned
    UTC session the cast is a type re-tag — the naive wall-clock value is
    unchanged — so the streaming twins stay value-identical to their NTZ
    batch counterparts.  No-op for columns already TIMESTAMP."""
    for c in cols or ("ts",):
        if isinstance(df.schema[c].dataType, T.TimestampNTZType):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def dedup_events_stream(
    spark,
    source_dir: str,
    schema,
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_id",),
):
    """Streaming exact dedup — the streaming twin of
    operators/dedup.exact_dedup for an at-least-once event feed.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key and
    EVICTS entries older than the watermark, so state is bounded by
    (arrival-skew window × key rate), not by stream lifetime — the only
    formulation that survives an unbounded 100 TB/day feed.  Plain
    ``dropDuplicates`` on a stream would grow state forever; the batch
    operator can't see cross-batch duplicates at all."""
    stream = as_event_time(spark.readStream.schema(schema).parquet(source_dir))
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def purchase_signup_interval_join(
    purchases: DataFrame, signups: DataFrame, within: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Event-time interval join core: each purchase paired with every
    signup of the same user that happened at-or-before it, within
    ``within``.  Shared verbatim by the streaming twin and its batch
    oracle (one logical plan, two execution modes).

    ``how="left_outer"`` keeps unmatched purchases (null ``s_ts``) — in
    the streaming mode Spark emits those rows only when the watermark
    proves no future signup can match (state-eviction-as-result), so
    outer results trail the inner ones by the watermark delay."""
    return purchases.join(
        signups,
        (purchases.p_user == signups.s_user)
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr(f"INTERVAL {within}")),
        how,
    ).select("p_event", "p_user", "p_ts", "s_ts")


def stream_stream_join(
    spark,
    source_dir: str,
    schema,
    within: str = "2 hours",
    watermark: str = "2 hours",
    how: str = "inner",
):
    """Watermarked stream-stream interval join: purchases ⋈ signups of the
    same user within an event-time band.

    Both sides carry a watermark and the join condition bounds event-time
    distance, so Spark can EXPIRE buffered state: a signup older than
    (max event time − watermark − within) can never match a future
    purchase and is dropped.  Without both bounds a stream-stream join
    buffers one side forever — the state-boundedness contract is the
    whole design, same as the windowed aggs."""
    stream = as_event_time(spark.readStream.schema(schema).parquet(source_dir))
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    signups = (
        stream.filter(F.col("event_type") == "signup")
        .select(F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts"))
        .withWatermark("s_ts", watermark)
    )
    return purchase_signup_interval_join(purchases, signups, within, how)


def tumbling_window_stream(
    spark,
    source_dir: str,
    schema,
    width: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
):
    """Structured Streaming twin of :func:`tumbling_window_agg` (and of
    :func:`sliding_window_agg` when ``slide`` is given): file-source
    stream → watermark → windowed agg.  The watermark bounds state
    (buckets older than max(event time) - watermark are finalized and
    dropped) — the knob that keeps state finite on an unbounded stream.
    Caller starts it with ``.writeStream`` (tests use the memory sink +
    ``processAllAvailable``)."""
    stream = as_event_time(spark.readStream.schema(schema).parquet(source_dir))
    win = F.window("ts", width, slide) if slide else F.window("ts", width)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.start.alias("bucket_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )


def ohlc_rollup(events: DataFrame, width: str = "hour") -> DataFrame:
    """Hypertable-style OHLC rollup: per (time bucket, event_type) the
    opening/closing/high/low ``value`` plus count and exact sum — the
    continuous-aggregate downsampling a time-series store materializes.

    One projection + one hash aggregate (a shuffle on the bucket grain
    only — partial aggs shrink it map-side), same shape as
    :func:`tumbling_window_agg`; open/close use ``min_by``/``max_by``
    over a zero-padded ``(timestamp digits, event_id)`` string key,
    which makes the pick deterministic even when two events share a
    timestamp.  The timestamp digits come from ``date_format(ts,
    'yyyyMMddHHmmssSSSSSS')`` — fixed-width, so lexicographic on the
    padded key == lexicographic on the ``(ts, event_id)`` tuple, and on
    TIMESTAMP_NTZ it formats the naive value without consulting the
    session time zone (``unix_micros`` rejects NTZ outright).  The
    oracle orders by ``(epoch_us, event_id)``; both keys are strictly
    increasing in the tuple, so the pick agrees cross-engine.  A bare
    ``min_by(value, ts)`` would be partition-order-dependent on ties.
    """
    sort_key = F.concat(
        F.date_format(F.col("ts"), "yyyyMMddHHmmssSSSSSS"),
        F.format_string("%010d", F.col("event_id")),
    )
    return (
        events.groupBy(
            F.date_trunc(width, F.col("ts")).alias("bucket_start"),
            "event_type",
        )
        .agg(
            F.min_by("value", sort_key).alias("open"),
            F.max_by("value", sort_key).alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
    )


def bounce_rate(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user-cohort bounce analysis over gap sessions: how many
    sessions contain exactly one event ("bounces"), per session-length
    bucket — ``(n_events_bucket, n_sessions, bounce_ppm_of_total)`` —
    the engagement diagnostic layered on :func:`sessionize`.

    Work happens at SESSION grain (sessionize's one user-key shuffle
    already paid); the bucket histogram is a map-side-combined count
    over sessions, and the ppm share divides by a broadcast one-row
    total in exact integers.  Buckets: 1 (bounce), 2-4, 5-9, 10+.
    """
    sessions = sessionize(events, gap_minutes)
    bucket = (
        F.when(F.col("n_events") == 1, F.lit("1"))
        .when(F.col("n_events") <= 4, F.lit("2-4"))
        .when(F.col("n_events") <= 9, F.lit("5-9"))
        .otherwise(F.lit("10+"))
    )
    hist = sessions.groupBy(bucket.alias("n_events_bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    total = hist.agg(F.sum("n_sessions").alias("total"))
    return hist.crossJoin(F.broadcast(total)).select(
        "n_events_bucket",
        "n_sessions",
        F.expr("n_sessions * 1000000 div total")
        .cast("bigint")
        .alias("share_ppm"),
    )


def enrich_stream(
    events_stream: DataFrame,
    dim: DataFrame,
    key: str = "event_type",
) -> DataFrame:
    """Stream-static dimension enrichment — the canonical streaming
    star join: every micro-batch broadcast-joins the (small, static)
    dimension table; the stream side never shuffles for the join and
    no state is kept (stream-static joins are stateless by
    construction, unlike stream-stream).  Left join so dimension
    misses SURVIVE as nulls (quarantine-at-the-edge, not row loss) —
    at 100 TB the dimension refresh is a new batch DataFrame swapped
    in between restarts, the standard slowly-refreshing-dim pattern.
    """
    from pyspark.sql import functions as F

    return events_stream.join(F.broadcast(dim), key, "left")
