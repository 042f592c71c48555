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
