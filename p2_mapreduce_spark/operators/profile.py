"""Table profiling — the one-pass column-statistics sweep every
ingest pipeline runs before trusting a new dataset.

One aggregate computes every column's profile simultaneously (Catalyst
evaluates all the aggregate expressions in a single partial→final pass —
the table is scanned ONCE no matter how many columns), then the 1-row
wide result unpivots to one row per column.  Values are surfaced as
strings so a single schema covers heterogeneous column types — the same
trick ``df.summary()`` uses, but deterministic (no approximate
quantiles) and therefore oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column profile: row count, null count, distinct count (exact),
    and min/max rendered as strings.

    Returns ``(column, n_rows, n_null, n_distinct, min_s, max_s)`` — one
    row per profiled column.  Distinct counts are exact (one expand per
    column inside the same aggregate); for quick-look profiling at
    extreme widths swap in ``approx_count_distinct`` — kept exact here
    so the driver can hash-check values.
    """
    names = list(cols) if cols is not None else list(df.columns)
    aggs = []
    for c in names:
        aggs.extend(
            [
                F.count(F.lit(1)).alias(f"{c}__rows"),
                F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__null"),
                F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
                F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            ]
        )
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__rows").alias("n_rows"),
            F.col(f"{c}__null").alias("n_null"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_s"),
            F.col(f"{c}__max").alias("max_s"),
        )
        for c in names
    ]
    return wide.select(
        F.explode(F.array(*per_col)).alias("p")
    ).select("p.*")
