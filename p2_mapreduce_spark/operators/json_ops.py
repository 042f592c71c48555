"""Semi-structured (JSON) column operators.

The reference's only JSON is its internal shuffle encoding (JSON-lines of
KeyValue, storage-node/main.go:790-803) — never user-visible.  This module
is the *(derived)* user-facing version: parse a JSON string column, extract
typed fields, aggregate on them.  ``get_json_object``/``from_json`` are
JVM-side (Jackson) — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from p2_mapreduce_spark.functions.numeric import dsum
from p2_mapreduce_spark.session import spread


def map_ops(lineitem: DataFrame) -> DataFrame:
    """Map-type operator coverage: build map(l_linenumber → l_quantity)
    per order (``map_from_entries`` over a sorted entry list), then read
    it back with ``size`` / ``element_at`` / ``map_values`` + a decimal
    fold.  The oracle computes the same scalars relationally — pinning
    the map semantics (size = entry count, element_at by key, values
    preserve entry order) against plain SQL.

    Map keys must be UNIQUE (Spark fails on duplicates by default, and the
    fixture repeats line numbers within an order), so entries are
    pre-aggregated per (order, line) first — two shuffles that share the
    l_orderkey prefix, which AQE co-partitions.  Map construction and all
    lookups are per-row codegen; the values-fold accumulates in DECIMAL so
    the total is order-independent."""
    lines = lineitem.groupBy("l_orderkey", "l_linenumber").agg(
        dsum("l_quantity").alias("line_qty")
    )
    entries = F.array_sort(F.collect_list(F.struct("l_linenumber", "line_qty")))
    per = lines.groupBy("l_orderkey").agg(
        F.map_from_entries(entries).alias("m")
    )
    total = F.aggregate(
        F.transform(F.map_values("m"), lambda v: v.cast("decimal(18,2)")),
        F.lit(0).cast("decimal(28,2)"),
        # decimal + widens the type; fold it back to the accumulator type
        # (exact: order totals are nowhere near 26 integer digits)
        lambda acc, v: (acc + v).cast("decimal(28,2)"),
    ).cast("double")
    return per.select(
        "l_orderkey",
        F.size("m").alias("n_lines"),
        F.element_at(F.col("m"), F.lit(1)).alias("qty_line1"),
        total.alias("qty_total"),
    )


def json_props_agg(events: DataFrame) -> DataFrame:
    """Extract ``props.k`` (int) and aggregate per event_type.  ``spread``
    parallelizes the Jackson parse when the scan is a single split."""
    k = F.get_json_object("props", "$.k").cast("bigint")
    return spread(events).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        dsum("value").alias("sum_value"),
    )


def json_quarantine(
    events: DataFrame, props_col: str = "props"
) -> DataFrame:
    """Dead-letter ingest accounting: per event_type, how many payloads
    parse as JSON and how many quarantine — ``(event_type, n_rows,
    n_bad, bad_ppm, sum_k_good)`` — the PERMISSIVE-with-corrupt-record
    pattern, surfaced as an auditable summary instead of a silent drop.

    Validity = ``get_json_object(props, '$')`` non-null — the lenient
    JVM parser's own verdict, evaluated in the scan projection (zero
    shuffles before the one summary aggregate).  The good-row metric
    aggregates only rows that passed, exactly how a quarantine split
    feeds the main pipeline while bad rows land in a dead-letter sink.
    Note Spark's lenient parser ACCEPTS trailing garbage after a valid
    document; corruption tests must truncate, not append (pinned in
    pytest — the cross-engine-agreed invalid class).
    """
    valid = F.get_json_object(F.col(props_col), "$").isNotNull()
    k = F.get_json_object(F.col(props_col), "$.k").cast("bigint")
    out = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(~valid, 1).otherwise(0)).cast("bigint").alias("n_bad"),
        F.sum(F.when(valid, k)).cast("bigint").alias("sum_k_good"),
    )
    return out.select(
        "event_type",
        "n_rows",
        "n_bad",
        F.expr("n_bad * 1000000 div n_rows").cast("bigint").alias("bad_ppm"),
        "sum_k_good",
    )
