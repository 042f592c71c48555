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
