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
