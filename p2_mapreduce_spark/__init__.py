"""p2_mapreduce_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference system
``Huimin22/P2-MapReduce`` (a Go GFS-style DFS + plugin MapReduce engine,
surveyed in SURVEY.md) as an idiomatic Apache Spark DataFrame/SQL engine,
extended with the LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) required for 100 TB-scale training-data
processing.

Design rules (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst plans everything declarative.
- Python only at the edges (Arrow-batched pandas UDFs), never per-row.
- Everything the reference does by hand (replication, heartbeats, shuffle
  transport, retries, checksums) is delegated to Spark + the storage layer.
"""

from p2_mapreduce_spark.session import get_spark, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables"]
__version__ = "0.1.0"
