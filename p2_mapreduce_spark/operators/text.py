"""Text operators: word count (the reference's flagship workload), token
extraction, and text-analysis extensions for LLM-data pipelines.

Reference parity: tokenize/wordcount reproduce mapreduce/functions/
wordcount.go:20-45 + the controller-aggregate output semantics
(manager.go:1092-1137: per-key totals, global key sort).  Everything else
in this module is (extension) surface per BASELINE.json.

All operators are pure built-in-function pipelines — no Python in the data
path — so at 100 TB they run fully inside whole-stage codegen with
map-side partial aggregation on every groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from p2_mapreduce_spark.functions.text import tokens_array
from p2_mapreduce_spark.session import spread


def tokenize(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per (doc, token): the map half (M1+M2) made relational."""
    return spread(docs).select(
        F.col(id_col), F.explode(tokens_array(F.col(text_col))).alias("word")
    )


def wordcount(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-word totals (M1-M8). Spark's partial aggregation gives the
    map-side combine the reference lacks (its shuffle volume equals the
    token count; ours equals distinct-words × partitions).  ``spread``
    parallelizes the tokenize stage when the scan is a single split."""
    return (
        spread(docs)
        .select(F.explode(tokens_array(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def wordcount_global(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The '-aggregate' path (M9): totals globally sorted by word.
    Distributed range-partitioned sort replaces the reference's
    single-threaded controller merge (manager.go:1092-1137)."""
    return wordcount(docs, text_col).orderBy("word")
