"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (word count, the reference's only
shipped workload) at sf0.001. ``queries()`` maps every implemented operator
from SURVEY.md §2 to a (spark, sf_dir) -> DataFrame callable;
``oracle_sql()`` provides the DuckDB-equivalent SQL for the correctness
gate. Column names/aliases are kept identical on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from p2_mapreduce_spark.session import load_table
from p2_mapreduce_spark.operators import text as text_ops

# Shared tokenizer regex — same semantics in Java regex (Spark) and RE2
# (DuckDB): split on runs of non-letter/non-digit, Unicode classes.
_TOK = r"[^\p{L}\p{N}]+"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: word count over documents, globally sorted (reference
    aggregate-path semantics, manager.go:1092-1137)."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return text_ops.wordcount_global(docs)


# --- queries ---------------------------------------------------------------


def _q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.wordcount(load_table(spark, sf_dir, "documents"))


def _q_wordcount_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.wordcount_global(load_table(spark, sf_dir, "documents"))


def _q_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.tokenize(load_table(spark, sf_dir, "documents"))


def _q_udf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic plugin-compat path (reference M14 + M1-M9): Python
    map/reduce fns shipped through the registry must agree with the
    columnar oracle."""
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.mapreduce import run_mapreduce
    from p2_mapreduce_spark.registry import wordcount_map, wordcount_reduce

    docs = load_table(spark, sf_dir, "documents")
    out = run_mapreduce(
        docs, wordcount_map, wordcount_reduce, key_col="doc_id", value_col="text"
    )
    return out.select(F.col("key").alias("word"), F.col("value").cast("bigint").alias("cnt"))


def _q_partition_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-insensitivity (reference M3): per-key totals must be
    identical under any reducer count R (here R=17 vs the default 4)."""
    from pyspark.sql import functions as F

    from p2_mapreduce_spark.mapreduce import run_mapreduce
    from p2_mapreduce_spark.registry import wordcount_map, wordcount_reduce

    docs = load_table(spark, sf_dir, "documents")
    out = run_mapreduce(
        docs,
        wordcount_map,
        wordcount_reduce,
        num_partitions=17,
        aggregate=False,
        key_col="doc_id",
        value_col="text",
    )
    return out.select(F.col("key").alias("word"), F.col("value").cast("bigint").alias("cnt"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "wordcount": _q_wordcount,
        "wordcount_global": _q_wordcount_global,
        "tokenize": _q_tokenize,
        "udf_roundtrip": _q_udf_roundtrip,
        "partition_count": _q_partition_count,
    }


def oracle_sql() -> dict[str, str]:
    wordcount_sql = f"""
        SELECT word, count(*) AS cnt
        FROM (
            SELECT lower(unnest(regexp_split_to_array(text, '{_TOK}'))) AS word
            FROM documents
        )
        WHERE word <> ''
        GROUP BY word
    """
    return {
        "wordcount": wordcount_sql,
        "wordcount_global": wordcount_sql + " ORDER BY word",
        "udf_roundtrip": wordcount_sql,
        "partition_count": wordcount_sql,
        "tokenize": f"""
            SELECT doc_id, word FROM (
                SELECT doc_id,
                       lower(unnest(regexp_split_to_array(text, '{_TOK}'))) AS word
                FROM documents
            )
            WHERE word <> ''
        """,
    }
