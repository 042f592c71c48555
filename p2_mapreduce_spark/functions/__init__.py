"""Columnar function library (JVM-side, codegen-friendly).

Everything here returns/manipulates ``pyspark.sql.Column`` objects so the
hot path stays inside whole-stage codegen; Python UDFs live only in
``p2_mapreduce_spark.registry`` (the plugin-compat plane) and the
pandas-UDF-backed extension operators.
"""

from p2_mapreduce_spark.functions.text import (
    TOKEN_SPLIT_REGEX,
    tokenize_column,
    tokens_array,
)

__all__ = ["TOKEN_SPLIT_REGEX", "tokenize_column", "tokens_array"]
