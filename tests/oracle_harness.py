"""Local mimic of the driver's t2 oracle check: run a queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet tables, compare
row count + column names + order-insensitive values.

Stricter than the driver on purpose: float values are compared EXACTLY
(the engine's oracle protocol is designed for bit-equality — exact decimal
aggregation surfaced as double, IEEE-deterministic scalar math), so any
drift shows up here before the driver sees it.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from p2_mapreduce_spark.session import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "tolist"):  # numpy arrays/scalars
        return _canon_cell(v.tolist())
    return str(v)


def _canon_frame(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(rows)


def assert_oracle_match(spark_df, sql: str, sf_dir: str, name: str = "?") -> None:
    spark_pdf = spark_df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        duck_pdf = con.sql(sql).df()
    finally:
        con.close()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"[{name}] column mismatch: spark={sorted(spark_pdf.columns)} "
        f"duckdb={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"[{name}] row count mismatch: spark={len(spark_pdf)} duckdb={len(duck_pdf)}"
    )
    s_rows, d_rows = _canon_frame(spark_pdf), _canon_frame(duck_pdf)
    if s_rows != d_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, d_rows) if a != b
        ][:5]
        raise AssertionError(f"[{name}] value mismatch; first diffs: {diffs}")
