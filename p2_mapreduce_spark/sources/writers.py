"""Sinks (reference S2 two-phase-commit store; M9/M10 output formats).

``df.write`` gets atomic visibility from the Hadoop commit protocol — the
same candidate→commit dance the reference hand-rolls (manager.go:365-429).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_tsv(df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite") -> None:
    """Golden-compatible TSV sink: ``key\\tvalue`` lines (reference final
    output format, storage-node/main.go:1351; controller aggregate
    manager.go:1133-1134).

    ``single_file=True`` mirrors the '-aggregate' single-output semantics
    via ``coalesce(1)`` — fine for golden files, wrong at 100 TB (one
    writer task); leave False in production and let each reducer write its
    own part file (the M10 path).
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("sep", "\t").option("header", "false").csv(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Columnar sink; ``partition_by`` gives partition-pruned reads for
    downstream queries (the scan-side half of scale hygiene)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
