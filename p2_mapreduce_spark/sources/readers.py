"""Readers (reference S1 chunked scan, S5 list, S6 text sniff).

``spark.read`` replaces the whole client/controller/storage-node read path
(GetFile → chunk map → parallel replica fetch → reassembly, reference
cmd/client/main.go:276-345): splits, locality, retry and checksum
verification are Spark/parquet built-ins.  What we keep from the reference
is the *policy* surface: the text-format gate that MapReduce inputs must
pass (manager.go:748-752) and a uniform format dispatch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUPPORTED_FORMATS = ("parquet", "csv", "json", "text", "orc")


def is_text_file(path: str, probe_bytes: int = 1024) -> bool:
    """Reference S6 sniff (cmd/client/pfile/pfile.go:135-172): read the
    first KiB; text iff no NUL bytes and valid UTF-8.  Driver-side gate —
    runs once per input, not per record."""
    with open(path, "rb") as f:
        chunk = f.read(probe_bytes)
    if not chunk:
        return True
    if b"\x00" in chunk:
        return False
    try:
        chunk.decode("utf-8")
    except UnicodeDecodeError:
        # Allow a multi-byte sequence truncated by the probe boundary.
        try:
            chunk[: -4 if len(chunk) > 4 else 0].decode("utf-8")
        except UnicodeDecodeError:
            return False
    return True


def read_text_records(spark: SparkSession, path: str, require_text: bool = True) -> DataFrame:
    """Text file → ``DataFrame[filename string, contents string]``, one row
    per line — the MapReduce input surface (map input is (filename,
    contents), reference types.go:13).

    Line records instead of 4 MiB byte chunks is a deliberate semantic
    upgrade: the reference splits files at fixed byte offsets mid-token
    (manager.go:386), which corrupts boundary words; newline framing is
    the standard Spark/Hadoop fix and keeps one task per input split.
    """
    if require_text and os.path.isfile(path) and not is_text_file(path):
        raise ValueError(f"{path} is not a text file (reference manager.go:748-752 gate)")
    return spark.read.text(path).select(
        F.input_file_name().alias("filename"), F.col("value").alias("contents")
    )


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Uniform format dispatch with FAILFAST parsing (malformed records
    fail the job, mirroring the reference's refuse-don't-corrupt stance)."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; supported: {SUPPORTED_FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt in ("csv", "json"):
        options.setdefault("mode", "FAILFAST")
    return reader.format(fmt).options(**options).load(path)
