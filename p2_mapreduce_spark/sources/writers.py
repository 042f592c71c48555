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


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_file_mb: int = 128,
    sort_by: list[str] | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ``ceil(bytes / target_file_mb)`` files — the standard maintenance pass
    after streaming/micro-batch ingest, where thousands of KB-sized files
    destroy scan throughput (per-file open cost + tiny row groups defeat
    both parallelism and compression).

    File count is derived from the dataset's ACTUAL on-disk bytes (Hadoop
    ``getContentSummary``), not row counts.  ``sort_by`` uses
    ``repartitionByRange`` + in-file sort so min/max row-group stats
    become selective (the poor man's Z-order for one key); without it a
    plain ``repartition`` round-robins for even file sizes.  Returns the
    output file count."""
    jvm = spark._jvm  # type: ignore[attr-defined]
    jpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())  # type: ignore[attr-defined]
    n_bytes = fs.getContentSummary(jpath).getLength()
    n_files = max(1, -(-int(n_bytes) // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    if sort_by:
        from pyspark.sql import functions as F

        cols = [F.col(c) for c in sort_by]
        df = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(dst)
    return n_files


def write_parquet_audited(
    df: DataFrame,
    path: str,
    metrics: dict[str, "Column"] | None = None,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Write parquet AND return audit metrics from the same pass —
    ``df.observe()`` attaches aggregate accumulators to the write job, so
    row counts / checksum sums cost zero extra scans (the naive
    ``df.count(); df.write...`` reads the data twice, which at 100 TB is
    the whole job twice).

    ``metrics`` defaults to a row count; pass named aggregate Columns
    (e.g. ``{"sum_qty": F.sum("l_quantity")}``) for content checksums.
    Returns the observed metric dict for the pipeline's audit ledger.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    if metrics is None:
        metrics = {"n_rows": F.count(F.lit(1))}
    obs = Observation("write_audit")
    observed = df.observe(obs, *[c.alias(k) for k, c in metrics.items()])
    writer = observed.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return obs.get


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Bucketed table sink: hash-bucket ``df`` by ``key`` into
    ``buckets`` files per partition (optionally sorted within each
    bucket) and register it in the session catalog.

    THE 100 TB join device: two tables bucketed by the same key into the
    same bucket count join with ZERO shuffle — Spark's scan reports the
    bucketing as its output partitioning, so the SortMergeJoin consumes
    both sides in place (and with ``sort=True`` the per-bucket sort is
    already on disk).  A nightly re-join of two 10 TB tables stops
    moving 20 TB over the network per run; the shuffle is paid ONCE at
    write time.  This is the storage-layout half of the co-located-join
    story (the runtime half is `repartition` — see salted_join for the
    skew face).

    Bucket pruning also serves point lookups: an equality predicate on
    ``key`` scans 1/``buckets`` of the files.

    Reference parity: the reference's FNV-1a `hash(key) mod R`
    intermediate-partition files (SURVEY.md M3,
    storage-node/main.go:783-787) ARE write-side buckets — this is that
    exact idea, persisted and catalog-visible.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark, left_table: str, right_table: str, key: str):
    """Join two same-key, same-count bucketed tables — shuffle-free by
    construction (pytest pins the plan: no Exchange on either side)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)
