"""Streaming sinks.

``writeStream.foreachBatch`` is the escape hatch for sinks Spark has no
native connector for (JDBC upserts, vector stores, feature stores).  The
pattern that keeps it exactly-once: make each micro-batch write IDEMPOTENT
on (sink, batch_id) — a replayed batch (possible after any failure between
sink commit and checkpoint commit) then overwrites its own previous
output instead of duplicating it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def windowed_upsert_sink(
    agg_stream: DataFrame, path: str, checkpoint: str, partition_col: str
):
    """Materialized windowed aggregate with UPSERT semantics and no
    external table format: each micro-batch rewrites ONLY the hive
    partitions (e.g. window buckets) it touched, via dynamic partition
    overwrite.  Late data that updates an old bucket overwrites that
    bucket's partition with the new totals — readers always see complete
    buckets, replays are idempotent (same bucket → same content), and
    untouched history is never rewritten.  This is the foreachBatch
    answer to "streaming MERGE INTO" when Delta/Iceberg isn't available;
    the update-mode output stream supplies exactly the changed buckets.

    Requires a deterministic ``partition_col`` that is the FULL group key
    of the aggregate: update mode emits only changed rows, so if a
    partition held multiple groups a rewrite would drop the unchanged
    siblings.  One bucket == one group == one partition.  Returns the
    started query."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                df.write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)

    return (
        agg_stream.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def parquet_batch_sink(stream_df: DataFrame, path: str, checkpoint: str):
    """File sink via foreachBatch where every micro-batch owns the
    ``batch_id=N`` directory: replays overwrite, never duplicate.  (The
    native parquet sink has its own log-based exactly-once; this is the
    TEMPLATE for sinks that don't — swap the body for the JDBC/vector
    upsert keyed on batch_id.)  Returns the started query."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )
