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
