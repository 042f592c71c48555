"""Streaming debounce (applyInPandasWithState) pinned against the batch
event_dedup islands."""

from pyspark.sql import functions as F

from p2_mapreduce_spark.operators.events_analytics import event_dedup
from p2_mapreduce_spark.session import load_table
from p2_mapreduce_spark.streaming.stateful import debounce_stream


def test_debounce_stream_matches_batch_islands(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev")
    # one file => in-order arrival within the single micro-batch, the
    # regime where stream survivors == batch islands exactly
    events.coalesce(1).write.mode("overwrite").parquet(src)
    out = debounce_stream(
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        window_seconds=60,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("debounce_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["event_id"]
            for r in spark.sql("SELECT * FROM debounce_out").collect()
        }
    finally:
        q.stop()
    want = {r["event_id"] for r in event_dedup(events, 60).collect()}
    assert got == want


def test_debounce_state_survives_across_batches(spark, sf_dir, tmp_path):
    """An island spanning two micro-batches must stay ONE island: the
    second batch's continuation events are suppressed by carried state."""
    import datetime as dt

    T0 = dt.datetime(2024, 1, 1)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    b1 = [(1, T0, 7, "click", 1.0, "{}"),
          (2, T0 + dt.timedelta(seconds=30), 7, "click", 1.0, "{}")]
    b2 = [(3, T0 + dt.timedelta(seconds=55), 7, "click", 1.0, "{}"),
          (4, T0 + dt.timedelta(seconds=200), 7, "click", 1.0, "{}")]
    src = str(tmp_path / "ev")
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    out = debounce_stream(
        spark.readStream.schema(
            spark.createDataFrame(b1, schema).schema
        ).option("maxFilesPerTrigger", "1").parquet(src),
        window_seconds=60,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("debounce_out2")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            r["event_id"]
            for r in spark.sql("SELECT * FROM debounce_out2").collect()
        )
    finally:
        q.stop()
    # event 3 continues batch-1's island (55-30=25s gap) even though it
    # arrives in a later micro-batch; event 4 starts a new island
    assert got == [1, 4]
