"""Structured Streaming twin: the streaming tumbling-window agg over the
events parquet must equal the batch operator's result (same logical plan,
incremental execution)."""

import pytest
from pyspark.sql import functions as F

from p2_mapreduce_spark.session import load_table
from p2_mapreduce_spark.streaming.events import (
    tumbling_window_agg,
    tumbling_window_stream,
)


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    # materialize with µs timestamps so the stream source reads a schema
    # Spark accepts (the raw fixture is TIMESTAMP(NANOS) — rejected by
    # the streaming parquet source just like the batch one)
    src = str(tmp_path / "events_us")
    events.write.mode("overwrite").parquet(src)

    batch = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 2))
        for r in tumbling_window_agg(events).collect()
    }

    stream_df = tumbling_window_stream(
        spark, src, schema=events.schema, width="1 hour", watermark="2 hours"
    )
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["bucket_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 2))
            for r in spark.sql("SELECT * FROM stream_out").collect()
        }
    finally:
        q.stop()

    assert set(got) == set(batch)
    for k, (n, s) in got.items():
        assert batch[k][0] == n
        assert abs(batch[k][1] - s) < 0.05  # double sum: stream order differs
