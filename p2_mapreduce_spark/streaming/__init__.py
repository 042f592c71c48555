"""Time-series / streaming operators (SURVEY.md §2.3 *(extension)*).

The reference is batch-only; these operators give the engine the
event-time surface a pipeline needs: tumbling/sliding windows,
gap-based sessionization, and Structured Streaming variants with
watermarked late-data handling."""

from p2_mapreduce_spark.streaming.events import (
    sessionize,
    tumbling_window_agg,
    tumbling_window_stream,
)

__all__ = ["sessionize", "tumbling_window_agg", "tumbling_window_stream"]
