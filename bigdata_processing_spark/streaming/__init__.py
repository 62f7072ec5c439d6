"""Structured Streaming slice (SURVEY.md §2.11, build-plan step 6).

The reference is batch-only; this surface is the north-star extension:
file-source streams over the ``events`` fixture with tumbling/sliding/
session windows, watermark-driven late-data handling, and batch-stream
parity (the same window expression runs in both modes).
"""

from bigdata_processing_spark.streaming.windows import (  # noqa: F401
    read_events_stream,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
