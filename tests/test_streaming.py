"""Streaming slice: batch-stream parity + watermark plumbing.

The same window-aggregation function bodies run over a static read and a
file-source stream (availableNow trigger); results must agree — the
parity invariant from SURVEY.md step 6.
"""

from __future__ import annotations

import pytest

from conftest import SF_SMALL

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


def _rows(df, key_cols):
    return sorted(tuple(r) for r in df.select(*key_cols).collect())


@pytest.mark.parametrize(
    "agg_fn,cols,name",
    [
        (tumbling_window_agg, ["window_start", "n_events", "total_value"], "t_tumble"),
        (
            sliding_window_agg,
            ["window_start", "event_type", "n_events", "avg_value"],
            "t_slide",
        ),
        (
            session_window_agg,
            ["session_start", "user_id", "n_events", "total_value"],
            "t_session",
        ),
    ],
)
def test_batch_stream_parity(spark, agg_fn, cols, name):
    batch_events = load_table(spark, SF_SMALL, "events")
    batch_result = agg_fn(batch_events)

    stream_events = read_events_stream(spark, SF_SMALL)
    assert stream_events.isStreaming
    stream_result = run_stream_to_memory(spark, agg_fn(stream_events), name)

    b, s = _rows(batch_result, cols), _rows(stream_result, cols)
    assert len(b) > 0
    assert b == s


def test_stream_schema_matches_batch(spark):
    batch = load_table(spark, SF_SMALL, "events")
    stream = read_events_stream(spark, SF_SMALL)
    assert dict(stream.dtypes) == dict(batch.dtypes)
