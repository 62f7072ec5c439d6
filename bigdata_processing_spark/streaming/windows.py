"""Windowed streaming aggregations over the events stream.

Design: every aggregation here is written against a plain DataFrame, so
the SAME function body serves batch (``spark.read``) and streaming
(``spark.readStream``) inputs — batch-stream parity is a test invariant
(tests/test_streaming.py), mirroring how the batch month-bucketing
queries (SURVEY.md §2.3 P3) are the time-window analog.

Scale notes: watermarks bound state store size (without one, windowed
state grows forever at 100TB/day ingest); session windows use Spark's
native ``session_window`` merge rather than any custom state op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import table_path
from bigdata_processing_spark.functions.temporal import ntz_to_instant

# events.parquet carries naive timestamp[us] (TIMESTAMP_NTZ to Spark).
# Streaming watermarks require a real TIMESTAMP (instant), so the reader
# declares NTZ then converts wall-time→UTC-instant session-TZ-
# independently (functions.temporal.ntz_to_instant). Window boundaries
# on instants are epoch-aligned, matching the batch NTZ wall-time
# buckets exactly (fixture wall time is defined as UTC).
_EVENTS_SCHEMA_HINT = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """events as a file-source stream. The FileStreamSource watches a
    DIRECTORY for arriving files, so the single-file fixture is staged
    (symlinked) into a scratch dir — in production this is the landing
    directory files arrive in. Returns the same shape as
    catalog.load_table(..., 'events')."""
    import os
    import tempfile

    src = table_path(sf_dir, "events")
    stage = os.path.join(tempfile.gettempdir(), "bdps_stream", sf_dir.strip("/").replace("/", "_"))
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)

    reader = spark.readStream.schema(_EVENTS_SCHEMA_HINT)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(stage)
    return df.withColumn("ts", ntz_to_instant("ts"))


def tumbling_window_agg(events: DataFrame, width: str = "6 hours",
                        watermark: str = "1 hour") -> DataFrame:
    """Tumbling windows + watermark. Late rows beyond the watermark are
    dropped in streaming mode; in batch mode the watermark is a no-op —
    the parity invariant the tests assert."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("w"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def sliding_window_agg(events: DataFrame, width: str = "6 hours",
                       slide: str = "3 hours", watermark: str = "1 hour") -> DataFrame:
    """Sliding windows (each row lands in width/slide windows)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.avg("value").alias("avg_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def tumbling_window_distinct(events: DataFrame, width: str = "6 hours",
                             watermark: str = "1 hour",
                             rsd: float = 0.01) -> DataFrame:
    """Approximate distinct users per tumbling window
    (``approx_count_distinct`` = HyperLogLog++). Exact distinct is not
    incrementally aggregable in append-mode streaming without holding
    every key in state; the HLL sketch is the standard trade — O(1)
    mergeable state per window. The sketch is deterministic for a given
    input SET, so the batch run over the same data gives the identical
    estimate — the parity invariant the test asserts."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("w"))
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("approx_users"),
            F.count("*").alias("n_events"),
        )
        .select(F.col("w.start").alias("window_start"), "approx_users", "n_events")
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "1 hour") -> DataFrame:
    """Per-user session windows: events within ``gap`` of each other
    merge into one session (native session_window state merge)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def session_funnel_steps(events: DataFrame, gap: str = "30 minutes",
                         watermark: str = "1 hour") -> DataFrame:
    """Per-(user, session) FIRST-occurrence timestamps of the funnel
    steps view → click → purchase — the streaming twin of the batch
    ``session_funnel`` sessionization stage (queries/timeseries.py:641),
    built on the native ``session_window`` state merge like
    :func:`session_window_agg`.

    This is deliberately only the STATEFUL half of the funnel: the
    global conversion rollup is a second aggregation over the session
    rows, which append-mode streaming cannot chain after a session
    window — so the rollup stays a stateless batch step
    (:func:`funnel_rollup`) run over the sink via ``foreachBatch`` or
    on the sink table after the fact. Batch-stream parity of the
    composed pipeline is pinned in tests/test_streaming.py."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            first_ts("view").alias("t_view"),
            first_ts("click").alias("t_click"),
            first_ts("purchase").alias("t_buy"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "t_view",
            "t_click",
            "t_buy",
        )
    )


def funnel_rollup(steps: DataFrame) -> DataFrame:
    """Stateless global rollup over :func:`session_funnel_steps` rows —
    same ordered-step semantics and column names as the batch
    ``session_funnel`` query (a step counts only when its first
    occurrence follows the previous step's first occurrence in the same
    session; NULL comparisons fall out false)."""
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    bought = clicked & (F.col("t_buy") > F.col("t_click"))

    def as_int(c):
        return F.sum(F.when(c, 1).otherwise(0))

    return steps.agg(
        F.count("*").alias("n_sessions"),
        as_int(viewed).alias("viewed"),
        as_int(clicked).alias("clicked_after_view"),
        as_int(bought).alias("purchased_after_click"),
    )


def interval_stream_join(left: DataFrame, right: DataFrame,
                         key: str = "user_id",
                         left_watermark: str = "1 hour",
                         right_watermark: str = "1 hour",
                         within: str = "30 minutes",
                         how: str = "inner") -> DataFrame:
    """Stream-stream join: left rows match right rows with the same key
    whose timestamp falls in [left.ts - within, left.ts].

    Both sides carry watermarks + the time-range predicate so Spark can
    bound join state (without them, stream-stream join state grows
    forever). Works identically on batch inputs (parity-tested).

    ``how='left_outer'`` additionally emits NULL-padded rows for left
    rows that never matched — but only once the watermark passes the
    point where a match is provably impossible (state eviction), so the
    stream's outer rows TRAIL the data by watermark + within; rows still
    inside that horizon at stream end are withheld, not emitted wrong.
    That eviction-time emission is the semantic difference from a batch
    left join and is what tests/test_streaming.py pins down.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type: {how}")
    l = left.select(
        F.col(key).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
        F.col("value").alias("l_value"),
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", left_watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", right_watermark)
    cond = (
        (l.l_key == r.r_key)
        & (r.r_ts <= l.l_ts)
        & (r.r_ts >= l.l_ts - F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how).select(
        F.col("l_event_id"),
        F.col("r_event_id"),
        F.col("l_key").alias(key),
        F.col("l_value"),
    )


def run_stream_to_memory(spark: SparkSession, agg: DataFrame, name: str,
                         output_mode: str = "complete") -> DataFrame:
    """Drive a streaming aggregation to completion with availableNow
    (process-everything-then-stop) into an in-memory sink; returns the
    result table. Test/verification helper."""
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
