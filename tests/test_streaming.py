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
    tumbling_window_distinct,
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
        (
            tumbling_window_distinct,
            ["window_start", "approx_users", "n_events"],
            "t_distinct",
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
    b, s = dict(batch.dtypes), dict(stream.dtypes)
    # ts differs by design: batch keeps the fixture's TIMESTAMP_NTZ wall
    # time; the stream converts to the equivalent UTC instant because
    # withWatermark rejects NTZ. Same wall clock, different flavor.
    assert b.pop("ts") == "timestamp_ntz"
    assert s.pop("ts") == "timestamp"
    assert s == b


def test_streaming_dedup_across_batches(spark, tmp_path):
    """dropDuplicates with watermark over a stream: re-delivered event
    ids in a later micro-batch are suppressed — the exactly-once-ish
    ingest dedup pattern for training pipelines."""
    import datetime as dt
    import os
    import shutil

    from pyspark.sql import functions as F

    schema = "event_id bigint, ts timestamp, value double"
    stage = os.path.join(str(tmp_path), "dedup_stream")
    os.makedirs(stage)

    def land(name, rows, mtime):
        scratch = os.path.join(str(tmp_path), f"__{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
        dst = os.path.join(stage, name)
        shutil.copyfile(os.path.join(scratch, part), dst)
        os.utime(dst, (mtime, mtime))

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    now = 1_700_000_000
    land("f1.parquet", [(1, t0, 1.0), (2, t0, 2.0)], now)
    # batch 2 re-delivers event 2 and adds event 3
    land("f2.parquet", [(2, t0, 2.0), (3, t0, 3.0)], now + 100)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.event_id for r in spark.table("t_dedup_stream").collect())
    assert got == [1, 2, 3]  # the duplicate delivery of 2 was suppressed


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """Restarting a checkpointed stream ingests only files that arrived
    since the last run — the recovery contract production ingest relies
    on."""
    import datetime as dt
    import os
    import shutil

    from pyspark.sql import functions as F

    schema = "event_id bigint, ts timestamp, value double"
    stage = os.path.join(str(tmp_path), "ckpt_stream")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    out = os.path.join(str(tmp_path), "ckpt_out")
    os.makedirs(stage)

    def land(name, rows, mtime):
        scratch = os.path.join(str(tmp_path), f"__{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
        dst = os.path.join(stage, name)
        shutil.copyfile(os.path.join(scratch, part), dst)
        os.utime(dst, (mtime, mtime))

    def run_once():
        stream = spark.readStream.schema(schema).parquet(stage)
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    now = 1_700_000_000
    land("f1.parquet", [(1, t0, 1.0), (2, t0, 2.0)], now)
    run_once()
    assert spark.read.parquet(out).count() == 2

    land("f2.parquet", [(3, t0, 3.0)], now + 100)
    run_once()  # resume from checkpoint: must append ONLY event 3
    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]


def test_stream_stream_join_parity(spark):
    """Stream-stream interval join (purchases ⋈ recent views) equals the
    same join on static inputs."""
    from pyspark.sql import functions as F

    from bigdata_processing_spark.streaming.windows import interval_stream_join

    batch = load_table(spark, SF_SMALL, "events")
    b_out = interval_stream_join(
        batch.filter(F.col("event_type") == "purchase"),
        batch.filter(F.col("event_type") == "view"),
    )
    stream = read_events_stream(spark, SF_SMALL)
    s_agg = interval_stream_join(
        stream.filter(F.col("event_type") == "purchase"),
        stream.filter(F.col("event_type") == "view"),
    )
    q = (
        s_agg.writeStream.format("memory")
        .queryName("t_ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cols = ["l_event_id", "r_event_id", "user_id", "l_value"]
    b = sorted(tuple(r) for r in b_out.select(*cols).collect())
    s = sorted(tuple(r) for r in spark.table("t_ssj").select(*cols).collect())
    assert len(b) > 0
    assert b == s


def test_foreach_batch_sink(spark, tmp_path):
    """foreachBatch: arbitrary batch sink logic per micro-batch (the
    engine's upsert/merge escape hatch)."""
    import os

    from pyspark.sql import functions as F

    out_dir = os.path.join(str(tmp_path), "fb_out")
    seen_batches = []

    def sink(batch_df, batch_id):
        seen_batches.append(batch_id)
        batch_df.write.mode("append").parquet(out_dir)

    stream = read_events_stream(spark, SF_SMALL)
    agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert seen_batches
    back = spark.read.parquet(out_dir)
    batch = load_table(spark, SF_SMALL, "events").groupBy("event_type").agg(
        F.count("*").alias("n")
    )
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in batch.collect()
    )


def test_watermark_drops_late_data(spark, tmp_path):
    """Two micro-batches: batch 1 advances the watermark; batch 2's
    too-late row must be dropped from its (already-closed) window,
    while its on-time row lands. Append mode only emits closed windows."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    def ev(eid, hhmm):
        h, m = divmod(hhmm, 100)
        return (eid, dt.datetime(2024, 1, 1, h, m), 1, "click", 1.0, "{}")

    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    stage = os.path.join(str(tmp_path), "late_stream")
    os.makedirs(stage)

    def land(name, rows, mtime):
        """Write a single parquet FILE into the landing dir (the file
        stream source does not recurse into subdirectories)."""
        import shutil

        scratch = os.path.join(str(tmp_path), f"__{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
        dst = os.path.join(stage, name)
        shutil.copyfile(os.path.join(scratch, part), dst)
        os.utime(dst, (mtime, mtime))

    now = 1_700_000_000
    # batch 0: window [10:00,11:00) gets 2 rows; the 13:00 row advances
    # event time so the watermark becomes 12:50 (10-minute delay).
    land("f1.parquet", [ev(1, 1005), ev(2, 1010), ev(3, 1300)], now)
    # batch 1: on-time row; the 12:50 watermark takes effect after this
    # batch (watermark application lags one batch behind registration).
    land("f2.parquet", [ev(9, 1310)], now + 100)
    # batch 2: 10:30 is beyond-late (watermark 12:50 >> window end 11:00)
    # → dropped; 13:30 is on time.
    land("f3.parquet", [ev(4, 1030), ev(5, 1330)], now + 200)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.ws.hour: r.n for r in spark.table("t_late").collect()}
    # the 10:00 window emitted with ONLY the two on-time rows — the late
    # 10:30 arrival (batch 2) was dropped by the watermark
    assert got.get(10) == 2, got
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
         if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    assert dropped == 1


def test_stream_stream_left_outer_emits_nulls_after_eviction(spark, tmp_path):
    """Left-outer stream-stream join: the matched row flows like the
    inner join; the UNMATCHED left row's NULL-padded result is emitted
    only after the watermark proves no future right row can match
    (state eviction). A far-future sentinel row pushes the watermark
    well past the real data so the eviction is forced deterministically;
    the sentinel itself is still inside the horizon and must be
    withheld."""
    import datetime as dt
    import os
    import shutil

    from pyspark.sql import functions as F

    from bigdata_processing_spark.streaming.windows import interval_stream_join

    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    stage = os.path.join(str(tmp_path), "lo_stream")
    os.makedirs(stage)

    def land(name, rows, mtime):
        scratch = os.path.join(str(tmp_path), f"__{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
        dst = os.path.join(stage, name)
        shutil.copyfile(os.path.join(scratch, part), dst)
        os.utime(dst, (mtime, mtime))

    def ev(eid, hour, minute, uid, etype):
        return (eid, dt.datetime(2024, 1, 1, hour, minute), uid, etype, 1.0, "{}")

    now = 1_700_000_000
    # batch 0: purchase u1@10:00 has a view u1@09:50 inside the 30-min
    # interval; purchase u2@10:00 has no view at all.
    land("f1.parquet",
         [ev(1, 10, 0, 1, "purchase"), ev(2, 10, 0, 2, "purchase"),
          ev(3, 9, 50, 1, "view")], now)
    # batch 1: sentinels 10h later on BOTH sides — the join's eviction
    # clock is the GLOBAL watermark (min over both inputs' watermarks,
    # multipleWatermarkPolicy=min), so each side must advance past
    # 19:00 (1h delay), far beyond 10:00 + 30min, to force eviction of
    # u2's row. Disjoint sentinel users so the sentinels don't match.
    land("f2.parquet",
         [ev(99, 20, 0, 99, "purchase"), ev(98, 20, 0, 98, "view")],
         now + 100)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    joined = interval_stream_join(
        stream.filter(F.col("event_type") == "purchase"),
        stream.filter(F.col("event_type") == "view"),
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_lo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r.l_event_id: r for r in spark.table("t_lo").collect()}
    # matched pair emitted with the view's id
    assert rows[1].r_event_id == 3
    # unmatched left row evicted -> NULL-padded outer result
    assert rows[2].r_event_id is None
    # sentinel is newer than the final watermark: withheld, not NULL-padded
    assert 99 not in rows

    # batch twin on the same rows: a plain left join (no eviction
    # horizon), so it ALSO carries the sentinel's null row — the
    # documented semantic gap between the modes.
    batch = spark.createDataFrame(
        [ev(1, 10, 0, 1, "purchase"), ev(2, 10, 0, 2, "purchase"),
         ev(3, 9, 50, 1, "view"), ev(99, 20, 0, 99, "purchase"),
         ev(98, 20, 0, 98, "view")], schema)
    b = interval_stream_join(
        batch.filter(F.col("event_type") == "purchase"),
        batch.filter(F.col("event_type") == "view"),
        how="left_outer",
    )
    brows = {r.l_event_id: r.r_event_id for r in b.collect()}
    assert brows == {1: 3, 2: None, 99: None}


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate keys arriving within the
    watermark delay are emitted once; state for a key is bounded by the
    watermark (unlike plain dropDuplicates, whose streaming state grows
    forever). A later re-send below the advanced watermark is late data
    and must not re-emit."""
    import datetime as dt
    import os
    import shutil

    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    stage = os.path.join(str(tmp_path), "ddw_stream")
    os.makedirs(stage)

    def land(name, rows, mtime):
        scratch = os.path.join(str(tmp_path), f"__{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(scratch)
        part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
        dst = os.path.join(stage, name)
        shutil.copyfile(os.path.join(scratch, part), dst)
        os.utime(dst, (mtime, mtime))

    def ev(eid, hour):
        return (eid, dt.datetime(2024, 1, 1, hour, 0), 1, "click", 1.0, "{}")

    now = 1_700_000_000
    # batch 0: first occurrence of key 1, twice in the same batch
    land("f1.parquet", [ev(1, 10), ev(1, 10)], now)
    # batch 1: key 1 again within the watermark (dropped as duplicate);
    # sentinel advances the watermark to 19:00
    land("f2.parquet", [ev(1, 10), ev(99, 20)], now + 100)
    # batch 2: key 1 re-sent at its original 10:00 event time — now LATE
    # (watermark 19:00): discarded by the watermark, not re-emitted
    land("f3.parquet", [ev(1, 10)], now + 200)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    dedup = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id")
    )
    q = (
        dedup.writeStream.format("memory")
        .queryName("t_ddw")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.event_id for r in spark.table("t_ddw").collect())
    assert got == [1, 99], got


def test_session_funnel_stream_parity(spark, tmp_path):
    """Streaming funnel (session_window steps + foreachBatch sink +
    stateless rollup) must reproduce the batch session_funnel query's
    single conversion row exactly (VERDICT r03 item 5).

    The foreachBatch sink snapshots the complete-mode session table per
    micro-batch (overwrite = upsert-to-latest); the rollup then runs as
    a plain batch agg over the final snapshot — the two-stage shape that
    sidesteps append-mode's one-stateful-agg limit."""
    import os

    from bigdata_processing_spark.queries.timeseries import session_funnel
    from bigdata_processing_spark.streaming.windows import (
        funnel_rollup,
        session_funnel_steps,
    )

    batch = session_funnel(spark, SF_SMALL).collect()[0]

    out_dir = os.path.join(str(tmp_path), "funnel_steps")

    def sink(batch_df, _batch_id):
        batch_df.write.mode("overwrite").parquet(out_dir)

    stream = read_events_stream(spark, SF_SMALL)
    q = (
        session_funnel_steps(stream)
        .writeStream.outputMode("complete")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = funnel_rollup(spark.read.parquet(out_dir)).collect()[0]
    assert (
        got.n_sessions,
        got.viewed,
        got.clicked_after_view,
        got.purchased_after_click,
    ) == (
        batch.n_sessions,
        batch.viewed,
        batch.clicked_after_view,
        batch.purchased_after_click,
    )
    assert got.n_sessions > 0


def test_session_funnel_batch_twin_same_functions(spark):
    """The same session_funnel_steps/funnel_rollup bodies run on a plain
    batch frame (watermark no-op) — the batch-stream one-source-of-truth
    invariant the other window aggs keep."""
    from bigdata_processing_spark.queries.timeseries import session_funnel
    from bigdata_processing_spark.streaming.windows import (
        funnel_rollup,
        session_funnel_steps,
    )

    events = load_table(spark, SF_SMALL, "events")
    got = funnel_rollup(session_funnel_steps(events)).collect()[0]
    want = session_funnel(spark, SF_SMALL).collect()[0]
    assert tuple(got) == tuple(want)


def test_streaming_curation_front_parity(spark, tmp_path):
    """Streaming quality-floor + fingerprint dedup (streaming/curation)
    lands the same SET of surviving fingerprints as the batch stages —
    survivor identity within a fingerprint group is arrival-order in
    streaming vs min-id in batch, so parity is on fingerprints and
    counts, plus the quality floor holds on every landed row."""
    import os

    from pyspark.sql import functions as F

    from bigdata_processing_spark.catalog import load_table
    from bigdata_processing_spark.functions import text as T
    from bigdata_processing_spark.pipelines.curation import QUALITY_MIN, _quality_score
    from bigdata_processing_spark.streaming.curation import (
        curate_stream,
        read_documents_stream,
    )

    out_dir = os.path.join(str(tmp_path), "landing")

    stream = read_documents_stream(spark, SF_SMALL)
    assert stream.isStreaming
    q = (
        curate_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    landed = spark.read.parquet(out_dir)
    batch = curate_stream(load_table(spark, SF_SMALL, "documents"))

    s_fps = {r.fp for r in landed.select("fp").collect()}
    b_fps = {r.fp for r in batch.select("fp").collect()}
    assert s_fps == b_fps and len(s_fps) > 0
    assert landed.count() == len(s_fps)  # no duplicate fingerprints landed
    n_low = landed.filter(_quality_score() < QUALITY_MIN).count()
    assert n_low == 0
