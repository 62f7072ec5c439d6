"""Streaming CMS (streaming/sketches.py): micro-batch merge parity with
the batch sketch, replay suppression, and crash-window recovery."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from conftest import SF_SMALL
from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.operators.sketches import cms_estimates
from bigdata_processing_spark.streaming.sketches import (
    LEDGER_KEEP,
    cms_merge_batch,
    cms_state_estimates,
    committed_batches,
    read_cms_state,
    recover_cms_state,
    run_cms_stream,
)


def _staged_events(spark, tmp_path, n_files=3):
    """The events fixture split into n parquet files that a file-source
    stream picks up one per trigger."""
    stage = os.path.join(str(tmp_path), "ev_stage")
    scratch = os.path.join(str(tmp_path), "ev_scratch")
    events = load_table(spark, SF_SMALL, "events").select("event_id", "user_id")
    events.withColumn(
        "part", F.pmod(F.col("event_id"), n_files)
    ).write.partitionBy("part").parquet(scratch)
    os.makedirs(stage)
    i = 0
    for root, _dirs, files in os.walk(scratch):
        for f in files:
            if f.endswith(".parquet"):
                shutil.copyfile(
                    os.path.join(root, f), os.path.join(stage, f"f{i}.parquet")
                )
                i += 1
    return stage, events


def test_streaming_cms_parity_with_batch(spark, tmp_path):
    """Merging per-micro-batch sketches cell-wise gives bit-identical
    estimates to sketching the whole table at once — regardless of how
    rows fell into batches."""
    stage, events = _staged_events(spark, tmp_path)
    state = os.path.join(str(tmp_path), "cms_state")
    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = run_cms_stream(
        stream, state, key="user_id",
        checkpoint=os.path.join(str(tmp_path), "ckpt"),
    )
    q.awaitTermination()
    assert len(committed_batches(state)) >= 2  # genuinely incremental

    probes = events.select("user_id").distinct()
    got = {
        r.user_id: r.cms_est
        for r in cms_state_estimates(spark, state, probes, "user_id").collect()
    }
    want = {
        r.user_id: r.cms_est
        for r in cms_estimates(events, "user_id", probes).collect()
    }
    assert got == want
    # state is the d×w matrix, not per-key rows
    assert read_cms_state(spark, state).count() <= 3 * 256


def test_streaming_cms_replayed_batch_is_skipped(spark, tmp_path):
    """foreachBatch replays must not double-count: a committed batch_id
    no-ops and leaves the cell table untouched."""
    events = load_table(spark, SF_SMALL, "events").select("user_id")
    state = os.path.join(str(tmp_path), "cms_state")
    assert cms_merge_batch(state, events, 0, "user_id") is True
    before = sorted(
        tuple(r) for r in read_cms_state(spark, state).collect()
    )
    assert cms_merge_batch(state, events, 0, "user_id") is False  # replay
    after = sorted(tuple(r) for r in read_cms_state(spark, state).collect())
    assert after == before
    # a NEW batch id does merge: every cell count doubles
    assert cms_merge_batch(state, events, 1, "user_id") is True
    doubled = {
        (r.i, r.b): r.c for r in read_cms_state(spark, state).collect()
    }
    assert doubled == {(i, b): 2 * c for (i, b), c in
                       {(r[0], r[1]): r[2] for r in before}.items()}


def test_streaming_cms_ledger_swaps_with_cells(spark, tmp_path):
    """The commit marker lives inside the cells dir and swaps in with the
    data: a crash that strands the staged output before the rename leaves
    the batch uncommitted, so the foreachBatch replay merges it exactly
    once — there is no window where the data is merged but the marker
    missing (the double-count hazard of a ledger-written-after-swap)."""
    events = load_table(spark, SF_SMALL, "events").select("user_id")
    state = os.path.join(str(tmp_path), "cms_state")
    cms_merge_batch(state, events, 0, "user_id")
    before = {(r.i, r.b): r.c for r in read_cms_state(spark, state).collect()}
    cells = os.path.join(state, "cells")
    # simulate: batch 1 fully staged (data + its ledger) but crash before swap
    shutil.copytree(cells, cells + ".merging")
    assert committed_batches(state) == {0}  # staged marker is not live
    # the replay discards the stranded scratch and merges exactly once
    assert cms_merge_batch(state, events, 1, "user_id") is True
    after = {(r.i, r.b): r.c for r in read_cms_state(spark, state).collect()}
    assert after == {k: 2 * v for k, v in before.items()}
    assert committed_batches(state) == {0, 1}


def test_streaming_cms_legacy_ledger_honored(spark, tmp_path):
    """A state dir written by the pre-atomic layout (markers in
    state/_batches beside the cells dir, not inside it) must still
    suppress replays after upgrade: fall back to the legacy ledger when
    cells/_committed is absent, and migrate on the next commit."""
    events = load_table(spark, SF_SMALL, "events").select("user_id")
    state = os.path.join(str(tmp_path), "cms_state")
    cms_merge_batch(state, events, 0, "user_id")
    before = sorted(tuple(r) for r in read_cms_state(spark, state).collect())
    # rewrite the state into the LEGACY shape: marker beside the cells
    cells = os.path.join(state, "cells")
    shutil.rmtree(os.path.join(cells, "_committed"))
    legacy = os.path.join(state, "_batches")
    os.makedirs(legacy)
    open(os.path.join(legacy, "0"), "w").close()

    assert committed_batches(state) == {0}  # read through the fallback
    assert cms_merge_batch(state, events, 0, "user_id") is False  # replay
    assert sorted(
        tuple(r) for r in read_cms_state(spark, state).collect()
    ) == before
    # a new batch migrates the union into the in-cells ledger
    assert cms_merge_batch(state, events, 1, "user_id") is True
    assert os.path.isdir(os.path.join(cells, "_committed"))
    assert committed_batches(state) == {0, 1}


def test_streaming_cms_ledger_bounded(spark, tmp_path):
    """Markers more than LEDGER_KEEP behind the newest batch are pruned
    at commit, and a pruned (ancient) batch_id is still replay-suppressed."""
    events = load_table(spark, SF_SMALL, "events").select("user_id").limit(10)
    state = os.path.join(str(tmp_path), "cms_state")
    cms_merge_batch(state, events, 0, "user_id")
    cms_merge_batch(state, events, LEDGER_KEEP + 5, "user_id")
    assert committed_batches(state) == {LEDGER_KEEP + 5}
    assert cms_merge_batch(state, events, 0, "user_id") is False


def test_streaming_cms_crash_window_recovery(spark, tmp_path):
    """A crash between rename(cells→old) and rename(tmp→cells) leaves
    the matrix parked at .old; the next merge heals it first and the
    final counts come out as if the crash never happened."""
    events = load_table(spark, SF_SMALL, "events").select("user_id")
    state = os.path.join(str(tmp_path), "cms_state")
    cms_merge_batch(state, events, 0, "user_id")
    cells = os.path.join(state, "cells")
    os.rename(cells, cells + ".old")  # simulate the crash window
    recover_cms_state(state)
    assert os.path.isdir(cells) and not os.path.isdir(cells + ".old")
    cms_merge_batch(state, events, 1, "user_id")
    total = read_cms_state(spark, state).agg(F.sum("c")).collect()[0][0]
    assert total == 2 * events.count() * 3  # both batches, depth=3 rows each


def test_streaming_bottomk_parity_and_idempotent_replay(spark, tmp_path):
    """The streamed bottom-k sample equals the batch sample of the same
    rows (the md5 hash picks identical rows however they arrived), and
    re-merging a batch is a no-op — set-union idempotence is the
    exactly-once mechanism, no ledger involved."""
    from bigdata_processing_spark.operators.sketches import bottomk_sample
    from bigdata_processing_spark.streaming.sketches import (
        bottomk_merge_batch,
        read_bottomk_state,
        run_bottomk_stream,
    )

    stage, events = _staged_events(spark, tmp_path)
    state = os.path.join(str(tmp_path), "bk_state")
    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = run_bottomk_stream(
        stream, state, id_col="event_id", group_cols=["user_id"], k=8,
        checkpoint=os.path.join(str(tmp_path), "ckpt"),
    )
    q.awaitTermination()

    got = {
        (r.user_id, r.event_id)
        for r in read_bottomk_state(spark, state).collect()
    }
    want = {
        (r.user_id, r.event_id)
        for r in bottomk_sample(events, "event_id", ["user_id"], k=8).collect()
    }
    assert got == want

    # replaying an arbitrary slice of already-merged rows: state unchanged
    bottomk_merge_batch(
        state, events.limit(50), id_col="event_id",
        group_cols=["user_id"], k=8,
    )
    after = {
        (r.user_id, r.event_id)
        for r in read_bottomk_state(spark, state).collect()
    }
    assert after == got
