"""Streaming count-min sketch: heavy-hitter counts over an unbounded
stream with O(d×w) state, independent of stream length or key
cardinality.

CMS cells merge by plain cell-wise addition, so the streaming form is
a foreachBatch that sketches each micro-batch (operators/sketches.
cms_sketch) and adds it into a persisted cell table. State is the d×w
counter matrix — 768 rows at the defaults — which is why this scales
where dropDuplicates-style per-key state does not: a 100-TB stream of
near-unique URLs keeps the same 768-row state as the fixture.

Exactly-once: foreachBatch can replay a batch on failure, and addition
is NOT idempotent — unlike serving.py's upsert, a re-merged batch
double-counts. So the commit marker must be atomic with the state
swap: the batch-id ledger lives INSIDE the cells directory (an
underscore-prefixed subdir that parquet readers ignore, like
``_SUCCESS``) and is written into the staged output BEFORE the
rename(tmp→cells). One rename commits data and ledger together — a
crash anywhere leaves either the old cells+old ledger (batch
uncommitted, replay re-merges the old state) or the new cells+new
ledger (batch committed, replay no-ops). There is no window where the
data is merged but the marker missing. The mid-swap window (cells
parked at ``.old``) is healed by ``recover_cms_state``
(operators/compaction.recover_swap) before reading the ledger.

The ledger is bounded: markers older than ``LEDGER_KEEP`` behind the
newest batch are dropped at each commit (foreachBatch replays only
recent batches), and an ancient batch_id whose marker was pruned is
treated as committed.

Estimates from the merged state are bit-identical to a batch sketch of
the same rows (test_streaming parity): the portable md5 buckets don't
care how the rows were partitioned into micro-batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from bigdata_processing_spark.operators.compaction import recover_swap
from bigdata_processing_spark.operators.sketches import (
    CMS_DEPTH_DEFAULT,
    CMS_WIDTH_DEFAULT,
    cms_estimates_from_cells,
    cms_sketch,
)

_SWAP_SUFFIX = ".merging"
_LEDGER_DIR = "_committed"  # underscore prefix: invisible to parquet readers
LEDGER_KEEP = 1000


def _cells_path(state_path: str) -> str:
    return os.path.join(state_path, "cells")


def committed_batches(state_path: str) -> set[int]:
    """Batch ids whose merge is live in the cells directory. Callers
    racing a swap should ``recover_cms_state`` first (cms_merge_batch
    does)."""
    lp = os.path.join(_cells_path(state_path), _LEDGER_DIR)
    if os.path.isdir(lp):
        return {int(f) for f in os.listdir(lp)}
    # legacy layout (pre-atomic-ledger): markers lived beside the cells
    # dir at state/_batches. Honor them when the in-cells ledger is
    # absent so an upgraded state dir doesn't re-merge (double-count) a
    # replayed batch; the next commit rewrites the union into the new
    # in-cells ledger and the legacy dir goes stale harmlessly.
    legacy = os.path.join(state_path, "_batches")
    if os.path.isdir(legacy):
        return {int(f) for f in os.listdir(legacy)}
    return set()


def recover_cms_state(state_path: str) -> None:
    """Heal a crash inside the cells swap window (parked ``.old`` dir,
    orphaned ``.merging`` output) before applying the next batch."""
    recover_swap(_cells_path(state_path), _SWAP_SUFFIX)


def read_cms_state(spark: SparkSession, state_path: str) -> DataFrame | None:
    """The merged (i, b, c) cell table, or None before the first commit."""
    cells = _cells_path(state_path)
    if not os.path.isdir(cells):
        return None
    return spark.read.parquet(cells)


def cms_merge_batch(
    state_path: str,
    batch: DataFrame,
    batch_id: int,
    key: str,
    depth: int = CMS_DEPTH_DEFAULT,
    width: int = CMS_WIDTH_DEFAULT,
) -> bool:
    """Sketch one micro-batch and add it into the persisted cell table.
    Returns False (no-op) for an already-committed batch_id — the
    replay-suppression that makes the additive merge exactly-once. The
    merged table is written staged with its ledger inside and swapped in
    with one rename, so data and commit marker are never out of sync and
    readers never see a half-merged matrix."""
    recover_cms_state(state_path)
    seen = committed_batches(state_path)
    if batch_id in seen:
        return False
    if seen and batch_id <= max(seen) - LEDGER_KEEP:
        return False  # marker pruned, but a batch this old was committed

    spark = batch.sparkSession
    cells = _cells_path(state_path)
    new = cms_sketch(batch, key, depth, width)
    state = read_cms_state(spark, state_path)
    if state is not None:
        from pyspark.sql import functions as F

        new = (
            state.unionByName(new)
            .groupBy("i", "b")
            .agg(F.sum("c").alias("c"))
        )

    tmp = cells + _SWAP_SUFFIX
    old = cells + ".old"
    new.write.mode("overwrite").parquet(tmp)
    # ledger rides inside the staged dir: the rename below commits it
    # atomically with the cells it describes
    ld = os.path.join(tmp, _LEDGER_DIR)
    os.makedirs(ld, exist_ok=True)
    floor = batch_id - LEDGER_KEEP
    for b in {b for b in seen if b > floor} | {batch_id}:
        with open(os.path.join(ld, str(b)), "w"):
            pass

    if os.path.isdir(cells):
        import shutil

        shutil.rmtree(old, ignore_errors=True)
        os.rename(cells, old)
        os.rename(tmp, cells)
        shutil.rmtree(old)
    else:
        os.makedirs(state_path, exist_ok=True)
        os.rename(tmp, cells)
    return True


def run_cms_stream(
    stream: DataFrame,
    state_path: str,
    key: str,
    depth: int = CMS_DEPTH_DEFAULT,
    width: int = CMS_WIDTH_DEFAULT,
    checkpoint: str | None = None,
):
    """Wire a stream into the CMS state via foreachBatch; returns the
    started query (caller awaits/stops)."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: cms_merge_batch(state_path, df, bid, key, depth, width)
        )
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def cms_state_estimates(
    spark: SparkSession,
    state_path: str,
    probes: DataFrame,
    key: str,
    depth: int = CMS_DEPTH_DEFAULT,
    width: int = CMS_WIDTH_DEFAULT,
) -> DataFrame:
    """Count estimates for ``probes`` from the merged streaming state —
    same contract as the batch ``cms_estimates``."""
    cells = read_cms_state(spark, state_path)
    if cells is None:
        raise FileNotFoundError(f"no CMS state committed at {state_path}")
    return cms_estimates_from_cells(cells, key, probes, depth, width)


# ---------------------------------------------------------------------------
# Streaming bottom-k sample: the quantile sketch's streaming form.
# Unlike the CMS (additive counters — replay double-counts without the
# atomic ledger above), the bottom-k merge is a SET operation: union
# the stored sample with the batch's sample and re-cut to the k
# smallest hashes. Merging the same batch twice is a no-op (set union
# is idempotent), so exactly-once needs NO ledger at all — only the
# staged swap that keeps readers off half-written state. State is
# ≤ k rows per group forever, any stream length or cardinality.
# ---------------------------------------------------------------------------


def bottomk_merge_batch(
    state_path: str,
    batch: DataFrame,
    id_col: str,
    group_cols: list[str],
    k: int = 256,
) -> None:
    """Merge one micro-batch into the persisted per-group bottom-k
    sample (rows keep their input columns). Idempotent: replaying a
    batch unions rows already in the sample and the re-cut returns the
    identical state."""
    from bigdata_processing_spark.operators.sketches import bottomk_sample

    spark = batch.sparkSession
    cells = _cells_path(state_path)
    recover_swap(cells, _SWAP_SUFFIX)
    new = bottomk_sample(batch, id_col, group_cols, k)
    if os.path.isdir(cells):
        state = spark.read.parquet(cells)
        # distinct: replayed rows appear in both operands; the id hash
        # makes re-cutting the union exact (see operators/sketches)
        new = bottomk_sample(
            state.unionByName(new).distinct(), id_col, group_cols, k
        )
    tmp = cells + _SWAP_SUFFIX
    old = cells + ".old"
    new.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(cells):
        import shutil

        shutil.rmtree(old, ignore_errors=True)
        os.rename(cells, old)
        os.rename(tmp, cells)
        shutil.rmtree(old)
    else:
        os.makedirs(state_path, exist_ok=True)
        os.rename(tmp, cells)


def read_bottomk_state(spark: SparkSession, state_path: str) -> DataFrame | None:
    cells = _cells_path(state_path)
    if not os.path.isdir(cells):
        return None
    return spark.read.parquet(cells)


def run_bottomk_stream(
    stream: DataFrame,
    state_path: str,
    id_col: str,
    group_cols: list[str],
    k: int = 256,
    checkpoint: str | None = None,
):
    """Wire a stream into the bottom-k sample state via foreachBatch;
    returns the started query. Estimates over the state (quantiles,
    means, any statistic) equal estimates over a batch sample of the
    same rows — the md5 bottom-k picks identical rows regardless of
    how they arrived (test_streaming_sketches parity)."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda df, bid: bottomk_merge_batch(
                state_path, df, id_col, group_cols, k
            )
        )
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
