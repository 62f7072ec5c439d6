"""Streaming → serving-table sink: idempotent keyed upsert via
foreachBatch.

Structured Streaming guarantees foreachBatch is called with a
monotonically increasing ``batch_id``, and REPLAYS a batch after
failure/restart — so an exactly-once serving table needs the sink
itself to be idempotent. Two pieces provide it:

1. **Batch ledger**: a committed-batch marker written AFTER the table
   swap. A replayed batch_id is detected and skipped, making the whole
   sink an at-most-once-effect function of batch_id.
2. **Merge by key + atomic swap**: existing rows losing to the batch on
   ``key_cols`` are anti-joined away, the union is rewritten to a
   temp dir, and directories swap only after the write commits (same
   swap discipline as operators/compaction.py) — readers never observe
   a half-merged table.

This is the poor man's MERGE INTO; a lakehouse format would replace the
swap with a transactional commit (ROADMAP). State sizing at scale: the
rewrite cost is O(serving table), so partition the serving table and
merge only touched partitions (partition_col option below).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _ledger_path(path: str) -> str:
    return path.rstrip("/") + "._batches"


def committed_batches(path: str) -> set[int]:
    lp = _ledger_path(path)
    if not os.path.isdir(lp):
        return set()
    return {int(f) for f in os.listdir(lp)}


def _staging_root(serving_path: str) -> str:
    """Scratch space for in-flight merges. Lives INSIDE the table root but
    dot-prefixed: Spark/Hive partition discovery skips names starting with
    ``.`` or ``_``, so concurrent readers never see half-written rows or
    phantom ``<col>=<p>.merging`` partitions."""
    return os.path.join(serving_path, ".staging")


def _swap_in(target: str, tmp: str, old: str) -> None:
    """Replace ``target`` with ``tmp``, parking the previous contents at
    ``old`` (same filesystem, so each step is one atomic rename). ``old``
    must live where readers won't discover it (a sibling suffix dir for
    the whole-table swap, the staging root for partition swaps)."""
    if os.path.isdir(target):
        shutil.rmtree(old, ignore_errors=True)
        os.rename(target, old)
        os.rename(tmp, target)
        shutil.rmtree(old)
    else:
        os.makedirs(os.path.dirname(target), exist_ok=True)
        os.rename(tmp, target)


def _recover(serving_path: str) -> None:
    """Heal any interrupted merge before applying a new batch. The swap's
    only non-atomic window is between ``rename(target→old)`` and
    ``rename(tmp→target)``; a crash there leaves the data parked at
    ``old`` and the target missing — restore it, or a replayed merge
    would see an empty table and silently drop every survivor row.
    Leftover ``.merging`` output is always discardable (never yet live).
    """
    from bigdata_processing_spark.operators.compaction import recover_swap

    # whole-table swap staging (siblings of the table root)
    recover_swap(serving_path, ".merging")
    # per-partition swap staging (.staging/<col>=<p>.old|.merging)
    stage = _staging_root(serving_path)
    if os.path.isdir(stage):
        for name in os.listdir(stage):
            p = os.path.join(stage, name)
            if name.endswith(".old"):
                dest = os.path.join(serving_path, name[: -len(".old")])
                if os.path.isdir(dest):
                    shutil.rmtree(p)
                else:
                    os.rename(p, dest)
            else:
                shutil.rmtree(p, ignore_errors=True)
    # dynamic-overwrite staging: Spark's own job-commit scratch. Never
    # live data (job commit republishes it), invisible to discovery
    # (dot/underscore-prefixed) — just reclaim the space.
    if os.path.isdir(serving_path):
        for name in os.listdir(serving_path):
            if name.startswith(".spark-staging") or name == "_temporary":
                shutil.rmtree(os.path.join(serving_path, name),
                              ignore_errors=True)


# Ledger entries older than this many batches behind the newest are
# pruned at commit time: Structured Streaming replays only the batch
# in flight at failure (batch_ids are monotonic), so detection never
# needs deep history — without pruning the ledger dir grows one file
# per micro-batch forever and committed_batches() becomes an
# ever-larger listing on every batch.
LEDGER_KEEP = 1000


def upsert_batch(serving_path: str, key_cols: tuple[str, ...],
                 batch_df: DataFrame, batch_id: int,
                 partition_col: str | None = None,
                 dynamic_threshold: int = 32) -> bool:
    """Merge one micro-batch into the serving table; returns False if the
    batch was already committed (replay detected).

    With ``partition_col``, the table is laid out hive-style
    (``<col>=<value>/`` dirs) and the merge rewrites ONLY partitions the
    batch touches — merge cost tracks batch locality instead of table
    size, the property that keeps a serving table maintainable once it
    outgrows a single rewrite. CONTRACT: ``partition_col`` must be
    functionally dependent on ``key_cols`` (immutable per key) — the
    anti-join only clears keys within the batch's touched partitions, so
    a key whose partition value changed between batches would leave its
    stale row alive in the old partition.

    Crash safety: in-flight output stages under ``.staging/`` (invisible
    to partition discovery), swaps are single renames, the ledger commits
    last, and ``_recover`` at entry heals the one non-atomic rename
    window — so a replay after a crash at ANY point re-applies an
    idempotent merge (same keys → same survivors).
    """
    if partition_col is not None and set(key_cols) <= {partition_col}:
        # zero non-partition key columns would make the survivors
        # anti-join degenerate (empty join-column list) — reject early
        raise ValueError(
            "key_cols must contain at least one column besides partition_col"
        )
    seen = committed_batches(serving_path)
    if batch_id in seen:
        return False
    if seen and batch_id <= max(seen) - LEDGER_KEEP:
        # Pruned horizon: entries this far behind the newest were removed
        # from the ledger, so absence is NOT evidence of non-commit. A
        # batch_id this old can only be a replay (e.g. a checkpoint
        # restored from backup) — re-applying it would clobber newer
        # values for its keys, violating last-writer-across-batches.
        return False
    _recover(serving_path)
    spark = batch_df.sparkSession
    batch_df = batch_df.dropDuplicates(list(key_cols))  # last-writer within batch

    if partition_col is None:
        if os.path.isdir(serving_path):
            current = spark.read.parquet(serving_path)
            keys = batch_df.select(*key_cols)
            survivors = current.join(keys, list(key_cols), "left_anti")
            merged = survivors.unionByName(batch_df)
        else:
            merged = batch_df
        tmp = serving_path.rstrip("/") + ".merging"
        merged.write.mode("overwrite").parquet(tmp)
        _swap_in(serving_path, tmp, serving_path.rstrip("/") + ".old")
    else:
        from pyspark.sql import functions as F

        stage = _staging_root(serving_path)
        touched = [
            r[0] for r in batch_df.select(partition_col).distinct().collect()
        ]
        if len(touched) > dynamic_threshold:
            # Wide batch: the per-partition loop below would serialize
            # one Spark job per touched partition on the driver. Instead
            # do ONE job via Spark's dynamic partition overwrite — only
            # partitions present in `merged` (exactly the touched set)
            # are replaced at job commit; untouched dirs are never read
            # or rewritten. Crash mid-commit can leave a partition
            # subset swapped, but the ledger commits last so the replay
            # re-applies the idempotent merge (same keys → same rows).
            _merge_dynamic(spark, serving_path, key_cols, batch_df,
                           partition_col, touched)
        else:
            for p in touched:  # each iteration is distributed work
                pname = f"{partition_col}={p}"
                pdir = os.path.join(serving_path, pname)
                sub = batch_df.filter(F.col(partition_col) == p).drop(partition_col)
                if os.path.isdir(pdir):
                    current = spark.read.parquet(pdir)
                    keys = sub.select(*[k for k in key_cols if k != partition_col])
                    survivors = current.join(keys, list(keys.columns), "left_anti")
                    merged = survivors.unionByName(sub)
                else:
                    merged = sub
                tmp = os.path.join(stage, pname + ".merging")
                merged.write.mode("overwrite").parquet(tmp)
                _swap_in(pdir, tmp, os.path.join(stage, pname + ".old"))

    lp = _ledger_path(serving_path)
    os.makedirs(lp, exist_ok=True)
    with open(os.path.join(lp, str(batch_id)), "w"):
        pass
    for f in os.listdir(lp):  # bound ledger size (see LEDGER_KEEP)
        if int(f) < batch_id - LEDGER_KEEP:
            os.remove(os.path.join(lp, f))
    return True


def _merge_dynamic(spark: SparkSession, serving_path: str,
                   key_cols: tuple[str, ...], batch_df: DataFrame,
                   partition_col: str, touched: list) -> None:
    """Single-job merge of every touched partition via
    ``partitionOverwriteMode=dynamic``. Reads only the touched
    partitions (the ``isin`` filter prunes at the scan), anti-joins the
    batch keys, and overwrites exactly the partitions the written data
    contains."""
    from pyspark.sql import functions as F

    has_data = os.path.isdir(serving_path) and any(
        name.startswith(f"{partition_col}=") for name in os.listdir(serving_path)
    )
    if has_data:
        current = spark.read.parquet(serving_path).filter(
            F.col(partition_col).isin(touched)
        )
        keys = batch_df.select(*key_cols)
        join_cols = list(dict.fromkeys(list(key_cols) + [partition_col]))
        if partition_col not in key_cols:
            keys = batch_df.select(*join_cols)
        survivors = current.join(keys, on=list(keys.columns), how="left_anti")
        merged = survivors.unionByName(batch_df.select(*survivors.columns))
    else:
        merged = batch_df
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key, "static")
    spark.conf.set(conf_key, "dynamic")
    try:
        (merged.write.mode("overwrite")
               .partitionBy(partition_col).parquet(serving_path))
    finally:
        spark.conf.set(conf_key, prev)


def upsert_sink(serving_path: str, key_cols: tuple[str, ...],
                partition_col: str | None = None,
                dynamic_threshold: int = 32):
    """foreachBatch callable: ``.writeStream.foreachBatch(
    upsert_sink(path, ("user_id",)))``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch(serving_path, key_cols, batch_df, batch_id,
                     partition_col=partition_col,
                     dynamic_threshold=dynamic_threshold)

    return sink


def read_serving_table(spark: SparkSession, serving_path: str) -> DataFrame:
    """Hive-style partition dirs (if any) are discovered automatically;
    the partition column comes back type-inferred from the dir names."""
    return spark.read.parquet(serving_path)
