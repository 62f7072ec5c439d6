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


def _swap_in(target: str, tmp: str) -> None:
    old = target.rstrip("/") + ".old"
    if os.path.isdir(target):
        shutil.rmtree(old, ignore_errors=True)
        os.rename(target, old)
        os.rename(tmp, target)
        shutil.rmtree(old)
    else:
        os.makedirs(os.path.dirname(target), exist_ok=True)
        os.rename(tmp, target)


def upsert_batch(serving_path: str, key_cols: tuple[str, ...],
                 batch_df: DataFrame, batch_id: int,
                 partition_col: str | None = None) -> bool:
    """Merge one micro-batch into the serving table; returns False if the
    batch was already committed (replay detected).

    With ``partition_col``, the table is laid out hive-style
    (``<col>=<value>/`` dirs) and the merge rewrites ONLY partitions the
    batch touches — merge cost tracks batch locality instead of table
    size, the property that keeps a serving table maintainable once it
    outgrows a single rewrite. A crash between partition swaps is safe:
    the ledger commits last, so the replay re-applies an idempotent
    merge (same keys → same survivors) over every touched partition.
    """
    if batch_id in committed_batches(serving_path):
        return False
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
        shutil.rmtree(tmp, ignore_errors=True)
        merged.write.mode("overwrite").parquet(tmp)
        _swap_in(serving_path, tmp)
    else:
        from pyspark.sql import functions as F

        touched = [
            r[0] for r in batch_df.select(partition_col).distinct().collect()
        ]
        for p in touched:  # few per batch; each iteration is distributed work
            pdir = os.path.join(serving_path, f"{partition_col}={p}")
            sub = batch_df.filter(F.col(partition_col) == p).drop(partition_col)
            if os.path.isdir(pdir):
                current = spark.read.parquet(pdir)
                keys = sub.select(*[k for k in key_cols if k != partition_col])
                survivors = current.join(keys, list(keys.columns), "left_anti")
                merged = survivors.unionByName(sub)
            else:
                merged = sub
            tmp = pdir.rstrip("/") + ".merging"
            shutil.rmtree(tmp, ignore_errors=True)
            merged.write.mode("overwrite").parquet(tmp)
            _swap_in(pdir, tmp)

    lp = _ledger_path(serving_path)
    os.makedirs(lp, exist_ok=True)
    with open(os.path.join(lp, str(batch_id)), "w"):
        pass
    return True


def upsert_sink(serving_path: str, key_cols: tuple[str, ...],
                partition_col: str | None = None):
    """foreachBatch callable: ``.writeStream.foreachBatch(
    upsert_sink(path, ("user_id",)))``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch(serving_path, key_cols, batch_df, batch_id,
                     partition_col=partition_col)

    return sink


def read_serving_table(spark: SparkSession, serving_path: str) -> DataFrame:
    """Hive-style partition dirs (if any) are discovered automatically;
    the partition column comes back type-inferred from the dir names."""
    return spark.read.parquet(serving_path)
