"""Small-file compaction — the table-maintenance job every long-running
ingest needs (streaming sinks and frequent small batches fragment a
table into thousands of KB-scale files; at 100TB the NameNode/listing
and per-file open costs dominate scans long before data volume does).

Strategy: size the output file count from the table's actual bytes
(``target_file_bytes``), rewrite with a single ``coalesce`` (narrow — no
shuffle — when reducing file count) or ``repartition`` when a sort key
is requested (then it's write_sorted_parquet's layout), and swap
directories atomically only after the rewrite commits. The swap keeps
readers on the old files until the new ones are fully written — the
poor man's snapshot isolation a real table format (Iceberg/Delta) would
provide transactionally (see ROADMAP).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def table_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def recover_swap(path: str, scratch_suffix: str) -> None:
    """Heal a directory-swap interrupted mid-rename (shared by compaction
    and the serving sink's whole-table path). The only non-atomic window
    is between ``rename(path→old)`` and ``rename(tmp→path)``; a crash
    there leaves the data parked at ``<path>.old`` — restore it. The
    scratch output (``<path><scratch_suffix>``) is discardable: it was
    never yet live."""
    old = path.rstrip("/") + ".old"
    if os.path.isdir(old):
        if os.path.isdir(path):
            shutil.rmtree(old)
        else:
            os.rename(old, path)
    shutil.rmtree(path.rstrip("/") + scratch_suffix, ignore_errors=True)


def recover_compaction(path: str) -> None:
    recover_swap(path, ".compacting")


def compact_parquet(spark: SparkSession, path: str,
                    target_file_bytes: int = 128 * 1024 * 1024,
                    sort_col: str | None = None) -> tuple[int, int]:
    """Rewrite ``path`` with ~target-sized files; returns (files_before,
    files_after). Row count and content are preserved (asserted in
    tests/test_compaction.py); with ``sort_col`` the rewrite also
    clusters rows (range partition + in-file sort) so compaction doubles
    as layout optimization."""
    recover_compaction(path)
    n_before, total_bytes = table_file_stats(path)
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))

    tmp = path.rstrip("/") + ".compacting"
    old = path.rstrip("/") + ".old"
    shutil.rmtree(tmp, ignore_errors=True)

    df = spark.read.parquet(path)
    if sort_col:
        (df.repartitionByRange(n_files, sort_col)
           .sortWithinPartitions(sort_col)
           .write.mode("overwrite").parquet(tmp))
    else:
        df.coalesce(n_files).write.mode("overwrite").parquet(tmp)

    # atomic-ish swap: readers keep the old directory until rename
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)

    n_after, _ = table_file_stats(path)
    return n_before, n_after
