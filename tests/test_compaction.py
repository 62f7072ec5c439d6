"""Compaction: a fragmented table collapses to size-targeted files with
content exactly preserved; sorted mode also yields clustered layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdata_processing_spark.operators.compaction import (
    compact_parquet,
    table_file_stats,
)


def _fragment(spark, path, n_files=40):
    """Simulate a streaming sink: many tiny files."""
    df = spark.range(20_000).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("v")
    )
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return df


def test_compaction_reduces_files_preserves_content(spark, tmp_path):
    path = os.path.join(str(tmp_path), "frag")
    df = _fragment(spark, path)
    before_sum = df.agg(F.sum("v"), F.count("*")).collect()[0]

    n_before, n_after = compact_parquet(spark, path, target_file_bytes=10**7)
    assert n_before == 40
    assert n_after < n_before
    assert n_after <= 2  # 20k tiny rows ≪ 10MB target

    back = spark.read.parquet(path)
    after_sum = back.agg(F.sum("v"), F.count("*")).collect()[0]
    assert tuple(before_sum) == tuple(after_sum)
    # the swap left no scratch dirs behind
    parent = os.path.dirname(path)
    assert sorted(os.listdir(parent)) == ["frag"]


def test_compaction_with_sort_clusters_layout(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    path = os.path.join(str(tmp_path), "frag2")
    _fragment(spark, path)
    compact_parquet(spark, path, target_file_bytes=60_000, sort_col="id")
    n_after, _ = table_file_stats(path)
    assert n_after >= 2  # small target → several files, each a key range

    ranges = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["id"]
        st = md.row_group(0).column(idx).statistics
        lo = st.min
        st_last = md.row_group(md.num_row_groups - 1).column(idx).statistics
        ranges.append((lo, st_last.max))
    ranges.sort()
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 <= l2, ranges


def test_compaction_crash_mid_swap_recovers(spark, tmp_path):
    """Kill point: table renamed to <path>.old, replacement not yet
    renamed in. The next compact_parquet must restore the parked table
    instead of compacting nothing (or failing on a missing path)."""
    import shutil

    path = str(tmp_path / "t_crash")
    df = _fragment(spark, path, n_files=10)
    want = sorted((r.id, r.v) for r in df.collect())

    # crash simulation: mid-swap state + an abandoned .compacting dir
    os.rename(path, path + ".old")
    shutil.copytree(path + ".old", path + ".compacting")

    n_before, n_after = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert n_before == 10  # the recovered table, not an empty dir
    assert n_after == 1
    got = sorted((r.id, r.v) for r in spark.read.parquet(path).collect())
    assert got == want
    assert not os.path.isdir(path + ".old")
    assert not os.path.isdir(path + ".compacting")
