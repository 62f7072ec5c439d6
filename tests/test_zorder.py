"""Z-order layout: prove the 2-D locality property with footer stats,
not vibes — a box predicate on BOTH dimensions must touch far fewer
files in the Morton layout than in a single-column-sorted layout, and
roundtrip data must be intact."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdata_processing_spark.operators.zorder import (
    bucketize,
    file_ranges,
    files_overlapping_box,
    write_zordered_parquet,
    zorder_key,
)

# enough files that a box spans several tiles in BOTH layouts — with
# very coarse tiles (e.g. 16 files on a 64x64 grid) a worst-case box
# centered on the curve's quadrant crossing ties the 1-D layout
N_FILES = 64


def _grid(spark, n=64):
    """n×n grid of points — uniform 2-D data, the layout stress case."""
    return (
        spark.range(n * n)
        .select(
            F.col("id").alias("row_id"),
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )
    )


def test_zorder_key_interleaves_bits():
    # driver-side model of the column expr, via a tiny Spark eval
    def morton(x, y, bits=8):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    assert morton(0, 0) == 0
    assert morton(1, 0) == 1
    assert morton(0, 1) == 2
    assert morton(255, 255) == 65535
    # curve locality: consecutive keys within a 2x2 tile
    assert sorted(morton(x, y) for x in (0, 1) for y in (0, 1)) == [0, 1, 2, 3]


def test_zorder_column_matches_python_model(spark):
    rows = (
        _grid(spark, 32)
        .select("x", "y", zorder_key(F.col("x"), F.col("y"), 8).alias("zk"))
        .collect()
    )

    def morton(x, y, bits=8):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    for r in rows:
        assert r.zk == morton(r.x, r.y)


def test_zorder_layout_prunes_2d_boxes(spark, tmp_path):
    """The measurable claim: for a centered box covering ~1/16 of the
    domain, the z-ordered layout's overlapping-file count is a small
    fraction of the x-sorted layout's (where every file spans all of y,
    so any y-selective box still hits every x-matching file)."""
    grid = _grid(spark, 64)

    zpath = os.path.join(str(tmp_path), "z")
    xpath = os.path.join(str(tmp_path), "x")
    write_zordered_parquet(
        grid, zpath, F.col("x"), F.col("y"), bits=6, n_files=N_FILES
    )
    # baseline: classic single-column clustered layout
    (
        grid.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    # roundtrip intact
    assert spark.read.parquet(zpath).count() == 64 * 64
    box = ((24, 39), (24, 39))  # 16x16 box = 1/16 of the domain
    zr = file_ranges(zpath, ("x", "y"))
    xr = file_ranges(xpath, ("x", "y"))
    z_hit = files_overlapping_box(zr, ("x", "y"), box)
    x_hit = files_overlapping_box(xr, ("x", "y"), box)
    assert len(zr) >= N_FILES // 2 and len(xr) >= N_FILES // 2
    # x-sorted: y spans the full domain in every file, so every file
    # whose x-range meets the box is read — expect ~1/4 of files.
    # z-ordered: only the files owning curve segments through the box's
    # tiles are read. The z layout must strictly beat the 1-D layout.
    assert z_hit < x_hit, (z_hit, x_hit)
    assert z_hit <= max(2, len(zr) // 3)


def test_bucketize_clamps_and_scales(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (49.9,), (99.9,), (250.0,)], "v double"
    )
    got = [r.b for r in df.select(bucketize(F.col("v"), 0.0, 100.0, 4).alias("b")).collect()]
    assert got[0] == 0          # below range clamps low
    assert got[1] == 0
    assert got[2] == 7          # mid-range
    assert got[3] == 15
    assert got[4] == 15         # above range clamps high
