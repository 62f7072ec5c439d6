"""Unit tests for composed operators: as-of join edge cases, salted
aggregation equivalence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdata_processing_spark.operators.asof import asof_join
from bigdata_processing_spark.operators.skew import salted_agg


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _mk(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "t1"),
            (1, _ts("2024-01-01T12:00:00"), "t2"),
            (2, _ts("2024-01-01T09:00:00"), "t3"),  # before any right row
            (3, _ts("2024-01-01T10:00:00"), "t4"),  # key with no right rows
        ],
        "k int, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 10.0),
            (1, _ts("2024-01-01T11:00:00"), 20.0),
            (1, _ts("2024-01-01T12:00:00"), 30.0),  # exactly simultaneous with t2
            (2, _ts("2024-01-01T09:30:00"), 40.0),
        ],
        "k int, ts timestamp, v double",
    )
    return left, right


def test_asof_inclusive_match(spark):
    left, right = _mk(spark)
    out = {
        r.name: r.last_v
        for r in asof_join(left, right, on="k", ts="ts", right_payload={"v": "last_v"}).collect()
    }
    assert out["t1"] == 10.0   # most recent at-or-before 10:00
    assert out["t2"] == 30.0   # simultaneous row matches inclusively
    assert out["t3"] is None   # left row precedes all right rows
    assert out["t4"] is None   # key absent from right side


def test_asof_strict_excludes_simultaneous(spark):
    left, right = _mk(spark)
    out = {
        r.name: r.last_v
        for r in asof_join(
            left, right, on="k", ts="ts", right_payload={"v": "last_v"}, strict=True
        ).collect()
    }
    assert out["t2"] == 20.0   # strict: the 12:00 right row no longer matches


def test_asof_left_row_count_preserved(spark):
    left, right = _mk(spark)
    joined = asof_join(left, right, on="k", ts="ts", right_payload={"v": "last_v"})
    assert joined.count() == left.count()


def test_asof_forward(spark):
    left, right = _mk(spark)
    out = {
        r.name: r.next_v
        for r in asof_join(
            left, right, on="k", ts="ts", right_payload={"v": "next_v"},
            direction="forward",
        ).collect()
    }
    assert out["t1"] == 20.0   # earliest right at-or-after 10:00 is 11:00
    assert out["t2"] == 30.0   # simultaneous 12:00 row matches inclusively
    assert out["t3"] == 40.0   # 09:00 → next right at 09:30
    assert out["t4"] is None   # key absent from right side


def test_asof_forward_strict(spark):
    left, right = _mk(spark)
    out = {
        r.name: r.next_v
        for r in asof_join(
            left, right, on="k", ts="ts", right_payload={"v": "next_v"},
            direction="forward", strict=True,
        ).collect()
    }
    assert out["t2"] is None   # 12:00 is the last right row; strict skips it


def test_salted_agg_matches_plain(spark):
    df = spark.range(0, 10000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 2).cast("double").alias("v")
    )
    plain = {
        r.k: (r.s, r.c)
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("v").alias("c")).collect()
    }
    salted = {
        r.k: (r.s, r.c)
        for r in salted_agg(df, ["k"], {"s": ("sum", "v"), "c": ("count", "v")}, n_salts=8).collect()
    }
    assert plain == salted


def test_salted_agg_min_max(spark):
    df = spark.range(0, 1000).select((F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    out = {
        r.k: (r.lo, r.hi)
        for r in salted_agg(df, ["k"], {"lo": ("min", "v"), "hi": ("max", "v")}, n_salts=4).collect()
    }
    assert out[0] == (0, 999)
    assert out[1] == (1, 997)
    assert out[2] == (2, 998)
