"""KMV distinct sketch (operators/sketches.py): determinism, accuracy,
losslessness of the salted two-stage k-min, and the HLL comparison the
sketch replaced on the query surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL
from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.operators.sketches import hash01, kmv_distinct


def test_hash01_uniform_and_deterministic(spark):
    df = spark.range(0, 2000).select(hash01(F.col("id")).alias("h"))
    rows = [r.h for r in df.collect()]
    assert all(0.0 <= h < 1.0 for h in rows)
    assert len(set(rows)) == 2000  # no collisions on small domains
    # deterministic: same values on re-evaluation
    assert rows == [r.h for r in df.collect()]
    # roughly uniform: mean of U(0,1) within a loose band
    mean = sum(rows) / len(rows)
    assert 0.45 < mean < 0.55


def test_kmv_exact_below_k(spark):
    """Groups with < k distinct keys report the exact count."""
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", i % 3) for i in range(50)],
        "g string, key int",
    )
    out = {r.g: r.kmv_est for r in kmv_distinct(df, "key", ["g"], k=64).collect()}
    assert out == {"a": 7.0, "b": 3.0}


def test_kmv_estimate_accuracy(spark):
    """k=256 KMV is within ~3 standard errors (1/sqrt(k-2) ≈ 6.3%) of a
    10k-distinct truth — a deterministic fixture, so this never flakes."""
    df = spark.range(0, 10_000).select(F.lit("g").alias("g"), F.col("id").alias("key"))
    est = kmv_distinct(df, "key", ["g"], k=256).collect()[0].kmv_est
    assert abs(est - 10_000) / 10_000 < 3 / (254 ** 0.5)


def test_kmv_salting_is_lossless(spark):
    """Any n_salts gives the identical estimate: every global k-min hash
    is a k-min within its salt."""
    df = spark.range(0, 5_000).select(
        (F.col("id") % 2).cast("string").alias("g"), F.col("id").alias("key")
    )
    a = sorted((r.g, r.kmv_est) for r in kmv_distinct(df, "key", ["g"], k=64, n_salts=1).collect())
    b = sorted((r.g, r.kmv_est) for r in kmv_distinct(df, "key", ["g"], k=64, n_salts=32).collect())
    assert a == b


def test_kmv_tracks_exact_on_fixture(spark):
    """On the events fixture the estimate lands within the k=64 error
    band of the exact per-type distinct-user counts."""
    events = load_table(spark, SF_SMALL, "events")
    est = kmv_distinct(events, "user_id", ["event_type"], k=64)
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact")
    )
    for r in est.join(exact, "event_type").collect():
        assert abs(r.kmv_est - r.exact) / r.exact < 0.5, r


def test_hll_agrees_with_exact(spark):
    """approx_count_distinct (HLL++) stays on the operator surface even
    though the KMV sketch took the oracle-checked slot: rsd=0.02 should
    land within ~5x rsd of exact on the fixture."""
    events = load_table(spark, SF_SMALL, "events")
    rows = (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("hll"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.hll - r.exact) / r.exact < 0.10, r
