"""Idempotent streaming upsert sink: the serving table converges to
last-write-per-key across microbatches, and replayed batches are
no-ops (the exactly-once-effect contract foreachBatch needs)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conftest import SF_SMALL

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.streaming.serving import (
    _ledger_path,
    committed_batches,
    read_serving_table,
    upsert_batch,
    upsert_sink,
)


def test_streaming_upsert_converges_to_batch_aggregate(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events").filter(F.col("user_id") < 30)
    src = tmp_path / "waves"
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(str(src / "w0"))
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(str(src / "w1"))

    serving = os.path.join(str(tmp_path), "serving")
    schema = ", ".join(f"{c} {t}" for c, t in events.dtypes)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    # complete-mode per-user aggregate upserted each batch: the serving
    # table always holds each user's latest lifetime aggregate
    agg = stream.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("total")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(upsert_sink(serving, ("user_id",)))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r.user_id: (r.n, round(r.total, 6))
        for r in read_serving_table(spark, serving).collect()
    }
    want = {
        r.user_id: (r.n, round(r.total, 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want
    assert len(committed_batches(serving)) >= 2


def test_replayed_batch_is_noop(spark, tmp_path):
    serving = os.path.join(str(tmp_path), "serving2")
    b0 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    b1 = spark.createDataFrame([(2, 99.0), (3, 30.0)], "k long, v double")

    assert upsert_batch(serving, ("k",), b0, 0) is True
    assert upsert_batch(serving, ("k",), b1, 1) is True
    # replay of batch 1 (post-failure rerun) must not double-apply
    assert upsert_batch(serving, ("k",), b1, 1) is False

    rows = {r.k: r.v for r in read_serving_table(spark, serving).collect()}
    assert rows == {1: 10.0, 2: 99.0, 3: 30.0}
    parent = os.path.dirname(serving)
    assert sorted(os.listdir(parent)) == ["serving2", "serving2._batches"]


def test_partition_scoped_merge_touches_only_batch_partitions(spark, tmp_path):
    import glob

    serving = os.path.join(str(tmp_path), "serving3")
    b0 = spark.createDataFrame(
        [(1, 0, 10.0), (2, 0, 20.0), (3, 1, 30.0)], "k long, shard int, v double"
    )
    assert upsert_batch(serving, ("k",), b0, 0, partition_col="shard") is True
    files_before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(serving, "shard=1", "*.parquet"))
    }
    assert files_before  # partition 1 exists

    # batch 1 only touches shard 0: shard 1's files must be untouched
    b1 = spark.createDataFrame([(2, 0, 99.0), (4, 0, 40.0)], "k long, shard int, v double")
    assert upsert_batch(serving, ("k",), b1, 1, partition_col="shard") is True
    files_after = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(serving, "shard=1", "*.parquet"))
    }
    assert files_after == files_before

    rows = {r.k: (r.shard, r.v) for r in read_serving_table(spark, serving).collect()}
    assert rows == {1: (0, 10.0), 2: (0, 99.0), 3: (1, 30.0), 4: (0, 40.0)}

    # replay of batch 1 is still a no-op in partitioned mode
    assert upsert_batch(serving, ("k",), b1, 1, partition_col="shard") is False


def test_reader_never_sees_staging_dirs(spark, tmp_path):
    """An in-flight (or crashed) merge's scratch dirs live under
    dot-prefixed .staging, which partition discovery skips — a
    concurrent reader must never observe phantom partitions or
    half-written rows."""
    serving = os.path.join(str(tmp_path), "serving4")
    b0 = spark.createDataFrame(
        [(1, 0, 10.0), (2, 1, 20.0)], "k long, shard int, v double"
    )
    assert upsert_batch(serving, ("k",), b0, 0, partition_col="shard") is True

    # simulate a concurrent merge mid-write: half-written data staged
    junk = spark.createDataFrame([(9, 99.0)], "k long, v double")
    junk.write.parquet(os.path.join(serving, ".staging", "shard=9.merging"))
    junk.write.parquet(os.path.join(serving, ".staging", "shard=7.old"))

    rows = {r.k: (r.shard, r.v) for r in read_serving_table(spark, serving).collect()}
    assert rows == {1: (0, 10.0), 2: (1, 20.0)}


def test_crash_after_swap_before_ledger_is_replay_safe(spark, tmp_path):
    """Kill point: partition swapped in, ledger NOT yet committed. The
    replayed batch must re-apply cleanly (same keys -> same survivors),
    not duplicate rows."""
    serving = os.path.join(str(tmp_path), "serving5")
    b0 = spark.createDataFrame(
        [(1, 0, 10.0), (2, 0, 20.0), (3, 1, 30.0)], "k long, shard int, v double"
    )
    assert upsert_batch(serving, ("k",), b0, 0, partition_col="shard") is True
    b1 = spark.createDataFrame([(2, 0, 99.0)], "k long, shard int, v double")
    assert upsert_batch(serving, ("k",), b1, 1, partition_col="shard") is True

    # crash simulation: the swap happened but the ledger write was lost
    os.remove(os.path.join(_ledger_path(serving), "1"))
    assert upsert_batch(serving, ("k",), b1, 1, partition_col="shard") is True  # replay re-applies

    rows = {r.k: (r.shard, r.v) for r in read_serving_table(spark, serving).collect()}
    assert rows == {1: (0, 10.0), 2: (0, 99.0), 3: (1, 30.0)}


def test_crash_mid_swap_recovers_parked_partition(spark, tmp_path):
    """Kill point: the worst window — old partition renamed into
    .staging, replacement not yet renamed in (target missing). Without
    recovery a replayed merge would see an empty partition and drop
    every survivor row."""
    serving = os.path.join(str(tmp_path), "serving6")
    b0 = spark.createDataFrame(
        [(1, 0, 10.0), (2, 0, 20.0)], "k long, shard int, v double"
    )
    assert upsert_batch(serving, ("k",), b0, 0, partition_col="shard") is True

    # crash simulation: shard=0 parked at .staging/shard=0.old, target gone,
    # plus an abandoned .merging from the interrupted write
    stage = os.path.join(serving, ".staging")
    os.makedirs(stage, exist_ok=True)
    os.rename(os.path.join(serving, "shard=0"), os.path.join(stage, "shard=0.old"))
    spark.createDataFrame([(2, 99.0)], "k long, v double").write.parquet(
        os.path.join(stage, "shard=0.merging")
    )

    b1 = spark.createDataFrame([(2, 0, 99.0)], "k long, shard int, v double")
    assert upsert_batch(serving, ("k",), b1, 1, partition_col="shard") is True

    rows = {r.k: (r.shard, r.v) for r in read_serving_table(spark, serving).collect()}
    assert rows == {1: (0, 10.0), 2: (0, 99.0)}  # survivor k=1 recovered


def test_crash_mid_swap_whole_table_recovers(spark, tmp_path):
    """Same window in non-partitioned mode: table parked at <path>.old,
    target missing. Recovery restores it before the replayed merge."""
    serving = os.path.join(str(tmp_path), "serving7")
    b0 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    assert upsert_batch(serving, ("k",), b0, 0) is True

    os.rename(serving, serving + ".old")
    b1 = spark.createDataFrame([(2, 99.0)], "k long, v double")
    assert upsert_batch(serving, ("k",), b1, 1) is True

    rows = {r.k: r.v for r in read_serving_table(spark, serving).collect()}
    assert rows == {1: 10.0, 2: 99.0}


def test_ledger_prunes_old_entries(spark, tmp_path, monkeypatch):
    """The batch ledger must not grow one file per micro-batch forever:
    entries more than LEDGER_KEEP behind the newest are pruned at commit
    (Structured Streaming only replays the batch in flight at failure,
    so recent history suffices for replay detection)."""
    from bigdata_processing_spark.streaming import serving

    monkeypatch.setattr(serving, "LEDGER_KEEP", 3)
    path = os.path.join(str(tmp_path), "serving8")
    for bid in range(6):
        b = spark.createDataFrame([(bid, float(bid))], "k long, v double")
        assert serving.upsert_batch(path, ("k",), b, bid) is True

    remaining = committed_batches(path)
    assert remaining == {2, 3, 4, 5}  # 0,1 pruned (< 5 - 3)
    # recent replay still detected
    b5 = spark.createDataFrame([(5, 99.0)], "k long, v double")
    assert serving.upsert_batch(path, ("k",), b5, 5) is False


def test_dynamic_overwrite_path_wide_batch(spark, tmp_path):
    """A batch touching more partitions than dynamic_threshold merges via
    ONE dynamic-partition-overwrite job: same result as the per-partition
    loop, untouched partitions' files byte-stable."""
    import glob

    serving = os.path.join(str(tmp_path), "serving_dyn")
    # seed 6 partitions with the loop path
    b0 = spark.createDataFrame(
        [(k, k % 6, float(k)) for k in range(12)], "k long, shard int, v double"
    )
    assert upsert_batch(serving, ("k",), b0, 0, partition_col="shard") is True
    untouched = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(serving, "shard=5", "*.parquet"))
    }
    assert untouched

    # wide batch: touches shards 0-4 (5 partitions) with threshold 3
    b1 = spark.createDataFrame(
        [(k, k % 6, 100.0 + k) for k in range(12) if k % 6 != 5]
        + [(90, 0, 900.0)],
        "k long, shard int, v double",
    )
    assert upsert_batch(serving, ("k",), b1, 1, partition_col="shard",
                        dynamic_threshold=3) is True
    # untouched partition not rewritten by the dynamic job
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(serving, "shard=5", "*.parquet"))
    }
    assert after == untouched

    rows = {r.k: (r.shard, r.v) for r in read_serving_table(spark, serving).collect()}
    expect = {k: (k % 6, float(k)) for k in range(12) if k % 6 == 5}
    expect.update({k: (k % 6, 100.0 + k) for k in range(12) if k % 6 != 5})
    expect[90] = (0, 900.0)
    assert rows == expect

    # replay of the wide batch is a no-op
    assert upsert_batch(serving, ("k",), b1, 1, partition_col="shard",
                        dynamic_threshold=3) is False


def test_dynamic_overwrite_crash_before_ledger_replay_safe(spark, tmp_path):
    """Kill point on the dynamic path: merge committed, ledger write
    lost. The replayed wide batch re-applies idempotently."""
    serving = os.path.join(str(tmp_path), "serving_dyn2")
    b0 = spark.createDataFrame(
        [(k, k % 4, float(k)) for k in range(8)], "k long, shard int, v double"
    )
    assert upsert_batch(serving, ("k",), b0, 0, partition_col="shard") is True
    b1 = spark.createDataFrame(
        [(k, k % 4, 50.0 + k) for k in range(8)], "k long, shard int, v double"
    )
    assert upsert_batch(serving, ("k",), b1, 1, partition_col="shard",
                        dynamic_threshold=2) is True
    os.remove(os.path.join(_ledger_path(serving), "1"))
    assert upsert_batch(serving, ("k",), b1, 1, partition_col="shard",
                        dynamic_threshold=2) is True  # replay re-applies
    rows = {r.k: r.v for r in read_serving_table(spark, serving).collect()}
    assert rows == {k: 50.0 + k for k in range(8)}


def test_pruned_horizon_batch_treated_as_committed(spark, tmp_path, monkeypatch):
    """A batch_id at or below max(ledger) - LEDGER_KEEP predates the
    pruned ledger horizon: absence there is not evidence of non-commit,
    so the sink must refuse to (re-)apply it — a backup-restored
    checkpoint replaying ancient batches must not clobber newer values."""
    from bigdata_processing_spark.streaming import serving

    monkeypatch.setattr(serving, "LEDGER_KEEP", 3)
    path = os.path.join(str(tmp_path), "serving_hwm")
    for bid in range(6):
        b = spark.createDataFrame([(1, float(bid))], "k long, v double")
        assert serving.upsert_batch(path, ("k",), b, bid) is True
    # batch 0 and 1 were pruned from the ledger (< 5 - 3)
    assert committed_batches(path) == {2, 3, 4, 5}
    stale = spark.createDataFrame([(1, -1.0)], "k long, v double")
    assert serving.upsert_batch(path, ("k",), stale, 1) is False
    assert serving.upsert_batch(path, ("k",), stale, 2) is False  # == hwm - KEEP
    rows = {r.k: r.v for r in read_serving_table(spark, path).collect()}
    assert rows == {1: 5.0}  # newest value survived


def test_degenerate_key_cols_rejected(spark, tmp_path):
    """key_cols ⊆ {partition_col} would make the survivors anti-join
    have an empty column list — rejected up front."""
    import pytest

    b = spark.createDataFrame([(0, 1.0)], "shard int, v double")
    with pytest.raises(ValueError, match="besides partition_col"):
        upsert_batch(os.path.join(str(tmp_path), "s"), ("shard",), b, 0,
                     partition_col="shard")
