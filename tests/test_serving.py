"""Idempotent streaming upsert sink: the serving table converges to
last-write-per-key across microbatches, and replayed batches are
no-ops (the exactly-once-effect contract foreachBatch needs)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conftest import SF_SMALL

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.streaming.serving import (
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
