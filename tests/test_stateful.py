"""transformWithState running aggregates: state persists across
microbatches, and each user's LAST emitted update equals the batch
groupBy over all their events."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

# transformWithState's python<->JVM state protocol is protobuf-based;
# without google.protobuf the driver worker cannot start. Same
# environment-gate pattern as spark-avro (ROADMAP.md).
try:
    import google.protobuf  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

pytestmark = pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState requires google.protobuf (re-checked absent "
           "2026-08-14/r04: `import google.protobuf` -> ModuleNotFoundError; "
           "applyInPandasWithState in streaming/dedup.py is the runnable "
           "custom-stateful path here)",
)

from conftest import SF_SMALL

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.streaming.stateful import (
    rocksdb_conf,
    running_user_stats,
)


def test_running_stats_match_batch_after_all_batches(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events").filter(F.col("user_id") < 40)

    src = tmp_path / "waves"
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(str(src / "w0"))
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(str(src / "w1"))

    schema = ", ".join(f"{c} {t}" for c, t in events.dtypes)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    rocksdb_conf(spark)
    try:
        q = (
            running_user_stats(stream)
            .writeStream.format("memory")
            .queryName("running_stats")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    # memory sink in update mode appends each batch's updates: the last
    # row per user is the lifetime aggregate
    updates = spark.table("running_stats").collect()
    last = {}
    for r in updates:  # appended in batch order
        last[r.user_id] = (r.n_events, round(r.total_value, 6), round(r.max_value, 6))

    expected = {
        r.user_id: (r.n, round(r.s, 6), round(r.m, 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"), F.max("value").alias("m"))
        .collect()
    }
    assert last == expected
    # state really carried across batches: some users must appear twice
    from collections import Counter

    seen = Counter(r.user_id for r in updates)
    assert max(seen.values()) >= 2
