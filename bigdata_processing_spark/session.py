"""SparkSession factory with scale-appropriate defaults.

The reference builds a bare ``SparkSession`` and pushes S3A credentials
through the Py4J bridge per job (reference:
``Codes/etherTransactionsAnalysis/etherTransactionsAnalysis.py:14-42``).
Here session construction is centralized and tuned:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  broadcast-join conversion) — the reference data is power-law skewed on
  addresses, so AQE skew handling is the scale story for its joins.
- Arrow enabled for the few pandas-UDF code paths.
- UTC session timezone so time bucketing matches the reference's
  ``time.gmtime`` semantics (etherTransactionsAnalysis.py:47) and the
  DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for the local[32] test harness; on a real cluster these become
# no-ops or are overridden by cluster conf (AQE re-sizes shuffles anyway).
_DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    "spark.sql.parquet.filterPushdown": "true",
    # Back-compat with the earlier fixture generation that wrote
    # TIMESTAMP(NANOS) (current fixtures are naive timestamp[us] → NTZ,
    # handled dtype-aware in catalog/functions.temporal). Harmless for
    # non-nanos files; keeps old data readable.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Runtime bloom-filter join pushdown (build side injects a bloom
    # filter into the probe scan) is ON by default in Spark 4.x
    # (spark.sql.optimizer.runtime.bloomFilter.enabled=true); we rely on
    # that default rather than re-setting it — combining it with the
    # legacy semiJoinReduction flag deadlocks sessionState init on 4.1.
    # Cost-based optimization: no-ops until a table has ANALYZE stats
    # (catalog.register_analyzed_tables); with stats, join reordering and
    # broadcast thresholds use real cardinalities instead of file sizes.
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # Bound plan-STRING rendering: chained incremental pipelines build
    # deep reused subtrees, and the default (~2 GB) cap let explain/UI
    # string generation itself OOM an 8 GB driver before any task ran
    # (hit twice in round 8; the real fixes are lineage truncations at
    # the reuse points — this bounds the blast radius of the next one).
    "spark.sql.maxPlanStringLength": str(8 * 1024 * 1024),
}


def get_spark(app_name: str = "bigdata-processing-spark",
              master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster master is configured; on a cluster, leave ``master``
    unset and let spark-submit provide it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
