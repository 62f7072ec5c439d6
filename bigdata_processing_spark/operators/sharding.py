"""Deterministic training-shard emitter.

The last step of a training-data pipeline: globally shuffle the curated
corpus with a seeded hash order and write it as N equal-ish shards that
data loaders stream independently. At 100 TB this is the op that decides
whether 1000 loader workers see IID data or source-clustered runs.

Spark-first design:
- the "global shuffle" is NOT a total sort — a seeded portable hash
  (functions.text.hash64: md5-derived, identical in DuckDB) gives every
  doc a pseudo-random rank; sharding on ``hash % n_shards`` plus
  ``sortWithinPartitions`` on the hash realizes the shuffled order with
  ONE hash exchange and a per-partition sort (no rangepartitioning /
  global-sort barrier, no skew: md5 is uniform by construction).
- the write is ``partitionBy(shard)``; each shard directory is
  byte-deterministic for a given (corpus, seed, n_shards), so re-runs
  and replays are idempotent (verified in tests/test_sharding.py).
- shard-level stats land in a ``_ledger`` sidecar built via
  ``literal_df`` (VALUES-backed, JVM-side — a Python-RDD-backed frame
  would pay a worker round-trip per write, sources/writers.py:16).

Reference analog: the reference ends at saveAsTextFile dumps of
aggregates (Codes/etherTransactionsAnalysis/etherTransactionsAnalysis.py,
SURVEY.md §2.1 S5-S7); sharded corpus emission is north-star §2.12
surface with no reference citation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_processing_spark.functions.text import hash64

DEFAULT_N_SHARDS = 8


def shard_key(id_col, seed: int = 0):
    """Portable pseudo-random shuffle key for an id column: the
    md5-derived 32-bit hash of ``'{seed}|' || id``. Uniform, seedable,
    and bit-identical in DuckDB (functions.text.hash64 twin)."""
    return hash64(F.col(id_col).cast("string") if isinstance(id_col, str) else id_col.cast("string"), seed=seed)


def assign_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = DEFAULT_N_SHARDS,
    seed: int = 0,
) -> DataFrame:
    """Add ``shard`` (pmod of the shuffle key) and ``shuffle_key``
    columns. Pure column expressions — the assignment itself is free;
    the one shuffle happens at write/repartition time."""
    key = shard_key(id_col, seed=seed)
    return df.withColumn("shuffle_key", key).withColumn(
        "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("int")
    )


def shard_proxies(spark: SparkSession, n_shards: int) -> dict[int, int]:
    """shard value → smallest int ``p`` with ``pmod(murmur3(p), n) ==
    shard``. ``repartition(n, proxy)`` places rows at partition
    ``pmod(murmur3(proxy), n)``, so attaching these proxies realizes an
    IDENTITY shard→task mapping: exactly one shard per task, no empty
    tasks. (Repartitioning on the shard value itself hashes it AGAIN —
    ``pmod(murmur3(shard), n)`` — colliding multiple shards into one
    task while ~1/e of tasks stay empty; range partitioning would fix
    placement but samples boundaries with an extra input scan.) One tiny
    deterministic Spark job over 64·n candidate ints — metadata-sized."""
    limit = 64 * n_shards
    while True:
        rows = (
            spark.range(0, limit)
            .select(F.col("id").cast("int").alias("p"))
            .withColumn("s", F.pmod(F.hash("p"), F.lit(n_shards)))
            .groupBy("s").agg(F.min("p").alias("p"))
            .collect()
        )  # n_shards rows
        if len(rows) == n_shards:
            return {int(r.s): int(r.p) for r in rows}
        limit *= 2  # vanishing probability at 64x oversampling


def emit_training_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    n_shards: int = DEFAULT_N_SHARDS,
    seed: int = 0,
    max_records_per_file: int | None = None,
) -> DataFrame:
    """Write ``df`` as ``out_dir/shard=K/`` parquet, rows ordered by the
    seeded shuffle key within each shard, plus a ``_ledger`` sidecar of
    per-shard doc counts. Returns the ledger frame (n_shards rows).

    One hash exchange (repartition on the shard's murmur3 PROXY — see
    :func:`shard_proxies` — so each shard is exactly one task), no
    global sort. The (shuffle_key, id) sort key makes file contents
    deterministic even under shuffle-key hash collisions, so replaying
    the write is idempotent.

    Scale note: each shard is ONE task (that is what makes its file
    contents a deterministic sorted run AND what makes n_shards the
    parallelism and memory knob) — at 100 TB you emit ~10k shards of
    ~10 GB (loaders want many shards anyway), not 8 big ones; the
    per-task sort spills gracefully past executor memory. Don't be
    tempted to range-partition within a shard: RangePartitioner
    boundaries are sampled per-run, which silently breaks the
    byte-stable-replay contract.

    ``max_records_per_file``: loaders want ~256MB files, not one
    monolith per shard — when set, the writer rolls files at this row
    count; the roll points are sort-order-deterministic so shard
    contents stay byte-stable across replays."""
    assigned = assign_shards(df, id_col=id_col, n_shards=n_shards, seed=seed)
    spark0 = df.sparkSession
    proxies = shard_proxies(spark0, n_shards)
    from bigdata_processing_spark.sources.writers import literal_df as _ldf

    pmap = _ldf(
        spark0, sorted((s, p) for s, p in proxies.items()),
        "shard int, _shard_proxy int",
    )
    writer = (
        assigned.join(F.broadcast(pmap), "shard")
        .repartition(n_shards, "_shard_proxy")
        .drop("_shard_proxy")
        .sortWithinPartitions("shard", "shuffle_key", id_col)
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy("shard").parquet(os.path.join(out_dir, "data"))
    spark = df.sparkSession
    counts = (
        spark.read.parquet(os.path.join(out_dir, "data"))
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"))
        .collect()
    )  # n_shards rows — metadata-sized by construction
    from bigdata_processing_spark.sources.writers import literal_df

    ledger = literal_df(
        spark,
        sorted([(int(r["shard"]), int(r["n_docs"]), seed, n_shards) for r in counts]),
        "shard int, n_docs bigint, seed int, n_shards int",
    )
    ledger.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "_ledger")
    )
    return spark.read.parquet(os.path.join(out_dir, "_ledger"))


def read_shard(spark: SparkSession, out_dir: str, shard: int) -> DataFrame:
    """Read ONE shard. The shard predicate is a partition filter — a
    loader reading shard K touches 1/n_shards of the bytes
    (plan-asserted in tests/test_sharding.py)."""
    return spark.read.parquet(os.path.join(out_dir, "data")).filter(
        F.col("shard") == shard
    )
