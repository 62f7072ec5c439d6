"""Shared per-batch store discipline for the incremental indexes.

Four growing on-disk stores ride the same contract — the MinHash index
(operators/incremental_dedup.py), the curation fingerprint store
(pipelines/curation.py), the image dHash index
(streaming/image_dedup.py), and the hashed-TF postings index
(streaming/hashed_tf.py). Each had re-implemented the contract with
slightly different code, and the round-7 coverage-gate subtlety existed
precisely because stores drift (VERDICT r7 #6) — so the contract lives
HERE, once:

- **Partition-scoped overwrite**: every growing table is partitioned by
  ingest batch (``{path}/{table}/batch_id=N/``) and a batch's write
  overwrites ITS OWN directory only. Replays (foreachBatch redelivery,
  crash retry) converge instead of double-appending — idempotence IS
  the exactly-once mechanism; no ledger, no read-modify-write.
- **Marker written LAST**: a batch's completion marker
  (``counts/batch_id=N`` by default) is the final write, so its
  presence means every other partition of the batch is complete. A
  crash between writes leaves stale partials that the replay simply
  overwrites.
- **Meta is STATE, not configuration**: bucket moduli and fit sizes are
  persisted at build/refit time and read back by every append/probe — a
  caller supplying its own modulus would silently mis-prune.
- **√n bucket policy**: hash-partitioned sub-stores size their bucket
  count as ``coeff·√n`` clamped to [min, max], balancing per-bucket scan
  bytes (~√n rows each) against directory-count pressure per batch
  write. Persisted via meta (the modulus is state).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from bigdata_processing_spark.sources.writers import literal_df


def write_batch_marker(
    spark: SparkSession,
    path: str,
    batch_id: int,
    n: int = 1,
    table: str = "counts",
) -> None:
    """Write the batch's completion marker — the LAST write of an
    append, so its presence vouches for every other partition of the
    batch. ``n`` doubles as the batch row count for ``counts`` markers
    (store size = sum over partitions; no read-modify-write metadata)."""
    literal_df(spark, [(int(n),)], "n bigint").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/{table}/batch_id={batch_id}")


def committed_batches(
    spark: SparkSession, path: str, table: str = "counts"
) -> set[int]:
    """Batch ids whose completion marker is live."""
    return {
        r.batch_id
        for r in spark.read.parquet(f"{path}/{table}")
        .select("batch_id").distinct().collect()
    }


def store_row_count(spark: SparkSession, path: str) -> int:
    """Total rows across committed batches — the sum of the per-batch
    counts markers (metadata-sized scan, never touches the data)."""
    from pyspark.sql import functions as F

    v = spark.read.parquet(f"{path}/counts").agg(F.sum("n")).collect()[0][0]
    return int(v or 0)


def bucket_count_policy(
    n: int,
    coeff: float = 1.0,
    min_buckets: int = 32,
    max_buckets: int = 4096,
) -> int:
    """``coeff · √n`` clamped — the shared sizing rule for
    hash-partitioned sub-stores (shingle store, fingerprint store) and
    the store sibling of operators/ivf.ivf_cell_count. √n keeps the two
    costs balanced as the corpus grows: per-bucket bytes (scan cost of
    one touched directory, ~n/√n = √n rows) and directory count
    (file-system pressure per batch write). The floor keeps tiny corpora
    from degenerate single-file buckets; the ceiling bounds tiny-file
    explosion for micro-batch writers — at 10B+ rows raise it together
    with the ingest batch size. The chosen count must be PERSISTED in
    the store's meta and read back by every append/probe (the modulus is
    state, not configuration — a mismatch silently mis-prunes)."""
    if n <= 0:
        return min_buckets
    return max(min_buckets, min(int(coeff * math.sqrt(n)), max_buckets))


def write_meta(
    spark: SparkSession, path: str, row: tuple, schema: str,
    table: str = "meta",
) -> None:
    """Persist the store's single-row state table (fit sizes, bucket
    moduli). Overwrite-in-place: meta transitions only at build/refit,
    which rewrite the whole store anyway."""
    literal_df(spark, [row], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/{table}")


def read_meta(spark: SparkSession, path: str, table: str = "meta"):
    """The store's single meta row (pyspark Row; column presence tells
    layout generations apart — readers fall back on legacy constants
    when a newer column is absent)."""
    return spark.read.parquet(f"{path}/{table}").collect()[0]
