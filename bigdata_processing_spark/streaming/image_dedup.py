"""Incremental + streaming image near-dup: probe NEW images against a
persisted dHash index without rescanning indexed pixels (ROADMAP
round-8 #2, landed round 7).

The image sibling of operators/incremental_dedup.py, riding the same
idempotence discipline (every write OVERWRITES its own ``batch_id=N``
partition; counts marker written LAST) and the same probe shape
(bucket-keyed candidates against stored postings, combined-size bucket
cap with representative stars, candidate-bounded verification). The
units are 10⁴× smaller, though: a dHash is 4×16-bit bands (~40 B/image
vs KBs of shingles), so the whole verification side is a narrow-table
join — pixel bytes never enter the index at all.

On-disk layout at ``{path}``:

- ``bands/batch_id=N/``   (bk, img_id): band-bucket postings, bk =
  ``{band}_{value}`` — identical keys to the batch operator
  (operators/multimodal.image_neardup_pairs_from_hashes),
- ``bucket_sizes/batch_id=N/`` (bk, n): per-batch bucket counts — the
  probe's cap sums these instead of rescanning postings,
- ``hashes/batch_id=N/``  (img_id, b0..b3): the verification table,
- ``counts/batch_id=N/``  (n): completion marker, written last.

Recall contract: 4 bands × 16 bits ⇒ any pair within Hamming
``IMAGE_HAMMING_MAX`` (default 3) shares ≥ 1 intact band (pigeonhole),
so candidate recall is exactly 1.0 — cross-batch too, because band
keys are content-only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_processing_spark.operators.store import (
    committed_batches as _committed,
    write_batch_marker,
)
from bigdata_processing_spark.thresholds import IMAGE_HAMMING_MAX, MAX_BUCKET

_HASH_COLS = ["img_id", "b0", "b1", "b2", "b3"]


def _bandl(hashes: DataFrame) -> DataFrame:
    out = None
    for b in range(4):
        leg = hashes.select(
            "img_id",
            F.concat_ws("_", F.lit(b), F.col(f"b{b}").cast("string")).alias("bk"),
        )
        out = leg if out is None else out.unionByName(leg)
    return out


def _write_image_batch(path: str, batch_id: int, hashes: DataFrame) -> int:
    spark = hashes.sparkSession
    hashes = hashes.persist()
    n = hashes.count()
    bandl = _bandl(hashes)
    bandl.write.mode("overwrite").parquet(f"{path}/bands/batch_id={batch_id}")
    bandl.groupBy("bk").agg(F.count("*").alias("n")).write.mode(
        "overwrite"
    ).parquet(f"{path}/bucket_sizes/batch_id={batch_id}")
    hashes.select(*_HASH_COLS).sortWithinPartitions("img_id").write.mode(
        "overwrite"
    ).parquet(f"{path}/hashes/batch_id={batch_id}")
    write_batch_marker(spark, path, batch_id, n)
    hashes.unpersist()
    return n


def build_image_index(media: DataFrame, path: str) -> int:
    """dHash ``media`` (img_id, payload BMP, media_type) and build the
    index as batch 0. Returns images indexed."""
    from bigdata_processing_spark.operators.multimodal import image_dhash

    return _write_image_batch(path, 0, image_dhash(media))


def committed_batches(spark: SparkSession, path: str) -> set[int]:
    return _committed(spark, path)


def append_image_batch(path: str, media: DataFrame,
                       batch_id: int | None = None) -> int:
    """Fold one image batch into the index — dHash (mapInPandas over the
    batch's pixels only) + partition-scoped overwrite. Replay-idempotent."""
    from bigdata_processing_spark.operators.multimodal import image_dhash

    if batch_id is None:
        batch_id = max(committed_batches(media.sparkSession, path)) + 1
    return _write_image_batch(path, batch_id, image_dhash(media))


def incremental_image_dup_pairs(
    new_media: DataFrame,
    path: str,
    hamming_max: int = IMAGE_HAMMING_MAX,
    max_bucket: int = MAX_BUCKET,
    exclude_batch_id: int | None = None,
) -> DataFrame:
    """(d1, d2, hamming) pairs INVOLVING the new batch — new×indexed
    and new×new — without rescanning indexed images: old band
    membership comes from the postings, the bucket cap sums the
    per-batch size tables (combined old+new — a hot template split
    across batches cannot evade it), over-cap buckets emit
    member×representative stars (same md5-ordered geometry as
    everywhere else), and verification joins the candidate ids against
    the NARROW hash tables. ``exclude_batch_id`` keeps a replayed
    batch from seeing itself as indexed."""
    from bigdata_processing_spark.operators.multimodal import image_dhash
    from bigdata_processing_spark.operators.skew import rep_star_pairs

    spark = new_media.sparkSession
    old_band = spark.read.parquet(f"{path}/bands")
    old_bsz = spark.read.parquet(f"{path}/bucket_sizes")
    old_hash = spark.read.parquet(f"{path}/hashes")
    if exclude_batch_id is not None:
        old_band = old_band.filter(F.col("batch_id") != exclude_batch_id)
        old_bsz = old_bsz.filter(F.col("batch_id") != exclude_batch_id)
        old_hash = old_hash.filter(F.col("batch_id") != exclude_batch_id)
    old_band = old_band.select("bk", "img_id")
    old_bsz = old_bsz.groupBy("bk").agg(F.sum("n").alias("n"))

    new_hash = image_dhash(new_media).persist()
    new_band = _bandl(new_hash)

    new_bsz = new_band.groupBy("bk").agg(F.count("*").alias("n_new"))
    totals = new_bsz.join(old_bsz, "bk", "left").select(
        "bk",
        (F.col("n_new") + F.coalesce(F.col("n"), F.lit(0))).alias("total"),
    )
    allowed = totals.filter(F.col("total") <= max_bucket).select("bk")
    probe = new_band.join(allowed, "bk")

    cross = probe.join(
        old_band.select("bk", F.col("img_id").alias("od")), "bk"
    ).select(
        F.least("img_id", "od").alias("d1"), F.greatest("img_id", "od").alias("d2")
    )
    b2 = probe.select("bk", F.col("img_id").alias("d2x"))
    within = probe.join(b2, "bk").filter(F.col("img_id") < F.col("d2x")).select(
        F.col("img_id").alias("d1"), F.col("d2x").alias("d2")
    )
    over = totals.filter(F.col("total") > max_bucket).select("bk")
    over_band = new_band.join(over, "bk").unionByName(old_band.join(over, "bk"))
    stars = rep_star_pairs(
        over_band, max_bucket, id_col="img_id",
        sizes=totals.filter(F.col("total") > max_bucket),
    )
    new_ids = new_hash.select("img_id")
    stars_b = stars.join(
        F.broadcast(new_ids.withColumnRenamed("img_id", "d1")), "d1", "semi"
    ).unionByName(
        stars.join(
            F.broadcast(new_ids.withColumnRenamed("img_id", "d2")), "d2", "semi"
        )
    )
    cand = (
        cross.filter(F.col("d1") != F.col("d2"))
        .unionByName(within)
        .unionByName(stars_b)
        .distinct()
    )

    ids = (
        cand.select(F.col("d1").alias("img_id"))
        .unionByName(cand.select(F.col("d2").alias("img_id")))
        .distinct()
    )
    lookup = (
        old_hash.select(*_HASH_COLS)
        .join(F.broadcast(ids), "img_id", "semi")
        .unionByName(new_hash.select(*_HASH_COLS))
    )
    a = lookup.select(F.col("img_id").alias("d1"),
                      *[F.col(f"b{i}").alias(f"x{i}") for i in range(4)])
    b = lookup.select(F.col("img_id").alias("d2"),
                      *[F.col(f"b{i}").alias(f"y{i}") for i in range(4)])
    hamming = None
    for i in range(4):
        term = F.bit_count(F.col(f"x{i}").bitwiseXOR(F.col(f"y{i}")))
        hamming = term if hamming is None else hamming + term
    out = (
        cand.join(F.broadcast(a), "d1").join(F.broadcast(b), "d2")
        .select("d1", "d2", hamming.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= hamming_max)
    )
    new_hash.unpersist(blocking=False)
    return out


def run_image_dedup_stream(
    stream: DataFrame,
    index_path: str,
    pairs_path: str,
    hamming_max: int = IMAGE_HAMMING_MAX,
    checkpoint: str | None = None,
):
    """Streaming front: per micro-batch of (img_id, payload,
    media_type), emit the batch-involving near-dup pairs under
    ``pairs_path/batch_id=N/`` then fold the batch into the index —
    exactly-once by the same partition-overwrite idempotence as the
    text bridge (the probe excludes the batch's own id, so a
    post-append replay computes the identical pair set)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id) + 1  # batch 0 is the build
        pairs = incremental_image_dup_pairs(
            batch_df, index_path, hamming_max=hamming_max,
            exclude_batch_id=bid,
        )
        pairs.write.mode("overwrite").parquet(f"{pairs_path}/batch_id={bid}")
        append_image_batch(index_path, batch_df, batch_id=bid)

    writer = stream.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
