"""Incremental + streaming image near-dup: probe NEW images against a
persisted dHash index without rescanning indexed pixels (ROADMAP
round-8 #2, landed round 7; round 11 adopts the signature-collapse +
connectivity-star contract of the batch operator).

The image sibling of operators/incremental_dedup.py, riding the same
idempotence discipline (every write OVERWRITES its own ``batch_id=N``
partition; counts marker written LAST) and the same probe shape
(bucket-keyed candidates against stored postings, combined-size bucket
cap with representative stars, candidate-bounded verification). The
units are 10⁴× smaller, though: a dHash is 4×16-bit bands (~40 B/image
vs KBs of shingles), so the whole verification side is a narrow-table
join — pixel bytes never enter the index at all.

Round-11 contract (mirrors
operators/multimodal.image_neardup_pairs_from_hashes): identical
signatures collapse to their FIRST-SEEN min-id representative; the
index stores only DISTINCT-signature reps; the emitted pair set is the
connectivity-preserving edge set — member ↔ clique-rep stars (hamming
0) plus one verified rep ↔ rep edge per signature pair. A new member
of an ALREADY-INDEXED signature therefore costs exactly one output
edge and zero band work — the dominant arrival class of a crawl
ingest. Append ids must be larger than indexed ids (the same
first-seen-rep monotonicity contract as the text index).

On-disk layout at ``{path}``:

- ``bands/batch_id=N/``   (bk, img_id): band-bucket postings of the
  batch's NEW-signature reps, bk = ``{band}_{value}`` — identical keys
  to the batch operator,
- ``bucket_sizes/batch_id=N/`` (bk, n): per-batch DISTINCT-SIG bucket
  counts — the probe's cap sums these instead of rescanning postings,
- ``hashes/batch_id=N/``  (img_id, b0..b3): the new-signature rep
  table (signature match + verification),
- ``counts/batch_id=N/``  (n): completion marker (batch IMAGE count,
  not rep count), written last.

Recall contract: 4 bands × 16 bits ⇒ any signature pair within Hamming
``IMAGE_HAMMING_MAX`` (default 3) shares ≥ 1 intact band (pigeonhole),
so rep-pair candidate recall is exactly 1.0 up to the over-cap star
bound — cross-batch too, because band keys are content-only — and no
member is ever pairless (its clique star edge is unconditional).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_processing_spark.operators.store import (
    committed_batches as _committed,
    write_batch_marker,
)
from bigdata_processing_spark.thresholds import IMAGE_HAMMING_MAX, MAX_BUCKET

_HASH_COLS = ["img_id", "b0", "b1", "b2", "b3"]
_SIG_COLS = ["b0", "b1", "b2", "b3"]


def _bandl(hashes: DataFrame) -> DataFrame:
    # ONE pass: explode the 4 band keys per row instead of a 4-leg
    # unionByName (4 reads of the input and 4x the task count — same
    # restructure as the batch operator, r12)
    return hashes.select(
        "img_id",
        F.explode(F.array(*[
            F.concat_ws("_", F.lit(b), F.col(f"b{b}").cast("string"))
            for b in range(4)
        ])).alias("bk"),
    )


def _indexed_sigs(spark: SparkSession, path: str,
                  exclude_batch_id: int | None) -> DataFrame | None:
    """The stored distinct-signature rep table, or None before batch 0."""
    if not os.path.exists(f"{path}/hashes"):
        return None
    sigs = spark.read.parquet(f"{path}/hashes")
    if exclude_batch_id is not None:
        sigs = sigs.filter(F.col("batch_id") != exclude_batch_id)
    return sigs.select(*_HASH_COLS)


def _assign_sigs(new_hash: DataFrame, old_sigs: DataFrame | None) -> DataFrame:
    """(img_id, b0..b3, sig_id, is_new_sig): match each batch image's
    signature against the indexed reps; unmatched signatures get the
    batch's min-id member as their first-seen rep."""
    if old_sigs is not None:
        matched = old_sigs.select(
            F.col("img_id").alias("__old_rep"), *_SIG_COLS
        )
        # deliberately UNHINTED: the rep table grows with the corpus's
        # distinct signatures (a forced broadcast is the OOM class the
        # regime sweep bans), while the probe side is batch-bounded —
        # Catalyst/AQE picks BHJ at small scale, SMJ past it; both
        # sides are 36 B/row narrow
        j = new_hash.join(matched, _SIG_COLS, "left")
    else:
        j = new_hash.withColumn("__old_rep", F.lit(None).cast("long"))
    sigw = Window.partitionBy(*_SIG_COLS)
    return j.select(
        *_HASH_COLS,
        F.coalesce(
            F.col("__old_rep"), F.min("img_id").over(sigw)
        ).alias("sig_id"),
        F.col("__old_rep").isNull().alias("__new_sig"),
    )


def _enforce_monotone(new_hash: DataFrame, old_sigs: DataFrame | None) -> None:
    """First-seen-rep monotonicity, ENFORCED (round 12): every appended
    img_id must exceed every indexed rep id. A violating batch would
    silently produce star edges with d1 > d2 and a clique rep that
    diverges from the batch operator's global-min rep, breaking the
    pinned incremental == batch equivalence — fail loudly instead.
    One narrow agg per side (the rep store is distinct-signature reps
    only, and parquet footer stats keep the max cheap)."""
    if old_sigs is None:
        return
    lo = new_hash.agg(F.min("img_id")).first()[0]
    if lo is None:
        return
    hi = old_sigs.agg(F.max("img_id")).first()[0]
    if hi is not None and lo <= hi:
        raise ValueError(
            "append batch violates the first-seen-rep contract: min batch "
            f"img_id {lo} <= max indexed rep id {hi}. Append ids must be "
            "strictly larger than every indexed id (module docstring); "
            "re-id the batch or rebuild the index."
        )


def _write_image_batch(path: str, batch_id: int, hashes: DataFrame) -> int:
    """Fold a batch into the index: store band postings / bucket sizes /
    rep hashes for the batch's NEW signatures only (a member of an
    indexed signature adds nothing to the index — its clique rep
    already carries the signature). Replay-safe: the batch's own store
    rows are excluded from the match, so a redelivery recomputes and
    overwrites identical partitions."""
    spark = hashes.sparkSession
    hashes = hashes.persist()
    n = hashes.count()
    old_sigs = _indexed_sigs(spark, path, batch_id)
    _enforce_monotone(hashes, old_sigs)
    asg = _assign_sigs(hashes, old_sigs)
    reps = asg.filter(
        F.col("__new_sig") & (F.col("img_id") == F.col("sig_id"))
    ).select(*_HASH_COLS).persist()
    bandl = _bandl(reps)
    bandl.write.mode("overwrite").parquet(f"{path}/bands/batch_id={batch_id}")
    bandl.groupBy("bk").agg(F.count("*").alias("n")).write.mode(
        "overwrite"
    ).parquet(f"{path}/bucket_sizes/batch_id={batch_id}")
    reps.sortWithinPartitions("img_id").write.mode(
        "overwrite"
    ).parquet(f"{path}/hashes/batch_id={batch_id}")
    write_batch_marker(spark, path, batch_id, n)
    reps.unpersist()
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
    """(d1, d2, hamming) edges INVOLVING the new batch under the
    connectivity-star contract — exactly the batch operator's output
    restricted to batch-involving rows:

    - a batch image whose signature is already indexed emits ONE star
      edge to its clique rep (hamming 0) and nothing else — its cross
      edges are carried by its rep, whose rep-pairs were emitted when
      the younger signature arrived;
    - a batch image introducing a new signature emits its clique star
      edges (within-batch members) and the new rep probes the stored
      band postings (combined old+new DISTINCT-SIG bucket caps,
      representative stars over hot buckets, popcount verification
      against the narrow rep tables) for new×old and new×new rep
      pairs.

    ``exclude_batch_id`` keeps a replayed batch from seeing itself as
    indexed."""
    from bigdata_processing_spark.operators.multimodal import image_dhash

    return incremental_image_dup_pairs_from_hashes(
        image_dhash(new_media), path, hamming_max=hamming_max,
        max_bucket=max_bucket, exclude_batch_id=exclude_batch_id,
    )


def incremental_image_dup_pairs_from_hashes(
    new_hash: DataFrame,
    path: str,
    hamming_max: int = IMAGE_HAMMING_MAX,
    max_bucket: int = MAX_BUCKET,
    exclude_batch_id: int | None = None,
) -> DataFrame:
    """:func:`incremental_image_dup_pairs` over an already-computed
    ``(img_id, b0..b3)`` dHash frame — the probe body, split out so
    hash-level callers (and the arrival-cost probe,
    tools/image_arrival_probe.py) skip the decode."""
    from bigdata_processing_spark.operators.skew import rep_star_pairs

    spark = new_hash.sparkSession
    old_sigs = _indexed_sigs(spark, path, exclude_batch_id)
    new_hash = new_hash.persist()
    _enforce_monotone(new_hash, old_sigs)
    asg = _assign_sigs(new_hash, old_sigs).persist()

    # clique star edges: every non-rep batch member links to its rep
    # (the rep is the min id — older than any appended member)
    star_edges = asg.filter(F.col("img_id") != F.col("sig_id")).select(
        F.col("sig_id").alias("d1"),
        F.col("img_id").alias("d2"),
        F.lit(0).cast("bigint").alias("hamming"),
    )

    new_reps = asg.filter(
        F.col("__new_sig") & (F.col("img_id") == F.col("sig_id"))
    ).select(*_HASH_COLS)

    old_band = (
        spark.read.parquet(f"{path}/bands")
        if os.path.exists(f"{path}/bands") else None
    )
    old_bsz = (
        spark.read.parquet(f"{path}/bucket_sizes")
        if os.path.exists(f"{path}/bucket_sizes") else None
    )
    if exclude_batch_id is not None and old_band is not None:
        old_band = old_band.filter(F.col("batch_id") != exclude_batch_id)
        old_bsz = old_bsz.filter(F.col("batch_id") != exclude_batch_id)
    new_band = _bandl(new_reps)
    new_bsz = new_band.groupBy("bk").agg(F.count("*").alias("n_new"))
    if old_band is not None:
        old_band = old_band.select("bk", "img_id")
        old_bsz = old_bsz.groupBy("bk").agg(F.sum("n").alias("n"))
        totals = new_bsz.join(old_bsz, "bk", "left").select(
            "bk",
            (F.col("n_new") + F.coalesce(F.col("n"), F.lit(0))).alias("total"),
        )
    else:
        old_band = new_band.filter(F.lit(False))
        totals = new_bsz.select("bk", F.col("n_new").alias("total"))

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
    over = totals.filter(F.col("total") > max_bucket)
    over_band = new_band.join(over.select("bk"), "bk").unionByName(
        old_band.join(over.select("bk"), "bk")
    )
    stars = rep_star_pairs(over_band, max_bucket, id_col="img_id", sizes=over)
    new_ids = new_reps.select("img_id")
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
        (old_sigs if old_sigs is not None
         else new_reps.filter(F.lit(False)))
        .join(F.broadcast(ids), "img_id", "semi")
        .unionByName(new_reps)
    )
    a = lookup.select(F.col("img_id").alias("d1"),
                      *[F.col(f"b{i}").alias(f"x{i}") for i in range(4)])
    b = lookup.select(F.col("img_id").alias("d2"),
                      *[F.col(f"b{i}").alias(f"y{i}") for i in range(4)])
    hamming = None
    for i in range(4):
        term = F.bit_count(F.col(f"x{i}").bitwiseXOR(F.col(f"y{i}")))
        hamming = term if hamming is None else hamming + term
    rep_pairs = (
        cand.join(F.broadcast(a), "d1").join(F.broadcast(b), "d2")
        .select("d1", "d2", hamming.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= hamming_max)
    )
    out = star_edges.unionByName(rep_pairs)
    new_hash.unpersist(blocking=False)
    asg.unpersist(blocking=False)
    return out


def run_image_dedup_stream(
    stream: DataFrame,
    index_path: str,
    pairs_path: str,
    hamming_max: int = IMAGE_HAMMING_MAX,
    checkpoint: str | None = None,
):
    """Streaming front: per micro-batch of (img_id, payload,
    media_type), emit the batch-involving near-dup edges under
    ``pairs_path/batch_id=N/`` then fold the batch into the index —
    exactly-once by the same partition-overwrite idempotence as the
    text bridge (the probe excludes the batch's own id, so a
    post-append replay computes the identical edge set)."""

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
