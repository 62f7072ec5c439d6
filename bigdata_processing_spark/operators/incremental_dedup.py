"""Incremental batch dedup: probe NEW documents against a persisted
MinHash index without recomputing the corpus.

The append-only-corpus contract (the batch sibling of
streaming/dedup.py's stateful matcher, and the dedup analogue of
operators/ivf.append_to_ivf_index): a living training corpus grows by
daily batches, and re-running the full O(corpus) MinHash pipeline per
batch is the cost this module removes. The index persists exactly what
candidate generation + verification need —

- ``postings/``   (bk, doc_id): LSH band-bucket membership,
- ``bucket_sizes/`` (bk, n): per-bucket member counts, so probe-time
  bucket capping never rescans the postings,
- ``shingles/``   (doc_id, sh): the verification sets,
- ``stoplist/``   (s): the FROZEN set of too-common (boilerplate)
  shingles to EXCLUDE — a stop list, not an allow list, so a batch
  carrying novel vocabulary is still signable (novel shingles are by
  definition not yet boilerplate; an allow list would make novel-content
  batches invisible until the next refit — caught by
  test_incremental_dedup),
- ``meta/``       (n_docs, n_since_fit): drift bookkeeping —

and a batch probe costs O(batch + touched buckets): new docs hash over
everything outside the frozen stop list (same freeze-the-model move as
IVF's frozen-centroid assignment),
probe only the band buckets they land in, and verify only surviving
candidates. The stop list is frozen between refits because a
per-batch re-prune would re-sign the WHOLE corpus; when appended volume
crosses ``refit_threshold`` the stop list has drifted from the corpus
it summarizes and the index rebuilds aside + swaps in (crash window
healed by operators/compaction.recover_swap, same discipline as the
IVF rebuild).

Hashing is the portable md5 family (functions/text.minhash_hashes), so
the registered relational twin ``incremental_dedup_pairs``
(queries/dedup.py) reproduces the disk pipeline exactly — tests assert
disk-probe == twin row-for-row.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_processing_spark.functions import text as T
from bigdata_processing_spark.operators.compaction import recover_swap
from bigdata_processing_spark.thresholds import (
    JACCARD_THRESHOLD,
    MAX_BUCKET,
    MAX_DF,
    MAX_DF_FRAC,
    N_BANDS,
    N_HASHES,
)

REFIT_THRESHOLD = 0.5  # rebuild when appended docs exceed this fraction
_SWAP_SUFFIX = ".rebuild"


def _shingled(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select("doc_id", T.word_shingles(F.col(text_col), 2).alias("sh"))


def _band_keys_col():
    return F.array(
        *[
            F.md5(F.concat_ws("_", F.lit(b), F.col(f"h{2*b}"), F.col(f"h{2*b+1}")))
            for b in range(N_BANDS)
        ]
    )


def _sign_excluding(shex: DataFrame, stop: DataFrame) -> DataFrame:
    """doc_id → minhash signature over every shingle NOT in the stop
    list. Docs made entirely of boilerplate drop out (no signature ⇒
    no buckets ⇒ unprobeable — the batch pipeline under DF pruning does
    the same); docs with NOVEL shingles keep them (not yet boilerplate
    by definition)."""
    kept = shex.join(stop, "s", "left_anti")
    hashed = kept.select(
        "doc_id",
        *[h.alias(f"v{i}") for i, h in enumerate(T.minhash_hashes(F.col("s"), N_HASHES))],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"v{i}").alias(f"h{i}") for i in range(N_HASHES)]
    )


def build_minhash_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    max_df: int = MAX_DF,
    max_df_frac: float = MAX_DF_FRAC,
) -> int:
    """Build the persisted index over ``docs``; returns n_docs indexed.
    The DF prune uses the same relative cap as the batch family:
    ``max(max_df, ceil(max_df_frac·n_docs))``."""
    spark = docs.sparkSession
    shset = _shingled(docs, text_col).persist()
    n_docs = shset.count()
    shex = shset.select("doc_id", F.explode("sh").alias("s"))

    eff = max(max_df, int(math.ceil(max_df_frac * n_docs)))
    stop = (
        shex.groupBy("s")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") > eff)
        .select("s")
    )
    stop.write.mode("overwrite").parquet(f"{path}/stoplist")
    stop = spark.read.parquet(f"{path}/stoplist")  # re-read: frozen on disk

    sig = _sign_excluding(shex, stop)
    postings = sig.select("doc_id", F.explode(_band_keys_col()).alias("bk")).select(
        "bk", "doc_id"
    )
    postings.write.mode("overwrite").parquet(f"{path}/postings")
    spark.read.parquet(f"{path}/postings").groupBy("bk").agg(
        F.count("*").alias("n")
    ).write.mode("overwrite").parquet(f"{path}/bucket_sizes")
    shset.select("doc_id", "sh").write.mode("overwrite").parquet(f"{path}/shingles")
    spark.createDataFrame(
        [(n_docs, 0)], "n_docs long, n_since_fit long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    shset.unpersist()
    return n_docs


def incremental_dup_pairs(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    jaccard_threshold: float = JACCARD_THRESHOLD,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Verified near-dup pairs INVOLVING the new batch — (d1, d2,
    jaccard) with d1 < d2, covering new×indexed and new×new. Never
    rescans indexed documents' text: old shingle sets come from the
    index, old bucket membership from the postings, and the bucket cap
    reads the precomputed sizes (combined old+new count per bucket).

    Scale shape: new docs hash over everything outside the frozen stop
    list (anti-join by shingle — stop-list-sized side), the probe
    join is keyed on bk and touches only buckets the batch lands in,
    and verification is candidate-bounded. Nothing scales with corpus
    size except the bk/doc_id-keyed joins Spark shuffles by key."""
    spark = new_docs.sparkSession
    stop = spark.read.parquet(f"{path}/stoplist")
    old_post = spark.read.parquet(f"{path}/postings")
    old_bsz = spark.read.parquet(f"{path}/bucket_sizes")
    old_sh = spark.read.parquet(f"{path}/shingles")

    new_shset = _shingled(new_docs, text_col).persist()
    shex = new_shset.select("doc_id", F.explode("sh").alias("s"))
    sig = _sign_excluding(shex, stop)
    new_post = sig.select("doc_id", F.explode(_band_keys_col()).alias("bk")).select(
        "bk", "doc_id"
    )

    # combined bucket size = indexed members + batch members; the cap
    # must see both or a hot template split across batches evades it
    new_bsz = new_post.groupBy("bk").agg(F.count("*").alias("n_new"))
    allowed = (
        new_bsz.join(old_bsz, "bk", "left")
        .select(
            "bk",
            (F.col("n_new") + F.coalesce(F.col("n"), F.lit(0))).alias("total"),
        )
        .filter(F.col("total") <= max_bucket)
        .select("bk")
    )
    probe = new_post.join(allowed, "bk")

    cross = probe.join(
        old_post.select("bk", F.col("doc_id").alias("od")), "bk"
    ).select(
        F.least("doc_id", "od").alias("d1"), F.greatest("doc_id", "od").alias("d2")
    )
    b2 = probe.select("bk", F.col("doc_id").alias("d2x"))
    within = probe.join(b2, "bk").filter(F.col("doc_id") < F.col("d2x")).select(
        F.col("doc_id").alias("d1"), F.col("d2x").alias("d2")
    )
    cand = cross.filter(F.col("d1") != F.col("d2")).unionByName(within).distinct()

    # contract: batch doc_ids are DISJOINT from indexed ones (an id
    # re-appearing is an upsert, not an append — out of scope here), so
    # the union has exactly one shingle row per doc_id
    shs = old_sh.unionByName(new_shset)
    s1 = shs.select(F.col("doc_id").alias("d1"), F.col("sh").alias("sh1"))
    s2 = shs.select(F.col("doc_id").alias("d2"), F.col("sh").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    jac = inter.cast("double") / (F.size("sh1") + F.size("sh2") - inter)
    return (
        cand.join(s1, "d1")
        .join(s2, "d2")
        .select("d1", "d2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


def append_to_minhash_index(
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    refit_threshold: float = REFIT_THRESHOLD,
) -> tuple[int, bool]:
    """Fold the batch into the index: append postings/shingles under the
    FROZEN vocabulary, merge bucket sizes, bump meta. When docs added
    since the last (re)fit exceed ``refit_threshold`` of the corpus,
    rebuild the whole index aside (fresh DF prune over the grown corpus)
    and swap it in. Returns ``(n_appended, refit_performed)``."""
    spark = new_docs.sparkSession
    recover_swap(path.rstrip("/"), _SWAP_SUFFIX)
    recover_swap(f"{path}/bucket_sizes", _SWAP_SUFFIX)

    stop = spark.read.parquet(f"{path}/stoplist")
    new_shset = _shingled(new_docs, text_col).persist()
    n_new = new_shset.count()
    shex = new_shset.select("doc_id", F.explode("sh").alias("s"))
    sig = _sign_excluding(shex, stop)
    new_post = sig.select("doc_id", F.explode(_band_keys_col()).alias("bk")).select(
        "bk", "doc_id"
    )
    new_post.persist().count()  # sever lineage from files about to grow
    new_post.write.mode("append").parquet(f"{path}/postings")
    new_shset.select("doc_id", "sh").write.mode("append").parquet(f"{path}/shingles")

    merged_bsz = (
        spark.read.parquet(f"{path}/bucket_sizes")
        .unionByName(new_post.groupBy("bk").agg(F.count("*").alias("n")))
        .groupBy("bk")
        .agg(F.sum("n").alias("n"))
    )
    # bucket_sizes is derived state: rewrite aside + atomic swap so a
    # crash mid-overwrite can't leave it half-written (the mid-swap
    # window is healed by the recover_swap at entry). A crash BETWEEN
    # the postings append and this swap under-counts the batch's
    # buckets until the next append or rebuild — conservative only in
    # the cap's favor-of-work direction, never corrupting results
    # (verification is exact regardless).
    bsz_tmp = f"{path}/bucket_sizes{_SWAP_SUFFIX}"
    merged_bsz.write.mode("overwrite").parquet(bsz_tmp)
    old = f"{path}/bucket_sizes.old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(f"{path}/bucket_sizes", old)
    os.rename(bsz_tmp, f"{path}/bucket_sizes")
    shutil.rmtree(old)

    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    n_docs, n_since = meta.n_docs + n_new, meta.n_since_fit + n_new
    new_post.unpersist()
    new_shset.unpersist()

    if n_since / n_docs > refit_threshold:
        # rebuild from the persisted shingle sets — no document text
        # rescan; fresh relative DF prune over the grown corpus
        staged = path.rstrip("/") + _SWAP_SUFFIX
        shutil.rmtree(staged, ignore_errors=True)
        all_sh = spark.read.parquet(f"{path}/shingles")
        _rebuild_from_shingles(all_sh, staged)
        oldp = path.rstrip("/") + ".old"
        shutil.rmtree(oldp, ignore_errors=True)
        os.rename(path, oldp)
        os.rename(staged, path)
        shutil.rmtree(oldp)
        return n_new, True

    spark.createDataFrame(
        [(n_docs, n_since)], "n_docs long, n_since_fit long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    return n_new, False


def _rebuild_from_shingles(shset: DataFrame, path: str) -> None:
    """Full index rebuild from persisted (doc_id, sh) rows — fresh
    relative DF prune over the grown corpus, no document text needed."""
    spark = shset.sparkSession
    shset = shset.persist()
    n_docs = shset.count()
    shex = shset.select("doc_id", F.explode("sh").alias("s"))
    eff = max(MAX_DF, int(math.ceil(MAX_DF_FRAC * n_docs)))
    stop = (
        shex.groupBy("s")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") > eff)
        .select("s")
    )
    stop.write.mode("overwrite").parquet(f"{path}/stoplist")
    stop = spark.read.parquet(f"{path}/stoplist")
    sig = _sign_excluding(shex, stop)
    postings = sig.select("doc_id", F.explode(_band_keys_col()).alias("bk")).select(
        "bk", "doc_id"
    )
    postings.write.mode("overwrite").parquet(f"{path}/postings")
    spark.read.parquet(f"{path}/postings").groupBy("bk").agg(
        F.count("*").alias("n")
    ).write.mode("overwrite").parquet(f"{path}/bucket_sizes")
    shset.write.mode("overwrite").parquet(f"{path}/shingles")
    spark.createDataFrame(
        [(n_docs, 0)], "n_docs long, n_since_fit long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    shset.unpersist()
