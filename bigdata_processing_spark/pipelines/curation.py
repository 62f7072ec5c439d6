"""End-to-end corpus curation: the composed pipeline a training-data
owner actually runs, chaining the individually-oracled stages into one
job with per-stage accounting:

    exact dedup → near-dup dedup → quality filter → decontamination
    → mixture balancing → emit (parquet, partitioned by source)

Each stage is a lazy DataFrame transformation built from the same
primitives the registered queries verify (fingerprints, connected-
component cluster labels, the len/stopword/punct quality score, trigram
holdout overlap, hash-deterministic per-source sampling), so the
pipeline's semantics are covered by the oracle suite; this module only
adds the composition and the stage ledger.

Scale shape: the corpus streams through; every per-doc decision joins
against a broadcast-sized side (fingerprint removal ids, cluster
labels, holdout trigram vocabulary, per-source keep-fractions). The
only corpus-sized shuffle is the exact-dedup fingerprint groupBy; the
near-dup labels come from the memoized MinHash pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.functions import text as T
from bigdata_processing_spark.queries.dedup import _cluster_labels
from bigdata_processing_spark.thresholds import JACCARD_THRESHOLD

QUALITY_MIN = 0.35          # docs scoring below this are dropped
DECONTAM_MIN_SHARED = 3     # trigrams shared with holdout → contaminated


@dataclass
class StageStats:
    stage: str
    docs_in: int
    docs_out: int

    @property
    def removed(self) -> int:
        return self.docs_in - self.docs_out


def _quality_score():
    return (
        0.5 * F.least(F.length("text") / 500.0, F.lit(1.0))
        + 0.3
        * (
            T.stopword_count(F.col("text")).cast("double")
            / F.greatest(T.token_count(F.col("text")), F.lit(1))
        )
        + 0.2
        * (
            1
            - T.punct_count(F.col("text")).cast("double")
            / F.greatest(F.length("text"), F.lit(1))
        )
    )


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    holdout: DataFrame | None = None,
    quality_min: float = QUALITY_MIN,
    jaccard_threshold: float = JACCARD_THRESHOLD,
    balance_sources: bool = True,
) -> list[StageStats]:
    """Run the full curation chain over ``{sf_dir}/documents`` and write
    the surviving corpus to ``out_path``. Returns the per-stage ledger.

    ``holdout``: optional (doc_id, text) frame of evaluation documents;
    training docs sharing >= DECONTAM_MIN_SHARED distinct trigrams with
    ANY holdout doc are dropped (the decontamination stage is skipped
    when no holdout is given).
    """
    stats: list[StageStats] = []
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()

    # 1. exact dedup: keep the min doc_id per normalized-text fingerprint
    fp = docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))
    keep_exact = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id"
    )
    cur = docs.join(keep_exact, "doc_id", "left_semi")
    n2 = cur.count()
    stats.append(StageStats("exact_dedup", n, n2))

    # 2. near-dup dedup: drop non-canonical cluster members (labels are
    # computed on the FULL corpus — a near-dup of an exact-removed doc is
    # still a near-dup of its kept canonical)
    labels = _cluster_labels(spark, sf_dir, jaccard_threshold)
    near_removed = labels.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    cur = cur.join(F.broadcast(near_removed), "doc_id", "left_anti")
    n3 = cur.count()
    stats.append(StageStats("near_dedup", n2, n3))

    # 3. quality floor
    cur = cur.filter(_quality_score() >= quality_min)
    n4 = cur.count()
    stats.append(StageStats("quality_filter", n3, n4))

    # 4. decontamination vs the holdout set (trigram overlap)
    if holdout is not None:
        ho_tri = (
            holdout.select(F.explode(T.word_shingles(F.col("text"), 3)).alias("s"))
            .distinct()
        )
        tri = cur.select(
            "doc_id", F.explode(T.word_shingles(F.col("text"), 3)).alias("s")
        )
        contaminated = (
            tri.join(F.broadcast(ho_tri), "s")
            .groupBy("doc_id")
            .agg(F.countDistinct("s").alias("n_shared"))
            .filter(F.col("n_shared") >= DECONTAM_MIN_SHARED)
            .select("doc_id")
        )
        cur = cur.join(F.broadcast(contaminated), "doc_id", "left_anti")
    n5 = cur.count()
    stats.append(StageStats("decontamination", n4, n5))

    # 5. mixture balancing: hash-deterministic downsample of every source
    # to the smallest source's count (skippable)
    if balance_sources:
        per_src = cur.groupBy("source").agg(F.count("*").alias("cnt"))
        rows = per_src.collect()  # sources are few — metadata, not data
        if rows:
            target = min(r.cnt for r in rows)
            fracs = {r.source: target / r.cnt for r in rows}
            bucket = F.pmod(
                T.hash64(F.col("doc_id").cast("string"), "curate"), F.lit(1_000_000)
            )
            conds = None
            for src, frac in fracs.items():
                c = (F.col("source") == src) & (bucket < int(frac * 1_000_000))
                conds = c if conds is None else conds | c
            cur = cur.filter(conds)
    n6 = cur.count()
    stats.append(StageStats("mixture_balance", n5, n6))

    # staged swap (same discipline as operators/compaction): write aside,
    # rename in — a crash mid-emit never leaves a half-written corpus at
    # out_path, and a previous emit stays readable until the new one
    # commits. recover with compaction.recover_swap(out_path, ".emitting").
    import os
    import shutil

    from bigdata_processing_spark.operators.compaction import recover_swap

    recover_swap(out_path, ".emitting")  # heal any earlier interrupted emit
    tmp = out_path.rstrip("/") + ".emitting"
    old = out_path.rstrip("/") + ".old"
    cur.write.mode("overwrite").partitionBy("source").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(out_path):
        os.rename(out_path, old)
    os.rename(tmp, out_path)
    shutil.rmtree(old, ignore_errors=True)
    n_out = spark.read.parquet(out_path).count()
    stats.append(StageStats("emit", n6, n_out))
    return stats


def main() -> None:
    """CLI: ``python -m bigdata_processing_spark.pipelines.curation
    [sf_dir] [out_path]`` — run the full chain and print the ledger as
    JSON lines."""
    import json
    import sys

    from bigdata_processing_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = get_spark("curate")
    spark.sparkContext.setLogLevel("ERROR")
    import time

    t0 = time.monotonic()
    for st in curate_corpus(spark, sf_dir, out):
        print(json.dumps({"stage": st.stage, "docs_in": st.docs_in,
                          "docs_out": st.docs_out, "removed": st.removed}))
    print(json.dumps({"total_wall_sec": round(time.monotonic() - t0, 2),
                      "out": out}))


if __name__ == "__main__":
    main()
