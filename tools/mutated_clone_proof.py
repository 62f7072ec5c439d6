#!/usr/bin/env python
"""Mutated-clone scale fixture for the rep-star path (round-6 follow-up).

The exact-clone harnesses (scale_smoke.py, sf1_dedup_proof.py) scale dup
DENSITY but every family member is byte-identical, so exact dedup could
carry the load and candidate growth at 100x was clone-corpus-specific
(over-cap buckets grow with N by construction). This fixture plants the
dup class the representative-star pass exists for: LARGE NON-IDENTICAL
near-dup families — boilerplate templates — where each of F=50 members
appends a few member-unique tokens to a shared base text (bigram-set
Jaccard ~0.85-0.95: above JACCARD_THRESHOLD, below 1.0, so exact dedup
catches NOTHING and the pre-round-6 bucket-cap skip scored zero recall).

Per scale step it measures, over the guarded default pipeline
(queries/dedup._scored_candidates -> _verified_dup_pairs -> CC):

- candidate count (growth should be ~linear in the number of families:
  per-bucket rep-star work is O(B), families are independent)
- verified pair count
- family recall: mean over planted families of (members labeled with the
  family's minimum member) / F — the metric that was 0 before rep-star
- wall time per stage, shuffle/spill delta

Run: ``python tools/mutated_clone_proof.py [n_fams ...] [--sf DIR]``
(default steps 20 60 200 over sf0.1). Results land in BASELINE.md's
"mutated-clone rep-star proof" table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from bigdata_processing_spark.catalog import TABLES, load_table, table_path  # noqa: E402
from bigdata_processing_spark.session import get_spark  # noqa: E402

FAMILY_SIZE = 50     # 2x MAX_BUCKET: forces the representative path
MUT_TOKENS = 3       # member-unique suffix tokens (keeps bigram J >= ~0.85)
MIN_BASE_TOKENS = 60 # base docs long enough that the suffix can't sink J
FAM_TOKENS = 8       # family-unique tokens: when n_fams exceeds the
                     # fixture's long-doc supply, families REUSE base
                     # docs cyclically, and >= base/8 family-unique
                     # shingles push CROSS-family (same base) Jaccard
                     # below threshold while within-family stays >= ~0.9
                     # — families remain separable clusters at any scale


def build_corpus(spark, sf_dir: str, n_fams: int, out_dir: str) -> None:
    """Background = the fixture documents unchanged; planted = n_fams
    families of FAMILY_SIZE mutated clones of the n_fams longest base
    docs (deterministic: ordered by token count desc, doc_id asc).
    Planted ids: span + fam * FAMILY_SIZE + member."""
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = table_path(sf_dir, t)
        if not os.path.exists(src) or t == "documents":
            continue
        dst = table_path(out_dir, t)
        if not os.path.exists(dst):
            os.symlink(src, dst)
    dst = table_path(out_dir, "documents")
    shutil.rmtree(dst, ignore_errors=True)

    docs = load_table(spark, sf_dir, "documents")
    span = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    long_docs = (
        docs.withColumn("ntok", F.size(F.split(F.col("text"), r"\s+")))
        .filter(F.col("ntok") >= MIN_BASE_TOKENS)
        .orderBy(F.col("ntok").desc(), F.col("doc_id").asc())
        .limit(n_fams)
        .withColumn(
            "bidx",
            F.row_number().over(
                Window.orderBy(F.col("ntok").desc(), F.col("doc_id").asc())
            ) - 1,
        )
        .select("bidx", "text", "lang", "source")
    )
    n_base = long_docs.count()
    fams = spark.range(n_fams).select(
        F.col("id").alias("fam"),
        F.pmod(F.col("id"), F.lit(n_base)).cast("long").alias("bidx"),
    )
    fam_suffix = F.concat_ws(
        " ", *[
            F.concat(F.lit(f"ft{u}x"), F.col("fam").cast("string"))
            for u in range(FAM_TOKENS)
        ]
    )
    base = fams.join(long_docs, "bidx").select(
        "fam",
        F.concat_ws(" ", F.col("text"), fam_suffix).alias("text"),
        "lang", "source",
    )
    members = spark.range(FAMILY_SIZE).select(F.col("id").alias("member"))
    mut = F.concat_ws(
        " ",
        F.col("text"),
        *[
            F.concat(F.lit(f"mut{u}f"), F.col("fam"), F.lit("m"), F.col("member"))
            for u in range(MUT_TOKENS)
        ],
    )
    planted = (
        base.crossJoin(members)
        .select(
            (F.lit(span) + F.col("fam") * FAMILY_SIZE + F.col("member"))
            .cast("long").alias("doc_id"),
            mut.alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    docs.select("doc_id", "text", "lang", "source", "n_chars").unionByName(
        planted
    ).write.parquet(dst)


def shuffle_spill_mb(sc) -> tuple[float, float]:
    try:
        store = sc._jsc.sc().statusStore()
        args = [sc._jvm.java.util.ArrayList()] + [
            getattr(store, f"stageList$default${i}")() for i in range(2, 6)
        ]
        stages = store.stageList(*args)
        sw = sp = 0
        for s in (stages.apply(i) for i in range(stages.size())):
            sw += s.shuffleWriteBytes()
            sp += s.memoryBytesSpilled() + s.diskBytesSpilled()
        return sw / 1e6, sp / 1e6
    except Exception:
        return -1.0, -1.0


def run_step(spark, sf_dir: str, n_fams: int, audit: bool = False) -> dict:
    from bigdata_processing_spark.operators.graph import connected_components
    from bigdata_processing_spark.queries.dedup import (
        _scored_candidates,
        _verified_dup_pairs,
        clear_dedup_memos,
    )

    out_dir = f"/tmp/mutated_clone_{n_fams}f"
    build_corpus(spark, sf_dir, n_fams, out_dir)
    clear_dedup_memos()
    rep: dict = {"n_fams": n_fams, "family_size": FAMILY_SIZE}
    docs = load_table(spark, out_dir, "documents")
    rep["docs"] = docs.count()
    span = rep["docs"] - n_fams * FAMILY_SIZE  # background doc count == span

    sw0, sp0 = shuffle_spill_mb(spark.sparkContext)
    t0 = time.monotonic()
    rep["candidates"] = _scored_candidates(spark, out_dir).count()
    rep["sec_candidates"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    pairs = _verified_dup_pairs(spark, out_dir)
    rep["verified_pairs"] = pairs.count()
    rep["sec_verify"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    labels, rounds = connected_components(
        pairs.select("d1", "d2"), src="d1", dst="d2"
    )
    rep["cc_rounds"] = rounds
    lab = labels.toDF("doc_id", "cluster_id").filter(F.col("doc_id") >= span)
    fam_recall = (
        lab.withColumn("fam", ((F.col("doc_id") - span) / FAMILY_SIZE).cast("long"))
        .groupBy("fam", "cluster_id")
        .count()
        .groupBy("fam")
        .agg(F.max("count").alias("biggest"))
        .agg(
            F.count("*").alias("fams_clustered"),
            F.avg(F.col("biggest") / FAMILY_SIZE).alias("mean_recall"),
        )
        .collect()[0]
    )
    rep["fams_with_any_pair"] = fam_recall.fams_clustered
    rep["mean_family_recall"] = round(float(fam_recall.mean_recall or 0.0), 4)
    rep["sec_cc"] = round(time.monotonic() - t0, 2)

    sw1, sp1 = shuffle_spill_mb(spark.sparkContext)
    rep["shuffle_mb"] = round(sw1 - sw0, 1)
    rep["spill_mb"] = round(sp1 - sp0, 1)

    if audit:
        # two-stage-verify payoff in the MUTATED regime (VERDICT r7 #4):
        # the audit runs the UNFILTERED candidates through both the
        # signature prefilter and the exact join, so it measures what
        # the prefilter cuts where recall is non-trivial (the 100×
        # exact-clone measurement could not show that)
        from bigdata_processing_spark.queries.dedup import (
            minhash_prefilter_audit,
        )

        t0 = time.monotonic()
        arow = minhash_prefilter_audit(spark, out_dir).collect()[0]
        rep["audit"] = {
            "n_candidates": int(arow.n_candidates),
            "n_pass_prefilter": int(arow.n_pass),
            "n_true_pairs": int(arow.n_true_pairs),
            "n_missed": int(arow.n_missed),
            "prefilter_cut_pct": round(
                100.0 * (1 - arow.n_pass / max(arow.n_candidates, 1)), 1
            ),
            "sec": round(time.monotonic() - t0, 2),
        }
    clear_dedup_memos()
    shutil.rmtree(out_dir, ignore_errors=True)
    return rep


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    steps = [int(a) for a in args] or [20, 60, 200]
    audit = "--audit" in sys.argv
    spark = get_spark("mutated-clone-proof")
    spark.sparkContext.setLogLevel("ERROR")
    for n_fams in steps:
        print(json.dumps(run_step(spark, sf_dir, n_fams, audit=audit)),
              flush=True)


if __name__ == "__main__":
    main()
