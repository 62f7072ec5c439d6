"""End-to-end curation pipeline (pipelines/curation.py): stage ledger
consistency, output invariants, and decontamination behavior."""

from __future__ import annotations

import os

from conftest import SF_SMALL

from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.functions import text as T
from bigdata_processing_spark.pipelines.curation import curate_corpus
from bigdata_processing_spark.queries.dedup import clear_dedup_memos


def test_curate_corpus_ledger_and_invariants(spark, tmp_path):
    clear_dedup_memos()
    out = os.path.join(str(tmp_path), "curated")
    stats = curate_corpus(spark, SF_SMALL, out, balance_sources=True)

    # ledger: stages in order, counts chain and never increase
    names = [s.stage for s in stats]
    assert names == [
        "exact_dedup", "near_dedup", "quality_filter",
        "decontamination", "mixture_balance", "emit",
    ]
    for prev, nxt in zip(stats, stats[1:]):
        assert nxt.docs_in == prev.docs_out
        assert nxt.docs_out <= nxt.docs_in
    # the sf0.001 fixture has near-dups but not necessarily byte-exact
    # dups: dedup must remove something across the two stages combined
    assert stats[0].removed + stats[1].removed > 0
    assert stats[-1].docs_out > 0

    curated = spark.read.parquet(out)
    # no duplicate fingerprints survive
    n = curated.count()
    n_fp = curated.select(T.fingerprint(F.col("text")).alias("fp")).distinct().count()
    assert n == n_fp
    # balancing: per-source counts within the hash-sampling tolerance of
    # the smallest source (exact equality is not guaranteed by hashing)
    per_src = [r.cnt for r in curated.groupBy("source").agg(F.count("*").alias("cnt")).collect()]
    assert max(per_src) <= 1.5 * min(per_src) + 5


def test_curate_corpus_decontaminates_holdout(spark, tmp_path):
    clear_dedup_memos()
    docs = load_table(spark, SF_SMALL, "documents")
    # use a handful of real docs as the holdout: their surviving twins
    # (or themselves) must be dropped by trigram overlap
    holdout = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    hold_ids = {r.doc_id for r in holdout.collect()}
    out = os.path.join(str(tmp_path), "curated_h")
    stats = curate_corpus(
        spark, SF_SMALL, out, holdout=holdout, balance_sources=False
    )
    dec = next(s for s in stats if s.stage == "decontamination")
    assert dec.removed > 0
    curated_ids = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    # no holdout doc that reached the decontamination stage survives
    assert not (curated_ids & hold_ids)
    clear_dedup_memos()


def test_curation_funnel_matches_pipeline_ledger(spark, tmp_path):
    """The declarative curation_funnel query and the imperative
    curate_corpus pipeline must agree stage-for-stage."""
    import os

    from bigdata_processing_spark.queries.dedup import curation_funnel

    clear_dedup_memos()
    out = os.path.join(str(tmp_path), "curated_f")
    ledger = {s.stage: s.docs_out for s in curate_corpus(spark, SF_SMALL, out)}
    funnel = {r.stage: r.docs for r in curation_funnel(spark, SF_SMALL).collect()}
    for stage in ("exact_dedup", "near_dedup", "quality_filter", "mixture_balance"):
        assert funnel[stage] == ledger[stage], (stage, funnel[stage], ledger[stage])
    clear_dedup_memos()


def test_curation_emit_swap_recovers_from_crash_window(spark, tmp_path):
    """Simulate the emit swap's only non-atomic window (corpus parked at
    .old, target missing, stale scratch dir) — the next run must heal it
    and land a complete corpus with no leftovers."""
    import os
    import shutil

    out = os.path.join(str(tmp_path), "curated_swap")
    clear_dedup_memos()
    curate_corpus(spark, SF_SMALL, out, balance_sources=False)
    n_ok = spark.read.parquet(out).count()

    # crash window: previous corpus parked at .old, target gone, stale tmp
    os.rename(out, out + ".old")
    os.makedirs(out + ".emitting", exist_ok=True)
    open(os.path.join(out + ".emitting", "junk"), "w").write("partial")

    stats = curate_corpus(spark, SF_SMALL, out, balance_sources=False)
    assert spark.read.parquet(out).count() == n_ok
    assert stats[-1].docs_out == n_ok
    assert not os.path.exists(out + ".old")
    assert not os.path.exists(out + ".emitting")
    clear_dedup_memos()
