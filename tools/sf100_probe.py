#!/usr/bin/env python
"""Targeted 100x probe of the slowest sf1 queries (VERDICT r10 #4).

The sf1 FULL-SUITE sweep caught the SortAggregate spill storm that the
sf0.1 bench could not; this runs the ~10 queries that top the sf1 wall
table two MORE orders up (100x sf0.1: ~6M documents / ~1M embeddings /
~10M events, the same id-shifted clone construction as
tools/sf1_bench.py) and records wall / shuffle / spill per query — the
cheapest way to catch the next scale-hazard class one order earlier
than the sf1 row.

The clone corpus is dup-hostile by construction (every doc has 99 exact
clones), which is exactly the regime the dedup family's guards are for.
TPC-H relational tables stay symlinked unscaled, same as sf1_bench.

Usage:
    python tools/sf100_probe.py [--reuse] [--only name1,name2]
                                [--tier 1|2|3|4|all] [--canonical]

--reuse skips the corpus rebuild (/tmp/sf100_equiv).
--tier picks the target set: 1 = the sf1 wall-table top-10 (the r11
probe set), 2 = rows 11-20 (round 12 — each order of magnitude has
hidden a new hazard class, so the next tier gets probed too), all =
both. Prints a table for BASELINE.md and exits nonzero if any probed
query spills more than SPILL_FLAG_MB (a spill at this scale is the
hazard this tool exists to surface — triage before shipping, and
either fix or adjudicate it in BASELINE.md like the r10 label-verify
sort).

Output discipline (round 12, ADVICE r11): measurements always land in
BENCH_SF100_PROBE.raw.json (or .partial.json for --only runs). The
canonical BENCH_SF100_PROBE.json carries hand-written adjudications
('corpus', 'provenance', per-row 'note') that a blind overwrite would
destroy — it is only touched under --canonical, which MERGES: measured
rows replace matching query rows but keep their existing 'note',
unmeasured rows and extra top-level keys survive verbatim.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = "/tmp/sf100_equiv"
N = 100
SPILL_FLAG_MB = 256.0  # a healthy external sort on one hot join is
# tolerable (adjudicated r10); a multi-GB storm is not

# the sf1 wall-table top (BENCH_SF1_DETAIL.json r10) — the queries whose
# cost grows with the scaled tables and dominated the 10x row
TARGETS = (
    "simhash_neardup_pairs",
    "edit_distance_dup_pairs",
    "matryoshka_knn_recall",
    "hashed_tf_knn",
    "hard_negative_probe_sweep",
    "knn_ivf_kmeans",
    "doc_novelty_bands",
    "winnowing_dup_passages",
    "pq_adc_knn",
    "hashed_tf_knn_celled",
)

# rows 11-20 of the same sf1 wall table (round 12 — VERDICT r11 #3)
TARGETS_TIER2 = (
    "embedding_neardup_pairs",
    "knn_bruteforce",
    "contamination_test_vs_train",
    "quantized_knn_sample",
    "bigram_perplexity_bands",
    "kmeans_clusters",
    "bloom_decontamination",
    "hard_negatives",
    "quality_scores",
    "knn_ivf_seeded",
)

# the dedup rows OUTSIDE the sf1 wall tiers (round 13 second session —
# first-ever 100x rows for these found the unfiltered-verify shingle-
# array spill storm, 75-88 GB, fixed by the fingerprint-pair verify;
# keep them in the probe set so the fix stays attested)
TARGETS_TIER4 = (
    "dedup_verifier_matrix",
    "minhash_estimate_audit",
    "minhash_lsh_dup_pairs",
    "containment_dup_pairs",
    "semantic_dedup_sweep",
    "incremental_dedup_pairs",
    "lsh_band_sweep",
    "embedding_neardup_pairs",
)

# rows 21-30 (round 12, proactive — the tiering logic keeps finding a
# new hazard class one order down)
TARGETS_TIER3 = (
    "quality_weighted_sample",
    "kmeans_iteration_stats",
    "rolling_1h_stats",
    "hard_negatives_celled",
    "lsh_recall_audit",
    "word_entropy_bands",
    "binary_rerank_knn",
    "quantile_sketch_audit",
    "kmv_set_algebra",
    "map_entries_explode",
)


def _stage_totals(sc) -> tuple[float, float]:
    from tools.sf1_dedup_proof import shuffle_spill_mb

    return shuffle_spill_mb(sc)


def main() -> None:
    from bigdata_processing_spark.queries import bench_queries
    from bigdata_processing_spark.queries.dedup import clear_dedup_memos
    from bigdata_processing_spark.session import get_spark

    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    tier = (
        sys.argv[sys.argv.index("--tier") + 1]
        if "--tier" in sys.argv else "1"
    )
    all_targets = {
        "1": TARGETS, "2": TARGETS_TIER2, "3": TARGETS_TIER3,
        "4": TARGETS_TIER4,
        "all": TARGETS + TARGETS_TIER2 + TARGETS_TIER3 + tuple(
            t for t in TARGETS_TIER4
            if t not in TARGETS + TARGETS_TIER2 + TARGETS_TIER3
        ),
    }[tier]

    spark = get_spark("sf100-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    if "--reuse" not in sys.argv or not os.path.exists(OUT_DIR):
        # same clone construction as sf1_bench.build, at N=100: scale
        # the three corpus tables, symlink the relational fixture
        import tools.sf1_bench as s1

        prev_out, prev_n = s1.OUT_DIR, s1.N
        s1.OUT_DIR, s1.N = OUT_DIR, N
        try:
            s1.build(spark, "/root/testdata/sf0.1")
        finally:
            s1.OUT_DIR, s1.N = prev_out, prev_n

    queries = bench_queries()
    targets = [t for t in all_targets if (only is None or t in only)]
    rows = []
    for name in targets:
        clear_dedup_memos()
        sw0, sp0 = _stage_totals(sc)
        t0 = time.perf_counter()
        queries[name](spark, OUT_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        sw1, sp1 = _stage_totals(sc)
        rows.append({
            "query": name,
            "wall_s": round(wall, 1),
            "shuffle_mb": round(sw1 - sw0, 1),
            "spill_mb": round(sp1 - sp0, 1),
        })
        print(f"{name}: {wall:.1f}s shuffle {sw1 - sw0:.0f}MB "
              f"spill {sp1 - sp0:.0f}MB", flush=True)
    clear_dedup_memos()

    # measurements never clobber the canonical table (it carries
    # hand-written adjudications); raw/partial files hold every run
    name = ("BENCH_SF100_PROBE.raw.json" if only is None
            else "BENCH_SF100_PROBE.partial.json")
    out = os.path.join(REPO, name)
    with open(out, "w") as f:
        json.dump({"n": N, "sf_base": 0.1, "tier": tier, "rows": rows},
                  f, indent=1)
    print(f"\nwrote {out}")
    if "--canonical" in sys.argv:
        canon_path = os.path.join(REPO, "BENCH_SF100_PROBE.json")
        canon = {"n": N, "sf_base": 0.1, "rows": []}
        if os.path.exists(canon_path):
            with open(canon_path) as f:
                canon = json.load(f)
        by_q = {r["query"]: r for r in canon.get("rows", [])}
        for r in rows:
            old = by_q.get(r["query"])
            if old is not None and "note" in old:
                r = {**r, "note": old["note"]}
            by_q[r["query"]] = r
        canon["rows"] = list(by_q.values())
        with open(canon_path, "w") as f:
            json.dump(canon, f, indent=1)
        print(f"merged into {canon_path} (notes/provenance preserved)")
    print("\n| query | wall_s | shuffle_mb | spill_mb |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['query']} | {r['wall_s']} | {r['shuffle_mb']} | "
              f"{r['spill_mb']} |")
    flagged = [r for r in rows if r["spill_mb"] > SPILL_FLAG_MB]
    if flagged:
        print(f"\nSPILL FLAGS (> {SPILL_FLAG_MB} MB): "
              f"{[(r['query'], r['spill_mb']) for r in flagged]}")
        sys.exit(1)
    print("\nzero spill flags")


if __name__ == "__main__":
    main()
