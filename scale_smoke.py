"""Scale-up smoke: time the heavy queries at 1× and N× data volume.

Method (same as the BASELINE.md scale-up tables): build an N×-scaled
copy of the big fixture tables by unioning id-shifted clones —
documents/embeddings clones are EXACT near-dups of their originals, so
dedup pair counts explode by construction (that's the stress), while
events clones densify the timeline at the same span. Small dim tables
are symlinked unscaled. Each query then runs against the scaled dir
through the normal sf_dir interface.

Run: ``python scale_smoke.py [N] [sf_dir]`` (default 3, sf0.1).
Prints one JSON line per query with 1× and N× wall seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import TABLES, load_table, table_path
from bigdata_processing_spark.queries import bench_queries
from bigdata_processing_spark.session import get_spark

SCALED = {
    # table -> {id column -> span group}. Columns sharing a span group
    # are shifted by the SAME stride (the group's max over all member
    # columns + 1): l_orderkey and o_orderkey must move together or the
    # cloned lineitem rows would join the wrong cloned orders.
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    # relational facts (round 6): orders/lineitem clone n-fold with
    # orderkeys shifted in lockstep; custkey/suppkey/partkey stay
    # unshifted, referencing the symlinked unscaled dims — the realistic
    # scale-up shape (fact tables grow, dimensions don't)
    "orders": {"o_orderkey": "orderkey"},
    "lineitem": {"l_orderkey": "orderkey"},
}

QUERIES = [
    "minhash_lsh_dup_pairs",
    "minhash_unguarded_dup_pairs",
    "embedding_neardup_pairs",
    "dup_clusters",
    "knn_ivf_seeded",
    "contamination_test_vs_train",
    "tfidf_top_terms",
    "range_join_value_bands",
    "session_windows_30m",
    "token_packing_bins",
    # late-r03 additions: heaviest of the new surface
    "dedup_survivors",
    "boilerplate_chunk_stats",
    "unigram_surprisal_bands",
    # r04 sketches: events-based, so the N× clone densifies the stream
    "cms_overestimate_audit",
    # r04 semantic dedup: clones are exact near-dups, clusters explode
    "semantic_dedup_survivors",
    # r05: eps sweep shares the scored-pair pass; celled hard negatives
    # must stay cell-bounded as anchors AND candidates both 3x
    "semantic_dedup_sweep",
    "hard_negatives_celled",
    "incremental_dedup_pairs",
    "binary_quantized_knn",
    "sessionize_events",
    "edit_distance_dup_pairs",
    "session_funnel",
    "resample_hourly_ffill",
    "binary_rerank_knn",
    # round-4 additions
    "lsh_band_sweep",
    "winnowing_dup_passages",
    "ivf_append_assignment",
    "dedup_verifier_matrix",
    "doc_novelty_bands",
    "bigram_perplexity_bands",
    "pq_adc_knn",
    # round 6: relational-fact operators, never before run above sf0.1
    # (orders/lineitem now clone with lockstep orderkey shifts)
    "bloom_prejoin_revenue",
    "kmv_set_algebra",
    "salted_supplier_totals",
    "wei_decimal_topk",
    "pricing_summary",
    "hot_key_skew_report",
    # round 6 new surface: funnel is one map pass (should stay ~linear);
    # shard stats is one hash exchange; hashed-TF kNN's query set GROWS
    # with the clone factor (doc_id%100 survives id-shifts), so candidate
    # work is ~N× queries × N× docs — the brute tier's expected quadratic,
    # bounded by the tiny query fraction; vocab curve's explode N×-scales
    # but the window stays vocab-sized
    "gopher_rule_funnel",
    "training_shard_stats",
    "hashed_tf_knn",
    "vocab_coverage_curve",
    # round 7 new surface: the prefilter audit runs the UNFILTERED verify
    # (its cost IS the audit); image/simhash hamming families bucket on
    # band keys (clones are distance-0 -> over-cap stars at N-fold
    # cliques); bloom decon's screen is a literal map; fertility and
    # temperature mixtures are one-scan aggregates
    "minhash_prefilter_audit",
    "image_neardup_pairs",
    "incremental_image_dedup_pairs",
    "simhash_neardup_pairs",
    "bloom_decontamination",
    "token_fertility_by_lang",
    "temperature_mixture_weights",
]


def build_scaled_dir(spark, sf_dir: str, n: int, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    # pass 1: span per group = max over every member column + 1 (a
    # per-column span would collide clones when ranges differ, and
    # desynchronize join keys shared across tables)
    group_span: dict[str, int] = {}
    for t, cols in SCALED.items():
        if not os.path.exists(table_path(sf_dir, t)):
            continue
        df = load_table(spark, sf_dir, t)
        row = df.agg(*[F.max(c).alias(c) for c in cols]).collect()[0]
        for c, g in cols.items():
            group_span[g] = max(group_span.get(g, 0), row[c] + 1)
    for t in TABLES:
        src = table_path(sf_dir, t)
        if not os.path.exists(src):
            continue
        dst = table_path(out_dir, t)
        if t not in SCALED:
            if not os.path.exists(dst):
                os.symlink(src, dst)
            continue
        if os.path.islink(dst):  # left by a run before this table scaled
            os.unlink(dst)
        elif os.path.exists(dst):
            shutil.rmtree(dst)
        df = load_table(spark, sf_dir, t)
        parts = [df]
        for k in range(1, n):
            shifted = df
            for c, g in SCALED[t].items():
                shifted = shifted.withColumn(
                    c, F.col(c) + F.lit(k * group_span[g])
                )
            parts.append(shifted)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.parquet(dst)
    return out_dir


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    scaled_dir = build_scaled_dir(
        spark, sf_dir, n, f"/tmp/scale_smoke_{n}x_{os.path.basename(sf_dir.rstrip('/'))}"
    )

    q = bench_queries()
    # optional focus list: SCALE_SMOKE_QUERIES=a,b,c restricts the run
    # (used for targeted deep-scale rows, e.g. the 30x dup_clusters smoke)
    focus = os.environ.get("SCALE_SMOKE_QUERIES")
    names = [s for s in focus.split(",") if s] if focus else QUERIES
    for name in names:
        row = {"query": name, "n": n}
        for label, d in (("sec_1x", sf_dir), (f"sec_{n}x", scaled_dir)):
            t0 = time.monotonic()
            out_rows = q[name](spark, d).count()
            row[label] = round(time.monotonic() - t0, 2)
            row[f"rows_{label.split('_')[1]}"] = out_rows
        row["ratio"] = round(row[f"sec_{n}x"] / max(row["sec_1x"], 1e-9), 2)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
