#!/usr/bin/env python
"""End-to-end curation at 100× (VERDICT r6 next-round #4).

Runs the FULL composed chain — exact dedup → near-dup dedup → quality
floor → decontamination → mixture balance → emit (+ append state) →
training shards — over the 100× clone corpus (500k docs; the same
fixture as tools/sf1_dedup_proof.py), then curates ONE 10% append
batch through the incremental state and reports whether the append
cost tracked the batch, not the corpus.

Holdout: 5 original docs (doc_id % 1000 == 7 of the base corpus) — a
bounded, visible decon effect (~3% of survivors; the fixture's
templated text shares trigrams so aggressively that a 50-doc holdout
already decontaminates 75% of the corpus — measured before choosing).

Run: ``python tools/curation_scale_proof.py [N] [sf_dir]``
(default 100, sf0.1). One JSON line per stage; the numbers land in
BASELINE.md's "end-to-end curation at 100×" table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_processing_spark.catalog import load_table  # noqa: E402
from bigdata_processing_spark.session import get_spark  # noqa: E402
from tools.sf1_dedup_proof import build_docs_scaled, shuffle_spill_mb  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("curation-scale-proof")
    spark.sparkContext.setLogLevel("ERROR")

    from bigdata_processing_spark.operators.incremental_dedup import (
        index_doc_count,
    )
    from bigdata_processing_spark.pipelines.curation import (
        _state_path,
        curate_append,
        curate_corpus_with_state,
        read_curated,
        shard_curated,
    )
    from bigdata_processing_spark.queries.dedup import clear_dedup_memos

    scaled = build_docs_scaled(spark, sf_dir, n, f"/tmp/sf1_dedup_proof_{n}x")
    out = f"/tmp/curation_proof_{n}x/curated"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    clear_dedup_memos()

    holdout = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 1000 == 7
    ).select("doc_id", "text")
    sw0, sp0 = shuffle_spill_mb(spark.sparkContext)

    t0 = time.monotonic()
    stats = curate_corpus_with_state(spark, scaled, out, holdout=holdout)
    full_wall = round(time.monotonic() - t0, 2)
    for st in stats:
        print(json.dumps({"stage": st.stage, "docs_in": st.docs_in,
                          "docs_out": st.docs_out, "removed": st.removed}))
    sw1, sp1 = shuffle_spill_mb(spark.sparkContext)
    print(json.dumps({"full_chain_wall_sec": full_wall,
                      "shuffle_mb": round(sw1 - sw0, 1),
                      "spill_mb": round(sp1 - sp0, 1)}))

    t0 = time.monotonic()
    ledger = shard_curated(spark, out, f"/tmp/curation_proof_{n}x/shards")
    n_shards = ledger.count()
    n_sharded = ledger.agg(F.sum("n_docs")).collect()[0][0]
    print(json.dumps({"shard_wall_sec": round(time.monotonic() - t0, 2),
                      "n_shards": int(n_shards), "sharded_docs": int(n_sharded)}))

    # ---- one 10% append batch: the first 10 clone groups' docs, re-id'd
    # above everything indexed (heavy near-dups of the corpus — the
    # realistic recrawl shape)
    docs = load_table(spark, scaled, "documents")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    base = load_table(spark, sf_dir, "documents")
    span = base.agg(F.max("doc_id")).collect()[0][0] + 1
    batch = (
        docs.filter(F.col("doc_id") < span * max(1, n // 10))
        .withColumn("doc_id", F.col("doc_id") + F.lit(max_id + 1))
    )
    idx_docs = index_doc_count(spark, f"{_state_path(out)}/mh")
    sw0, sp0 = shuffle_spill_mb(spark.sparkContext)
    t0 = time.monotonic()
    asts = curate_append(spark, out, batch, holdout=holdout)
    append_wall = round(time.monotonic() - t0, 2)
    sw1, sp1 = shuffle_spill_mb(spark.sparkContext)
    for st in asts:
        print(json.dumps({"append_stage": st.stage, "docs_in": st.docs_in,
                          "docs_out": st.docs_out, "removed": st.removed}))
    print(json.dumps({
        "append_wall_sec": append_wall,
        "append_batch_docs": asts[0].docs_in,
        "index_docs_untouched": idx_docs,
        "full_chain_wall_sec": full_wall,
        "append_vs_full_ratio": round(append_wall / full_wall, 3),
        "append_shuffle_mb": round(sw1 - sw0, 1),
        "append_spill_mb": round(sp1 - sp0, 1),
        "curated_total": read_curated(spark, out).count(),
    }))
    clear_dedup_memos()


if __name__ == "__main__":
    main()
