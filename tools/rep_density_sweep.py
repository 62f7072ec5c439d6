#!/usr/bin/env python
"""Rep-budget density curve for over-cap LSH buckets (r8/r9 verdict
carry-over: "measure the rep-star density boundary").

At extreme family DENSITY — many mutated-clone families sharing base
documents, so band buckets hold members of MANY families — the
rank-selected representatives of an over-cap bucket can all land in
OTHER families, leaving a family with zero intra-family pairs (r8
observed 34/8,800 pairless at the 445k-doc proof). This sweep measures
that boundary directly: same mutated-clone fixture,
``MAX_BUCKET_REPS`` swept, reporting per-budget

- pairless-family rate (families with NO verified intra-family pair —
  the silent-recall-loss metric)
- mean family recall proxy (verified intra-family pairs per family,
  capped at the F-1 a star needs to connect the family)
- candidate/verified counts and wall time (the cost side of the curve)

Density is controlled by how many families share one base doc
(``n_fams`` over the fixture's long-doc supply): family-crowded buckets
are exactly where the rep budget binds.

Run: ``python tools/rep_density_sweep.py [n_fams] [--sf DIR]
[--reps 8,16,32,64,128]``. JSON lines; the curve lands in BASELINE.md
("rep-star density boundary").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_processing_spark.session import get_spark  # noqa: E402
from tools.mutated_clone_proof import (  # noqa: E402
    FAMILY_SIZE,
    build_corpus,
    shuffle_spill_mb,
)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    reps_list = [8, 16, 32, 64, 128]
    n_fams = 2000
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps_list = [int(x) for x in args[i + 1].split(",")]
            i += 2
        else:
            n_fams = int(args[i])
            i += 1

    spark = get_spark("rep-density-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    import bigdata_processing_spark.thresholds as TH
    from bigdata_processing_spark.catalog import load_table
    from bigdata_processing_spark.queries.dedup import (
        _verified_dup_pairs,
        clear_dedup_memos,
    )

    out_dir = f"/tmp/rep_density_{n_fams}f"
    build_corpus(spark, sf_dir, n_fams, out_dir)
    docs = load_table(spark, out_dir, "documents")
    n_docs = docs.count()
    span = n_docs - n_fams * FAMILY_SIZE
    print(json.dumps({"fixture": out_dir, "docs": n_docs, "n_fams": n_fams,
                      "family_size": FAMILY_SIZE, "sf": sf_dir}), flush=True)

    default_reps = TH.MAX_BUCKET_REPS
    try:
        for reps in reps_list:
            TH.MAX_BUCKET_REPS = reps
            clear_dedup_memos()
            sw0, sp0 = shuffle_spill_mb(spark.sparkContext)
            t0 = time.monotonic()
            pairs = _verified_dup_pairs(spark, out_dir)
            fam = lambda c: ((F.col(c) - span) / FAMILY_SIZE).cast("long")  # noqa: E731
            intra = (
                pairs.filter((F.col("d1") >= span) & (F.col("d2") >= span))
                .filter(fam("d1") == fam("d2"))
                .select(fam("d1").alias("fam"))
                .groupBy("fam").agg(F.count("*").alias("n_pairs"))
            )
            per_fam = {r.fam: r.n_pairs for r in intra.collect()}
            wall = round(time.monotonic() - t0, 2)
            sw1, sp1 = shuffle_spill_mb(spark.sparkContext)
            pairless = n_fams - len(per_fam)
            connect_cap = FAMILY_SIZE - 1  # pairs a spanning star needs
            recall_proxy = sum(
                min(v, connect_cap) for v in per_fam.values()
            ) / (n_fams * connect_cap)
            print(json.dumps({
                "max_bucket_reps": reps,
                "verified_pairs": pairs.count(),
                "intra_family_pairs": int(sum(per_fam.values())),
                "pairless_families": int(pairless),
                "pairless_rate": round(pairless / n_fams, 5),
                "recall_proxy": round(recall_proxy, 4),
                "sec": wall,
                "shuffle_mb": round(sw1 - sw0, 1),
                "spill_mb": round(sp1 - sp0, 1),
            }), flush=True)
    finally:
        TH.MAX_BUCKET_REPS = default_reps
        clear_dedup_memos()


if __name__ == "__main__":
    main()
