"""IVF recall/latency sweep — the measured tradeoff curve behind the
``ivf_cell_count`` sizing policy (ROADMAP: "k_cells ∝ √n sizing policy
and a recall/latency sweep in the bench").

For each (k_cells, n_probe) config: build the index, run multi-probe
search for the % 100 == 0 query subset, and score recall@5 against
exact brute force. Prints one JSON line per config plus a summary.
Run: ``python ivf_sweep.py [sf_dir]`` (default /root/testdata/sf0.1).

Reading the curve: recall rises with n_probe (more cells scanned) and
falls with k_cells at fixed n_probe (each probe covers less of the
corpus); candidate count ~ n_queries · n_probe · n/k_cells is the
latency proxy that matters at scale — wall-clock at fixture size is
scheduling-overhead-dominated.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.functions import vectors as V
from bigdata_processing_spark.operators.ivf import (
    build_ivf_index,
    ivf_cell_count,
    ivf_search,
    seed_centroids,
    seeded_assign_cells,
    trained_centroids,
)
from bigdata_processing_spark.queries.similarity import knn_bruteforce
from bigdata_processing_spark.session import get_spark


def quantizer_comparison(spark, emb, n, exact) -> None:
    """Recall@5 of the three quantizer tiers at the SAME cell count and
    scan fraction — the round-6 measurement behind switching the celled
    query family (queries/dedup._emb_assigned) from seeded to trained
    cells. `seeded` = lowest-vec_id sample (round-5 celled family),
    `trained` = seeded + 2 deterministic Lloyd rounds (round-6 celled
    family, SQL-twin-reproducible), `kmeans` = operators/clustering full
    fit (production build_ivf_index, no SQL twin)."""
    policy_k = ivf_cell_count(n)
    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        V.norm(F.col("embedding")).alias("nrm"),
    )
    tiers = {
        "seeded": lambda: seed_centroids(emb, policy_k),
        "trained_2lloyd": lambda: trained_centroids(emb, policy_k, n_iter=2),
    }
    for tier, fit in tiers.items():
        t0 = time.monotonic()
        cents = fit()
        fit_s = round(time.monotonic() - t0, 2)
        indexed = base.join(
            seeded_assign_cells(base, cents), "vec_id"
        ).persist()
        indexed.count()
        q = indexed.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("qid"), F.col("e").alias("qe"),
            F.col("nrm").alias("qn"),
        )
        for n_probe in (1, 2, 4, 8):
            approx = {
                (r.qid, r.cid)
                for r in ivf_search(indexed, cents, q, 5, n_probe=n_probe).collect()
            }
            print(json.dumps({
                "quantizer": tier,
                "k_cells": policy_k,
                "n_probe": n_probe,
                "recall_at_5": round(len(approx & exact) / len(exact), 3),
                "scan_fraction": round(n_probe / policy_k, 3),
                "fit_sec": fit_s,
            }))
        indexed.unpersist()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ivf-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings").persist()
    n = emb.count()
    # exact ground truth = the registered brute-force query (same % 100
    # query subset, same top-5, same tie-breaks as ivf_search's output)
    exact = {(r.qid, r.cid) for r in knn_bruteforce(spark, sf_dir).collect()}

    policy_k = ivf_cell_count(n)
    rows = []
    for k_cells in sorted({8, 16, policy_k}):
        t0 = time.monotonic()
        indexed, cents = build_ivf_index(emb, k_cells=k_cells, n_iter=2)
        indexed = indexed.persist()
        indexed.count()
        build_s = round(time.monotonic() - t0, 2)
        q = indexed.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("qid"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
        )
        for n_probe in (1, 2, 4):
            t0 = time.monotonic()
            approx = {
                (r.qid, r.cid)
                for r in ivf_search(indexed, cents, q, 5, n_probe=n_probe).collect()
            }
            row = {
                "k_cells": k_cells,
                "is_policy_k": k_cells == policy_k,
                "n_probe": n_probe,
                "recall_at_5": round(len(approx & exact) / len(exact), 3),
                "search_sec": round(time.monotonic() - t0, 2),
                "build_sec": build_s,
                "scan_fraction": round(n_probe / k_cells, 3),
            }
            rows.append(row)
            print(json.dumps(row))
        indexed.unpersist()
    quantizer_comparison(spark, emb, n, exact)
    print(json.dumps({"bench": "ivf_sweep", "n_vectors": n,
                      "policy_k_cells": policy_k, "configs": len(rows)}))


if __name__ == "__main__":
    main()
