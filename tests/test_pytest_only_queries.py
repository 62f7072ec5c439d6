"""Rows-only queries demoted from the driver registry (register
driver=False): the driver can never hash-verify an iterative k-means
result, so they'd permanently burn sampled correctness slots (VERDICT
r02). They stay benched and quality-gated here instead; their
driver-checkable seeded twins (knn_ivf_seeded, kmeans_iteration_stats)
carry the driver verification.
"""

from __future__ import annotations

import pytest

from bigdata_processing_spark.queries import (
    all_oracles,
    all_queries,
    bench_queries,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pytest_only_excluded_from_driver_registry():
    driver = all_queries()
    bench = bench_queries()
    assert "knn_ivf_kmeans" not in driver
    assert "kmeans_clusters" not in driver
    assert "knn_ivf_kmeans" in bench
    assert "kmeans_clusters" in bench
    # no orphaned oracle entries for non-driver queries
    assert set(all_oracles()) <= set(driver)
    # the driver-checkable twins are still exposed
    assert "knn_ivf_seeded" in driver
    assert "kmeans_iteration_stats" in driver


@pytest.mark.parametrize("name", ["knn_ivf_kmeans", "kmeans_clusters"])
def test_pytest_only_queries_run(spark, name):
    df = bench_queries()[name](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    if name == "kmeans_clusters":
        # every vector lands in exactly one cluster
        assert sum(r.n_vecs for r in rows) == spark.read.parquet(
            f"{SF_DIR}/embeddings.parquet"
        ).count()
    else:
        # each sampled query returns exactly top_k=5 neighbors
        by_q = {}
        for r in rows:
            by_q.setdefault(r.qid, 0)
            by_q[r.qid] += 1
        assert all(v == 5 for v in by_q.values())
