"""Iterative k-means: deterministic, monotonically improving, fully
distributed per-iteration work."""

from __future__ import annotations

from conftest import SF_SMALL

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.operators.clustering import kmeans_fit


def test_kmeans_inertia_decreases(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    assignments, inertia = kmeans_fit(emb, k=5, n_iter=4)
    assert len(inertia) == 4
    # k-means inertia is non-increasing across iterations
    assert all(b <= a + 1e-9 for a, b in zip(inertia, inertia[1:])), inertia
    assert inertia[-1] < inertia[0]


def test_kmeans_deterministic_and_total(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    a1, i1 = kmeans_fit(emb, k=3, n_iter=2)
    a2, i2 = kmeans_fit(emb, k=3, n_iter=2)
    assert i1 == i2
    m1 = {r.vec_id: r.cluster for r in a1.collect()}
    m2 = {r.vec_id: r.cluster for r in a2.collect()}
    assert m1 == m2
    assert len(m1) == emb.count()          # every vector assigned
    assert set(m1.values()) <= set(range(3))
