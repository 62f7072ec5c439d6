"""int8 embedding quantization: reconstruction error bounds and kNN
recall vs the exact float path."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_ORACLE

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.operators.quantization import quantize


def test_quantization_bounds(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings").limit(100)
    q = quantize(emb)
    rows = q.select("embedding", "qvec", "scale").collect()
    for r in rows:
        assert all(-127 <= v <= 127 for v in r.qvec)
        # reconstruction error per element is at most scale/2
        for orig, qv in zip(r.embedding, r.qvec):
            assert abs(qv * r.scale - orig) <= r.scale / 2 + 1e-12


def test_quantized_knn_recall(spark):
    """Top-5 neighbors from the int8 path must substantially agree with
    the exact float path (int8 on 64-dim unit vectors loses little)."""
    from bigdata_processing_spark.queries.similarity import (
        knn_bruteforce,
        quantized_knn_sample,
    )

    exact = {}
    for r in knn_bruteforce(spark, SF_ORACLE).collect():
        exact.setdefault(r.qid, set()).add(r.cid)
    quant = {}
    for r in quantized_knn_sample(spark, SF_ORACLE).collect():
        quant.setdefault(r.qid, set()).add(r.cid)
    assert exact.keys() == quant.keys()
    recalls = [len(exact[q] & quant[q]) / 5 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.6, recalls
