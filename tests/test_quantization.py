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


def test_zero_vector_quantizes_to_zero_not_null(spark):
    """All-zero embedding: scale floors at epsilon so qvec is all zeros
    (dot = 0) rather than 0/0 -> NaN -> null, which would silently drop
    the vector from candidate sets."""
    from pyspark.sql import functions as F

    from bigdata_processing_spark.operators.quantization import quantized_dot

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    q = quantize(df)
    rows = {r.vec_id: r for r in q.collect()}
    assert rows[1].qvec == [0, 0, 0]
    assert rows[1].scale > 0
    assert rows[2].qvec == [64, -127, 32]

    a = q.filter(F.col("vec_id") == 1).select(
        F.col("qvec").alias("qa"), F.col("scale").alias("sa")
    )
    b = q.filter(F.col("vec_id") == 2).select(
        F.col("qvec").alias("qb"), F.col("scale").alias("sb")
    )
    dot = (
        a.crossJoin(b)
        .select(quantized_dot(F.col("qa"), F.col("sa"), F.col("qb"), F.col("sb")).alias("d"))
        .collect()[0].d
    )
    assert dot == 0.0
