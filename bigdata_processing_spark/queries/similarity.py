"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

North-star LLM-pipeline surface (SURVEY.md §2.12). Two tiers:

- ``knn_bruteforce``: exact cosine top-k for a bounded query set. The
  query side is broadcast; the candidate table streams once — the right
  brute-force shape at scale (never a full n×n product).
- ``knn_ivf_label``: IVF-style search — candidates pruned to the query's
  coarse partition (the ``label`` column stands in for a cluster
  assignment). This is the 100TB path: partition the index by cell,
  probe only matching cells.

All vector math is JVM-side fold expressions (functions/vectors.py);
elements are cast to double pre-arithmetic so DuckDB oracles agree
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.functions import vectors as V
from bigdata_processing_spark.queries import register

_COS = """list_dot_product(qe, ce)
                   / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce)))"""


def _with_norm(emb: DataFrame, id_alias: str, e_alias: str, n_alias: str,
               extra: dict[str, str] | None = None) -> DataFrame:
    """Project (id, embedding-as-double, precomputed norm [, extras]) —
    norms are computed once per vector, never per pair."""
    cols = [
        F.col("vec_id").alias(id_alias),
        F.col("embedding").cast("array<double>").alias(e_alias),
        V.norm(F.col("embedding")).alias(n_alias),
    ]
    for src, alias in (extra or {}).items():
        cols.append(F.col(src).alias(alias))
    return emb.select(*cols)


@register(
    "knn_bruteforce",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
            FROM embeddings WHERE vec_id % 100 = 0
        ),
        c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
        s AS (
            SELECT qid, cid, {_COS} AS cos_sim
            FROM q JOIN c ON cid <> qid
        )
        SELECT qid, cid, cos_sim, rn FROM (
            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid ASC) AS rn
            FROM s
        )
        WHERE rn <= 5
        ORDER BY qid, rn
    """,
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = _with_norm(emb.filter(F.col("vec_id") % 100 == 0), "qid", "qe", "qn")
    c = _with_norm(emb, "cid", "ce", "cn")
    joined = c.join(F.broadcast(q), F.col("cid") != F.col("qid"))
    cos = V.dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid").asc())
    return (
        joined.select("qid", "cid", cos.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .orderBy("qid", "rn")
    )


@register(
    "knn_ivf_label",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS qid, label AS qlabel, embedding::DOUBLE[] AS qe
            FROM embeddings WHERE vec_id % 100 = 0
        ),
        c AS (SELECT vec_id AS cid, label AS clabel, embedding::DOUBLE[] AS ce FROM embeddings),
        s AS (
            SELECT qid, cid, {_COS} AS cos_sim
            FROM q JOIN c ON clabel = qlabel AND cid <> qid
        )
        SELECT qid, cid, cos_sim, rn FROM (
            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid ASC) AS rn
            FROM s
        )
        WHERE rn <= 5
        ORDER BY qid, rn
    """,
)
def knn_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = _with_norm(
        emb.filter(F.col("vec_id") % 100 == 0), "qid", "qe", "qn", {"label": "qlabel"}
    )
    c = _with_norm(emb, "cid", "ce", "cn", {"label": "clabel"})
    joined = c.join(
        F.broadcast(q), (F.col("clabel") == F.col("qlabel")) & (F.col("cid") != F.col("qid"))
    )
    cos = V.dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid").asc())
    return (
        joined.select("qid", "cid", cos.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .orderBy("qid", "rn")
    )


@register(
    "quantized_knn_sample",
    oracle="""
        WITH q8 AS (
            SELECT vec_id,
                   list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS scale,
                   list_transform(embedding::DOUBLE[],
                       x -> floor(x / (list_max(list_transform(embedding::DOUBLE[], y -> abs(y))) / 127.0)
                                  + 0.5)::INT) AS qvec
            FROM embeddings
        ),
        qs AS (SELECT vec_id AS qid, scale AS qscale, qvec AS qq FROM q8 WHERE vec_id % 100 = 0),
        s AS (
            SELECT qid, c.vec_id AS cid,
                   list_dot_product(qq::DOUBLE[], c.qvec::DOUBLE[]) * qscale * c.scale AS qdot
            FROM qs JOIN q8 c ON c.vec_id <> qid
        )
        SELECT qid, cid, round(qdot, 9) AS qdot, rn FROM (
            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, cid ASC) AS rn
            FROM s
        )
        WHERE rn <= 5
        ORDER BY qid, rn
    """,
)
def quantized_knn_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN over int8-quantized embeddings (operators/quantization.py):
    the 4x-memory-reduction index path; integer dot + rescale."""
    from bigdata_processing_spark.operators.quantization import quantize, quantized_dot

    emb = quantize(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("qvec").alias("qq"),
        F.col("scale").alias("qscale"),
    )
    c = emb.select("vec_id", "qvec", "scale")
    joined = c.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    qdot = quantized_dot(F.col("qq"), F.col("qscale"), F.col("qvec"), F.col("scale"))
    w = Window.partitionBy("qid").orderBy(F.col("qdot").desc(), F.col("cid").asc())
    return (
        joined.select("qid", F.col("vec_id").alias("cid"), F.round(qdot, 9).alias("qdot"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .orderBy("qid", "rn")
    )


@register("knn_ivf_kmeans")  # no oracle: coarse quantizer is iterative
# k-means (not SQL-expressible); quality gate is recall@5 vs exact brute
# force in tests/test_ivf.py.
def knn_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN over real k-means cells (operators/ivf.py) —
    the production replacement for the fixture-label IVF above."""
    from bigdata_processing_spark.operators.ivf import build_ivf_index, ivf_search

    emb = load_table(spark, sf_dir, "embeddings")
    indexed, centroids = build_ivf_index(emb, k_cells=8, n_iter=2)
    # no persist here: this one-shot query probes the index exactly once,
    # so caching would only add memory churn (callers that reuse an index
    # across query batches persist it themselves / write_ivf_index it)
    q = indexed.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    return ivf_search(indexed, centroids, q, top_k=5, n_probe=2)


@register("kmeans_clusters")  # no oracle: iterative algorithm (driver loops
# over k centroids only; all data-sized work is distributed per iteration)
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_processing_spark.operators.clustering import kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    assignments, _ = kmeans_fit(emb, k=8, n_iter=2)
    return (
        assignments.groupBy("cluster")
        .agg(F.count("*").alias("n_vecs"))
        .orderBy("cluster")
    )


@register(
    "embedding_norm_stats",
    oracle="""
        SELECT label,
               count(*) AS n_vecs,
               avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS avg_norm,
               min(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS min_norm,
               max(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS max_norm
        FROM embeddings
        GROUP BY label
        ORDER BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition vector sanity stats (norm distribution by IVF cell)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", V.norm(F.col("embedding")).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.avg("nrm").alias("avg_norm"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
        )
        .orderBy("label")
    )
