"""Embedding quantization: symmetric per-vector int8 — the memory-scale
path for similarity search (4x smaller than float32; at 100TB the
embedding index fits 4x more vectors per executor and per broadcast).

All Column expressions (transform/aggregate folds). Rounding is the
explicit ``floor(x + 0.5)`` form so Spark and the DuckDB oracle agree
exactly (their native round() functions differ on half-way ties:
HALF_UP vs banker's)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _round_half_up(c: Column) -> Column:
    return F.floor(c + F.lit(0.5))


def quantize(emb: DataFrame, vec_col: str = "embedding",
             out_vec: str = "qvec", out_scale: str = "scale") -> DataFrame:
    """Add int8-range quantized vector + per-vector scale.

    q_i = round_half_up(v_i / scale), scale = max|v| / 127 — symmetric
    quantization; dequantized value is q_i * scale. The scale is floored
    at a tiny epsilon so an all-zero vector quantizes to a zero qvec
    (dot products 0) instead of 0/0 → NaN → null qvec, which would
    silently drop the vector from every downstream candidate set.
    """
    v = F.col(vec_col).cast("array<double>")
    scale = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0),
        F.lit(1e-30),
    )
    return emb.withColumn(out_scale, scale).withColumn(
        out_vec,
        F.transform(v, lambda x: _round_half_up(x / F.col(out_scale)).cast("int")),
    )


def quantized_dot(qa: Column, sa: Column, qb: Column, sb: Column) -> Column:
    """Approximate dot product from quantized vectors: integer-fold dot
    (exact integer arithmetic, engine-portable) rescaled by both
    scales."""
    int_dot = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: (x * y).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return int_dot.cast("double") * sa * sb


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. TPAMI'11): per-subspace codebooks.
# The SEEDED codebook variant lives in queries/similarity.pq_adc_knn
# (bit-exact, DuckDB-oracle-checked); this is the PRODUCTION fit — the
# same split-encode-ADC machinery with per-subspace k-means-refined
# codebooks (mirrors the knn_ivf_seeded / knn_ivf_kmeans split).
# ---------------------------------------------------------------------------
def pq_fit(
    emb: DataFrame,
    vec_col: str = "e",
    n_subspaces: int = 8,
    k: int = 16,
    n_iter: int = 3,
) -> list[list[list[float]]]:
    """Fit per-subspace codebooks: ``codebooks[m][cell]`` is an
    (dim / n_subspaces)-dim centroid from k-means over that slice of
    every vector. n_subspaces independent small k-means fits — each a
    distributed Lloyd loop over an 8-dim projection (cheap; at 100 TB
    fit on a hash-sample like build_ivf_index)."""
    from bigdata_processing_spark.operators.clustering import kmeans_centroids

    dim = len(emb.select(vec_col).first()[0])
    sub = dim // n_subspaces
    books = []
    for m in range(n_subspaces):
        # kmeans_centroids expects a vec_id column alongside the vectors
        sl = emb.select("vec_id", F.slice(vec_col, sub * m + 1, sub).alias("se"))
        cents, _ = kmeans_centroids(
            sl, vec_col="se", k=k, n_iter=n_iter, compute_inertia=False
        )
        books.append(cents)
    return books


def _dlit(x: float) -> str:
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def _arr_sql(vv: list[float]) -> str:
    return "array(" + ",".join(_dlit(x) for x in vv) + ")"


def pq_encode(emb: DataFrame, codebooks: list[list[list[float]]],
              vec_col: str = "e") -> DataFrame:
    """Append code columns k0..k{M-1}: per-subspace argmin over the
    codebook (pure fold expressions — one projection, no shuffle).

    Expressions are generated as SQL TEXT parsed once (M strings of a
    few KB) rather than per-element Column calls — the Column form costs
    O(M·K·dim) py4j round-trips to BUILD (~6 s at 8×16×8, dominating the
    query) while parsing the identical tree takes milliseconds; same
    trade as operators/ivf._scores_sql, same bit-exact result."""
    from bigdata_processing_spark.operators.ivf import _scores_sql

    sub = len(codebooks[0][0])
    out = emb
    for m, book in enumerate(codebooks):
        sl = f"slice(`{vec_col}`, {sub * m + 1}, {sub})"
        out = out.withColumn(
            f"k{m}", F.expr(f"array_min({_scores_sql(book, sl)}).cell")
        )
    return out


def pq_adc_sql(codebooks: list[list[list[float]]], qe_col: str = "qe",
               qn_col: str = "qn", nrm_col: str = "nrm",
               centroid_dot_col: str | None = None) -> str:
    """SQL text of the ADC cosine over rows carrying (qe, qn, k0..k{M-1},
    nrm): per-subspace query·centroid dots summed in fixed subspace
    order, divided by the true norms, rounded to 6 decimals so rank
    order is ulp-stable. ``centroid_dot_col`` (residual IVFADC) adds the
    precomputed dot(q, coarse centroid) term first."""
    sub = len(codebooks[0][0])
    terms = [f"`{centroid_dot_col}`"] if centroid_dot_col else []
    for m, book in enumerate(codebooks):
        cbm = "array(" + ",".join(_arr_sql(c) for c in book) + ")"
        qs = f"slice(`{qe_col}`, {sub * m + 1}, {sub})"
        terms.append(
            f"aggregate(zip_with({qs}, element_at({cbm}, `k{m}` + 1), "
            f"(x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    total = " + ".join(terms)
    return f"round(({total}) / (`{qn_col}` * `{nrm_col}`), 6)"


def pq_adc_expr(codebooks: list[list[list[float]]],
                centroid_dot: Column | None = None,
                centroid_dot_col: str | None = None) -> Column:
    """Column form of :func:`pq_adc_sql`. Pass the residual centroid
    term by COLUMN NAME (``centroid_dot_col``) so the whole expression
    stays one parsed string; ``centroid_dot`` is accepted for
    compatibility and implies the column is named ``qc``."""
    if centroid_dot is not None and centroid_dot_col is None:
        centroid_dot_col = "qc"
    return F.expr(pq_adc_sql(codebooks, centroid_dot_col=centroid_dot_col))


def pq_lut_expr(codebooks: list[list[list[float]]],
                qe_col: str = "qe") -> Column:
    """Per-query ADC lookup table — the distance-table half of Jégou's
    ADC: ``lut[m][cell] = dot(q's m-th subvector, codebooks[m][cell])``,
    an ``array<array<double>>`` of M·K doubles (8×16 = 128 here) built
    ONCE per query row on the tiny broadcast side. Each candidate pair
    then scores as M array lookups (:func:`pq_adc_lut_sql`) instead of
    M sub-dim zip_with folds — O(M) vs O(dim) multiply-adds per pair,
    the factoring that makes ADC cheaper than the float dot it
    approximates. Every entry is the IDENTICAL ``zip_with``/``aggregate``
    fold :func:`pq_adc_sql` inlines per pair (same slice, same centroid
    literal, same fold order), so the summed scores are bit-identical —
    pure factoring, the oracle untouched."""
    sub = len(codebooks[0][0])
    entries = []
    for m, book in enumerate(codebooks):
        cbm = "array(" + ",".join(_arr_sql(c) for c in book) + ")"
        qs = f"slice(`{qe_col}`, {sub * m + 1}, {sub})"
        entries.append(
            f"transform({cbm}, c -> aggregate(zip_with({qs}, c, "
            f"(x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
        )
    return F.expr("array(" + ",".join(entries) + ")")


def pq_adc_lut_sql(n_subspaces: int, qn_col: str = "qn",
                   nrm_col: str = "nrm", lut_col: str = "_adc_lut",
                   centroid_dot_col: str | None = None) -> str:
    """SQL text of the ADC cosine over rows carrying the per-query LUT
    (:func:`pq_lut_expr`) and codes k0..k{M-1}: M array lookups summed
    in the same fixed subspace order as :func:`pq_adc_sql`, same
    norm division, same 6-decimal rounding."""
    terms = [f"`{centroid_dot_col}`"] if centroid_dot_col else []
    terms += [
        f"element_at(element_at(`{lut_col}`, {m + 1}), `k{m}` + 1)"
        for m in range(n_subspaces)
    ]
    total = " + ".join(terms)
    return f"round(({total}) / (`{qn_col}` * `{nrm_col}`), 6)"


def pq_adc_search(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    top_k: int = 5,
) -> DataFrame:
    """ADC top-k: float queries (qid, qe, qn) against PQ codes + true
    norm (``nrm``). Output (qid, cid, adc_cos, rn) — comparable to
    ivf_search/knn_bruteforce for recall measurement. Top-k goes
    through the histogram prune (operators/topk.pruned_topk) instead of
    a full-frame window sort — bit-identical ranks, no n×q local sort."""
    from bigdata_processing_spark.operators.topk import pruned_topk

    q = queries.withColumn("_adc_lut", pq_lut_expr(codebooks))
    joined = encoded.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    scored = joined.select(
        "qid",
        F.col("vec_id").alias("cid"),
        F.expr(pq_adc_lut_sql(len(codebooks))).alias("adc_cos"),
    )
    return pruned_topk(scored, top_k, "qid", "adc_cos", "cid").orderBy(
        "qid", "rn"
    )
