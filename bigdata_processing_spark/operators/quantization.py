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
