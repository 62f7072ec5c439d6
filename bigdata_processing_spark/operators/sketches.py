"""Deterministic cardinality sketches.

KMV (k-minimum-values) distinct-count estimation: hash each key to a
uniform [0,1) value, keep the ``k`` smallest distinct hashes per group,
and estimate ``(k-1) / h_k`` from the k-th minimum (Bar-Yossef et al.,
"Counting distinct elements in a data stream", RANDOM 2002). Unlike
HLL (``approx_count_distinct``), whose register layout is
engine-internal, KMV is *portable*: any engine with md5 reproduces the
exact same estimate, so the sketch is cross-engine oracle-checkable —
and mergeable (union the k-min sets, re-take the k smallest), which is
what makes it a sketch and not just a sample.

Precision contract for the hash: the first 13 hex chars of md5 are a
52-bit integer, below 2^53 — every value and every partial arithmetic
result is an exactly-representable IEEE double, so Spark and DuckDB
produce bit-identical hashes regardless of evaluation order.

Scale design: one shuffle for the (group, hash) distinct, then a
two-stage k-min — per-salt top-k first (parallel over ``n_salts``
reducers per group), then top-k of the ≤ ``n_salts × k`` survivors.
No group's full distinct stream ever funnels through one task's sort,
so a hot group costs what a salted aggregation costs. State per group
is k doubles — at 100 TB the sketch output is KBs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 52  # 13 hex chars of md5: exact in an IEEE double


def hash01(col: Column) -> Column:
    """Uniform [0,1) hash of a key, bit-identical in any md5-capable
    engine. DuckDB twin:
    ``CAST('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 13) AS BIGINT)
    / 4503599627370496.0``."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast(
        "double"
    ) / F.lit(float(1 << HASH_BITS))


def kmv_distinct(
    df: DataFrame,
    key: str,
    group_cols: list[str],
    k: int = 64,
    n_salts: int = 16,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Returns one row per group with ``kmv_est`` (double): exact when the
    group has fewer than ``k`` distinct hashes, else ``(k-1)/h_k``.
    """
    hashes = df.select(
        *group_cols, hash01(F.col(key)).alias("h")
    ).distinct()
    # two-stage k-min: every global top-k hash is top-k within its salt,
    # so the salted prefilter is lossless
    salt = (F.col("h") * F.lit(float(1 << HASH_BITS))).cast("long") % n_salts
    w1 = Window.partitionBy(*group_cols, "salt").orderBy("h")
    w2 = Window.partitionBy(*group_cols).orderBy("h")
    topk = (
        hashes.withColumn("salt", salt)
        .withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= k)
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
    )
    return topk.groupBy(*group_cols).agg(
        F.count("*").alias("n_min"), F.max("h").alias("h_k")
    ).select(
        *group_cols,
        F.when(F.col("n_min") < k, F.col("n_min").cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.col("h_k"))
        .alias("kmv_est"),
    )
