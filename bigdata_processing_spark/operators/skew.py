"""Skew-aware aggregation: two-stage salted groupBy.

At 100TB, power-law keys (the reference's contract addresses — top
contract received 8.4e25 wei, SURVEY.md §4) melt single reducers. AQE
splits skewed JOIN partitions but a skewed AGGREGATION key still lands
on one reducer for the final combine; salting splits the partial
aggregation across ``n_salts`` reducers first, then combines the (now
tiny) per-salt partials.

Works for any algebraic aggregate (sum/count/min/max; avg via
sum+count). Results are bit-identical for integer/count aggregates and
within float reassociation error for doubles — same tolerance class as
Spark's own partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output alias → (function, column) where function ∈
    {sum, count, min, max}. Example::

        salted_agg(li, ["l_suppkey"], {"total_qty": ("sum", "l_quantity")})
    """
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    # stage-2 combiner for each stage-1 partial
    second = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[first[fn](col).alias(f"__p_{alias}") for alias, (fn, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[second[fn](f"__p_{alias}").alias(alias) for alias, (fn, col) in aggs.items()]
    )


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16) -> DataFrame:
    """Skew-safe equi-join: salt the big side's key, replicate the small
    side across all salts, join on (key, salt).

    A hot key's rows scatter over ``n_salts`` reducers instead of one;
    the price is a ``n_salts``× replication of the SMALL side only.
    Prefer AQE's skew-join split (on by default here) when the join is
    sort-merge; explicit salting is for the cases AQE can't rescue —
    a shuffled-hash join forced by hints, or a skewed key feeding a
    downstream bucketed write where AQE's split would break
    co-partitioning. Output columns = big ∪ small-minus-key, like a
    plain ``big.join(small, key)``."""
    salts = big.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("__salt")
    )
    big_s = big.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    small_s = small.crossJoin(F.broadcast(salts))
    return big_s.join(small_s, [key, "__salt"]).drop("__salt")


def rep_star_pairs(members: DataFrame, max_bucket: int) -> DataFrame:
    """Member×representative star pairs for OVER-CAP LSH buckets — the
    bounded alternative to both skipping the bucket (silent zero recall
    on large non-identical near-dup families) and expanding it
    quadratically (a B-doc bucket is B² pairs).

    ``members`` must carry ``(bk, ds array<id>)`` rows (one per bucket,
    ``ds`` the sorted member ids). Buckets with ``size(ds) >
    max_bucket`` keep ``least(ceil(B/max_bucket), MAX_BUCKET_REPS)``
    representatives — the first members in ``md5(doc_id)`` order,
    deterministic and ingestion-order-free — and every member pairs
    against the representatives only. The rep CAP makes per-bucket work
    LINEAR (≤ 64·B pairs): uncapped ceil(B/25) is quadratic, and a hot
    16-bit simhash band value holding 1e5 docs of the 100× corpus
    OOM'd an 8 GB JVM before the cap (round-7 measurement). The star
    shape still lets connected components recover the whole family as
    one cluster. A SQL twin reproduces the selection with
    ``row_number() OVER (PARTITION BY bk ORDER BY
    md5(CAST(doc_id AS VARCHAR)), doc_id)`` + the same least().

    Memory shape: the representatives EXPLODE FIRST (one row per
    (bucket, rep)), and each rep row then expands against the member
    array — peak per-row materialization is O(B), never O(reps·B) (the
    single-array form built every star pair of a bucket inside one row
    before exploding: tens of GB for the hot bucket above). No shuffle
    beyond the groupBy that built ``members``."""
    from bigdata_processing_spark.thresholds import MAX_BUCKET_REPS

    ds_hash_ordered = F.transform(
        F.array_sort(
            F.transform(
                "ds",
                lambda d: F.struct(
                    F.md5(d.cast("string")).alias("h"), d.alias("d")
                ),
            )
        ),
        lambda s: s.getField("d"),
    )
    n_reps = F.least(
        F.ceil(F.size("ds").cast("double") / F.lit(float(max_bucket))).cast("int"),
        F.lit(MAX_BUCKET_REPS),
    )
    reps = (
        members.filter(F.size("ds") > max_bucket)
        .select(
            "ds",
            F.explode(F.slice(ds_hash_ordered, F.lit(1), n_reps)).alias("r"),
        )
    )
    pair = F.transform(
        "ds",
        lambda m: F.struct(
            F.least(F.col("r"), m).alias("d1"),
            F.greatest(F.col("r"), m).alias("d2"),
        ),
    )
    return (
        reps.select(F.explode(pair).alias("p"))
        .select(F.col("p.d1").alias("d1"), F.col("p.d2").alias("d2"))
        .filter(F.col("d1") != F.col("d2"))
    )
