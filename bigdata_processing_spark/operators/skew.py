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


def rep_star_pairs(
    band: DataFrame,
    max_bucket: int,
    id_col: str = "doc_id",
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Member×representative star pairs for OVER-CAP LSH buckets — the
    bounded alternative to both skipping the bucket (silent zero recall
    on large non-identical near-dup families) and expanding it
    quadratically (a B-doc bucket is B² pairs).

    ``band`` is the FLAT membership table — one ``(bk, id_col)`` row per
    (bucket, member), no duplicates (the shape postings stores and band
    explodes already have). Buckets with more than ``max_bucket``
    members keep ``least(ceil(B/max_bucket), MAX_BUCKET_REPS)``
    representatives — the first members in ``md5(id)`` order,
    deterministic and ingestion-order-free — and every member pairs
    against the representatives only. The rep CAP makes per-bucket work
    LINEAR (≤ 64·B pairs): uncapped ceil(B/25) is quadratic, and a hot
    16-bit simhash band value holding 1e5 docs of the 100× corpus
    OOM'd an 8 GB JVM before the cap (round-7 measurement). The star
    shape still lets connected components recover the whole family as
    one cluster. A SQL twin reproduces the selection with
    ``row_number() OVER (PARTITION BY bk ORDER BY
    md5(CAST(doc_id AS VARCHAR)), doc_id)`` + the same least().

    Memory shape (round 8 — the array-free form): representatives are
    RANK-SELECTED with exactly that window (row_number over md5 order
    within ``bk``, keep ≤ n_reps) and joined back against the flat band
    table on ``bk`` — per-row memory is O(1) at every stage. The
    previous form carried a ``collect_list``-built member ARRAY through
    the groupBy and every rep row: survivable after the round-7 cap
    (≈1.6 MB rows at B≈1e5), but a 1e7-member boilerplate band value —
    plausible at real 100-TB scale — meant ~160 MB single rows. Nothing
    here materializes a bucket in one row anymore; cost is two shuffles
    of the over-cap SUBSET (size agg reuse + window) instead of one
    corpus-wide array groupBy."""
    from pyspark.sql import Window

    from bigdata_processing_spark.thresholds import MAX_BUCKET_REPS

    mid = F.col(id_col)
    if sizes is not None:
        # caller already aggregated bucket sizes (first column bk, second
        # the member count) — reuse instead of re-counting the band table
        c = sizes.columns
        bsz = sizes.select(F.col(c[0]).alias("bk"), F.col(c[1]).alias("__B"))
    else:
        bsz = band.groupBy("bk").agg(F.count("*").alias("__B"))
    over = bsz.filter(F.col("__B") > max_bucket)
    bover = band.join(over, "bk")
    n_reps = F.least(
        F.ceil(F.col("__B").cast("double") / F.lit(float(max_bucket))).cast("int"),
        F.lit(MAX_BUCKET_REPS),
    )
    w = Window.partitionBy("bk").orderBy(F.md5(mid.cast("string")), mid)
    reps = (
        bover.withColumn("__rn", F.row_number().over(w))
        # the LITERAL rank bound comes first: row_number ≤ constant is
        # what Spark's WindowGroupLimit pushdown recognizes, turning the
        # per-bucket FULL sort into a bounded top-64 heap below the
        # exchange (a hot-band full sort was the round-8 first cut's
        # memory regression at the 100× simhash corpus); the
        # data-dependent ceil(B/max_bucket) bound then exact-filters
        .filter(F.col("__rn") <= F.lit(MAX_BUCKET_REPS))
        .filter(F.col("__rn") <= n_reps)
        .select("bk", mid.alias("__r"))
    )
    mem = bover.select("bk", mid.alias("__m"))
    return (
        reps.join(mem, "bk")
        .filter(F.col("__r") != F.col("__m"))
        .select(
            F.least("__r", "__m").alias("d1"),
            F.greatest("__r", "__m").alias("d2"),
        )
    )
