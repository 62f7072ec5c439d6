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
