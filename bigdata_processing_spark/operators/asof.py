"""As-of (most-recent-match) join — a time-series operator Spark lacks
natively, composed from existing DataFrame ops (union + window), per the
engine's custom-operator policy (SURVEY.md §4: composition before UDF).

Algorithm (the classic scalable shape):
  1. Tag both inputs and union them on an aligned schema.
  2. One window pass per key ordered by (ts, tag): ``last_value(...,
     ignoreNulls)`` carries the most recent right-side payload forward.
  3. Keep only left rows.

Cost: ONE shuffle (the window partitioning) — never a join product, no
per-key Python. Skew is bounded by the per-key event count, same as any
windowed query. A sort-merge as-of at 100TB shuffles both sides too;
this does strictly less work than range-join rewrites.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_payload: dict[str, str],
    *,
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row with the same
    ``on`` key: ``direction='backward'`` (default) takes the most recent
    right row with right.ts <= left.ts; ``direction='forward'`` takes
    the earliest right row with right.ts >= left.ts. ``strict=True``
    excludes the simultaneous (equal-ts) match in either direction.

    ``right_payload`` maps right column → output alias. Left columns pass
    through unchanged. Rows with no match keep nulls (left-join
    semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = [c for c in left.columns]
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[src]).alias(f"__r_{alias}")
          for src, alias in right_payload.items()],
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(src).alias(f"__r_{alias}") for src, alias in right_payload.items()],
    )
    unioned = tagged_left.unionByName(tagged_right)

    # Tie handling via sort order of the side tag: the simultaneous
    # right row lands inside the frame for inclusive mode, outside for
    # strict. Backward scans the preceding frame with last(); forward
    # scans the following frame with first().
    if direction == "backward":
        side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), side_order)
            .rowsBetween(Window.unboundedPreceding, -1 if strict else Window.currentRow)
        )
        pick = F.last
    else:
        side_order = F.col("__side").desc() if not strict else F.col("__side").asc()
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), side_order)
            .rowsBetween(1 if strict else Window.currentRow, Window.unboundedFollowing)
        )
        pick = F.first
    carried = unioned.select(
        "*",
        *[
            pick(f"__r_{alias}", ignorenulls=True).over(w).alias(alias)
            for alias in right_payload.values()
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(a) for a in right_payload.values()]
    )
