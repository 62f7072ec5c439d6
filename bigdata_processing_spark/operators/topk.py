"""Exact grouped top-k without sorting the full frame.

``row_number() OVER (PARTITION BY g ORDER BY score) <= k`` plans a
WindowGroupLimit pair, but the PARTIAL stage still has to LOCALLY SORT
every input partition before it can prune — on an n×q candidate frame
that local sort IS the cost (the r11 sf100 probe measured 19.6 GB of
sort spill on pq_adc_knn's 400M-pair frame and 42 GB on matryoshka's
two legs; fixing the stacked-window double sort only halved it).

``pruned_topk`` replaces the full-frame sort with the classic
histogram prefilter:

1. bucket every row by a MONOTONE coarsening of the score
   (``floor(score * bucket_scale)`` — monotone because multiplying by
   a positive constant and flooring are both order-preserving on
   doubles, so bucket order can never disagree with score order);
2. aggregate a per-(group, bucket) histogram — a hash aggregate with
   map-side partial combine, shuffling only distinct buckets (≤
   ``2·bucket_scale`` per group), never the rows;
3. per group, walk buckets from the top and keep the minimal bucket
   prefix covering k rows (tiny frame, one window);
4. filter the original frame to ``bucket >= threshold`` (broadcast of
   one row per group) — a provable SUPERSET of the true top-k, since
   fewer than k rows score above the threshold bucket and ties share a
   bucket — then run the exact row_number window on the survivors.

The final ordering semantics are untouched (same score, same
tie-break), so results are bit-identical to the naive window; only the
sorted volume changes. Groups whose scores all collide into one bucket
(a clone corpus querying itself) degrade gracefully to the naive sort
of that group.

COST SHAPE: the input plan is evaluated twice (histogram + filter
legs). That is the right trade when ``scored`` is a cheap projection
over a scan/broadcast-join (the ADC/cosine scorers here — re-scoring
is arithmetic, sorting is I/O) or when the caller already persisted
the frame; callers with an expensive un-persisted upstream should
persist first.

NaN scores sort ABOVE everything under Spark's descending order; they
are bucketed at +infinity so the prune keeps them, preserving the
naive window's (degenerate) behavior bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _group_cols(group_col: str | Sequence[str]) -> list[str]:
    return [group_col] if isinstance(group_col, str) else list(group_col)

# one bucket = 1/BUCKET_SCALE of score space. Two forces: finer buckets
# prune tighter, but the histogram HASH MAP must stay small enough to
# never fall back to sort-based aggregation even when execution memory
# is starved (a persisted multi-GB frame parks on storage memory and
# leaves each task ~tens of MB — the 100× probe measured a scale-1000
# map, ~4M (group, bucket) keys, falling back and re-sorting the full
# 400M-row frame: 48 GB of spill, exactly what the prune exists to
# remove). At scale 32 a [-1, 1] score space is ≤ 65 buckets/group —
# the map is a few MB at any corpus size — while the kept band
# (1/32 of score space above the k-th best) is still thin for
# cosine-like score tails: the re-probe measured the same zero-spill
# prune as scale 1000 on the uncached leg.
BUCKET_SCALE = 32

_NAN_BUCKET = 1 << 40

# Below this many scored rows the naive WindowGroupLimit plan wins: its
# partial-stage local sort is small enough to stay in memory (the r11
# adjudications put the harm line in the hundreds of millions), while
# the prune pays two extra jobs (threshold broadcast per call) and a
# second evaluation of the scoring subtree. sf0.1 fixture frames are
# ~4M pairs → naive; the 100× probe frames are ~400M → pruned.
PRUNE_MIN_ROWS = 50_000_000


def grouped_topk(
    scored: DataFrame,
    k: int,
    group_col: str | Sequence[str],
    score_col: str,
    tie_col: str,
    n_rows: int,
    rn_col: str = "rn",
    bucket_scale: int = BUCKET_SCALE,
    ascending: bool = False,
) -> DataFrame:
    """Regime-switched grouped top-k: the naive rank-filtered window
    below ``PRUNE_MIN_ROWS`` scored rows, :func:`pruned_topk` above —
    identical output either way; the caller passes the (estimated)
    scored-row count it already knows. ``group_col`` may be a single
    column or a composite (e.g. a sweep's (grid_point, qid))."""
    if n_rows < PRUNE_MIN_ROWS:
        sorder = (F.col(score_col).asc() if ascending
                  else F.col(score_col).desc())
        w = Window.partitionBy(*_group_cols(group_col)).orderBy(
            sorder, F.col(tie_col).asc()
        )
        return (
            scored.withColumn(rn_col, F.row_number().over(w))
            .filter(F.col(rn_col) <= k)
        )
    return pruned_topk(scored, k, group_col, score_col, tie_col,
                       rn_col=rn_col, bucket_scale=bucket_scale,
                       ascending=ascending)


def _bucket(score_col: str, bucket_scale: int) -> Column:
    s = F.col(score_col)
    return (
        F.when(F.isnan(s), F.lit(_NAN_BUCKET))
        .otherwise(F.floor(s * bucket_scale))
        .cast("long")
    )


def pruned_topk(
    scored: DataFrame,
    k: int,
    group_col: str | Sequence[str],
    score_col: str,
    tie_col: str,
    rn_col: str = "rn",
    bucket_scale: int = BUCKET_SCALE,
    ascending: bool = False,
) -> DataFrame:
    """Per-``group_col`` top-``k`` rows of ``scored`` by
    (``score_col`` DESC — or ASC with ``ascending=True`` for
    distance-like scores — then ``tie_col`` ASC), with the 1-based rank
    appended as ``rn_col`` (int) — bit-identical to
    ``row_number().over(...)`` + ``filter(rn <= k)``, but the full
    frame is histogram-pruned instead of locally sorted.

    ``bucket_scale``: buckets per score UNIT — match it to the score's
    granularity so buckets-per-group stays in the tens-to-hundreds
    (cosines in [-1, 1] → the default; small-integer distances like
    Hamming → 1)."""
    groups = _group_cols(group_col)
    b = _bucket(score_col, bucket_scale)
    hist = scored.groupBy(*groups, b.alias("__b")).agg(
        F.count("*").alias("__n")
    )
    border = F.col("__b").asc() if ascending else F.col("__b").desc()
    wq = Window.partitionBy(*groups).orderBy(border)
    agg_thr = F.max("__b") if ascending else F.min("__b")
    thr = (
        hist.withColumn("__better", F.sum("__n").over(wq) - F.col("__n"))
        .filter(F.col("__better") < k)
        .groupBy(*groups)
        .agg(agg_thr.alias("__blim"))
    )
    keep = b <= F.col("__blim") if ascending else b >= F.col("__blim")
    pruned = scored.join(F.broadcast(thr), groups).filter(keep).drop(
        "__blim"
    )
    sorder = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    w = Window.partitionBy(*groups).orderBy(sorder, F.col(tie_col).asc())
    # the rank filter sits DIRECTLY above the window (no cast in
    # between) so the survivors' window still plans WindowGroupLimit
    return (
        pruned.withColumn(rn_col, F.row_number().over(w))
        .filter(F.col(rn_col) <= k)
    )
