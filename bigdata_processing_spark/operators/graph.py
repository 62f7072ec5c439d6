"""Distributed connected components: alternating large-star / small-star
rounds as pure DataFrame joins (no GraphFrames dependency).

The algorithm is the MapReduce CC of Kiveris et al., "Connected
Components in MapReduce and Beyond" (SoCC'14): each round rewires every
node's neighborhood toward the neighborhood minimum —

- **large-star**: for each node ``u`` with (symmetric) neighbors N(u),
  connect every STRICTLY LARGER neighbor to ``m = min(N(u) ∪ {u})``;
- **small-star**: orient each edge (hi, lo); for each ``hi``, connect
  every smaller neighbor AND ``hi`` itself to ``m = min(N_lo(hi))``

— until the edge set stops changing, at which point the edges form a
star forest: every node points at the minimum node of its component.

Why this shape for 100 TB: min-label propagation (the round-1..3
implementation in queries/dedup._cluster_labels) converges in
O(component diameter) driver-coordinated rounds — a 50-hop chain of
near-dups costs 50 scheduler round-trips. Large-star/small-star
contracts paths aggressively and converges in O(log² n) rounds
(2-3 in practice on near-clique dup graphs, ~log n on a pure chain),
so driver coordination stops being the scaling axis; each round is
two groupBy-min + join stages whose shuffle volume SHRINKS as the
graph contracts toward stars. The convergence check is one tiny agg
(count + order-independent xor of edge hashes) per round, not an edge diff.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

_MAX_ROUNDS = 50  # safety bound ≫ log²(any real graph)


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as distinct (lo, hi) pairs, self-loops dropped."""
    return _reorient(edges).distinct()


def _reorient(edges: DataFrame) -> DataFrame:
    """(src, dst) → (lo, hi) orientation WITHOUT dedup — groupBy/min
    downstream is duplicate-insensitive, so the mid-round distinct would
    be a pure extra shuffle."""
    return edges.select(
        F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
    ).filter(F.col("lo") != F.col("hi"))


def _large_star(canon: DataFrame) -> DataFrame:
    """One large-star round over a canonical (lo, hi) edge set."""
    sym = canon.select(F.col("lo").alias("u"), F.col("hi").alias("v")).union(
        canon.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
    )
    # m(u) = min over the closed neighborhood (least of u and min neighbor)
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(canon: DataFrame) -> DataFrame:
    """One small-star round: every hi endpoint and its smaller neighbors
    all attach to the neighborhood minimum."""
    m = canon.groupBy("hi").agg(F.min("lo").alias("m"))
    with_m = canon.join(m, "hi")
    return with_m.select(F.col("lo").alias("src"), F.col("m").alias("dst")).union(
        m.select(F.col("hi").alias("src"), F.col("m").alias("dst"))
    )


# Below this many (deduplicated) edges the graph is metadata, not data:
# 100k (lo, hi) longs ≈ 1.6 MB on the driver, while the star-contraction
# machinery pays several multi-stage jobs PER ROUND — measured 8.2s for
# a 315-node graph vs ~0.1s of driver union-find. The threshold is a
# CONSTANT (bounded driver memory by construction, never data-dependent):
# at corpus scale the dup graph exceeds it and the distributed path runs
# exactly as before.
SMALL_GRAPH_EDGES = 100_000


def _driver_union_find(rows) -> dict[int, int]:
    """Path-compressed union-find over collected (lo, hi) rows; labels
    every incident node with its component's MIN id — the identical
    contract the star-contraction fixpoint produces."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = _MAX_ROUNDS,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> tuple[DataFrame, int]:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id of its connected component.

    Returns ``(labels, n_rounds)`` where ``labels`` has columns
    ``(node, component)`` covering every node incident to an edge, and
    ``n_rounds`` is the number of large+small-star rounds run before the
    edge set reached fixpoint (logged — the observable that shows
    wall-time tracking graph structure, not driver round-trips).
    ``n_rounds`` is 0 when the input was already a star forest OR when
    the small-graph path ran.

    Two regimes, same labels either way:

    - ``n_edges ≤ small_graph_edges`` (constant, ≈1.6 MB of longs):
      the canonical edge set is COLLECTED and labeled by driver
      union-find — below this size the graph is metadata, and one
      driver pass beats several multi-stage Spark jobs per contraction
      round (measured 8.2s → 0.1s on a 315-node graph). The bound is a
      constant, so driver memory is capped by construction; pass 0 to
      force the distributed path (tests do).
    - above it: alternating large-star/small-star contraction. Only the
      fixpoint test runs on the driver (ONE aggregate job per round);
      all rewiring is joins/groupBys. Each round's canonical edge set is
      persisted and the superseded round unpersisted, so executor
      storage holds exactly one generation.
    """
    canon = _canonical(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ).persist()

    n_edges = canon.count()  # materializes the cache; both paths need it
    if n_edges <= small_graph_edges:
        labels_map = _driver_union_find(canon.collect())
        spark = edges.sparkSession
        node_t = dict(canon.dtypes)["lo"]
        items = list(labels_map.items())
        if len(items) <= 20_000:
            # JVM-side VALUES frame: materializing a Python-RDD-backed
            # createDataFrame into the cache pays a Python-worker
            # round-trip (~seconds of pure latency for metadata-sized
            # maps — sources/writers.literal_df rationale); bounded at
            # 20k rows to keep the parsed SQL text small
            from bigdata_processing_spark.sources.writers import literal_df

            out = literal_df(
                spark, items, f"node {node_t}, component {node_t}"
            ).persist()
        else:
            out = spark.createDataFrame(
                items, f"node {node_t}, component {node_t}"
            ).persist()
        out.count()
        canon.unpersist()
        log.info(
            "connected_components: driver union-find path (%d edges)", n_edges
        )
        return out, 0

    def _is_star_forest(df) -> bool:
        # Fixpoint ⇔ the edges form disjoint stars rooted at their lo:
        # (a) no node has two parents (duplicate hi), and (b) no parent
        # is itself a child (a lo appearing as a hi = a 2-hop chain).
        # Exact — unlike a same-as-last-round signature compare, this
        # detects convergence ON the converged round, saving the whole
        # confirmation round the signature approach needs.
        # ONE driver job: per-node (times-as-hi, times-as-lo) counts,
        # rolled into two global violation indicators — (a) is
        # max(times-as-hi) > 1, (b) is any node with both roles. One
        # groupBy shuffle (map-side combined, node-count-bounded) per
        # probe instead of the former two jobs (dup-hi agg + self-join).
        stats = (
            df.select(
                F.col("hi").alias("n"),
                F.lit(1).alias("as_hi"),
                F.lit(0).alias("as_lo"),
            )
            .union(df.select("lo", F.lit(0), F.lit(1)))
            .groupBy("n")
            .agg(F.sum("as_hi").alias("h"), F.sum("as_lo").alias("l"))
            .agg(
                F.max("h").alias("max_hi"),
                F.max(
                    F.when((F.col("h") > 0) & (F.col("l") > 0), 1).otherwise(0)
                ).alias("mixed"),
            )
            .collect()[0]
        )
        if stats.max_hi is None:  # empty edge set: trivially a star forest
            return True
        return stats.max_hi <= 1 and stats.mixed == 0

    rounds = 0
    if _is_star_forest(canon):
        log.info("connected_components: input already a star forest")
    else:
        for rounds in range(1, max_rounds + 1):
            # localCheckpoint (eager), not persist: each round references
            # the previous edge set ~4×, so lineage grows exponentially
            # and the plan alone OOMs the driver by round ~6;
            # checkpointing truncates the plan to the materialized
            # partitions. On a multi-executor cluster prefer reliable
            # checkpoint() (HDFS) — localCheckpoint trades executor-loss
            # tolerance for speed.
            nxt = _canonical(
                _small_star(_reorient(_large_star(canon)))
            ).localCheckpoint()
            canon.unpersist()
            canon = nxt
            if _is_star_forest(canon):
                break
    log.info("connected_components: fixpoint after %d rounds", rounds)

    # at fixpoint the canonical edges ARE the star forest (hi → lo=root);
    # roots label themselves
    labels = canon.select(
        F.col("hi").alias("node"), F.col("lo").alias("component")
    ).union(
        canon.select("lo", "lo").distinct()
    )
    out = labels.distinct()
    # hand the caller an unpersist-safe frame: materialization is the
    # caller's choice; drop our round cache once labels are derived
    out = out.persist()
    out.count()
    canon.unpersist()
    return out, rounds
