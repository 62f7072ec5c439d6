"""Iterative k-means over embedding columns — the engine's iterative-
algorithm pattern (cache the working set; per-iteration: broadcast the
tiny centroid table, one shuffle to re-aggregate).

Deterministic: initial centroids are the first k vectors by vec_id (not
random), assignment ties break on centroid id. All math is the pandas
vectorized kernel (argmin over a k×d centroid matrix per Arrow batch);
re-aggregation is an exploded groupBy — no driver-side loops over data,
only over the k centroids collected per iteration (k rows, not data).

At 100TB: the data-sized operations per iteration are one scan + one
(label, pos)-keyed aggregation; centroids (k×d doubles) always fit in a
broadcast.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_udf(centroids: list[list[float]]):
    from pyspark.sql.functions import pandas_udf

    def _assign(e):
        import numpy as np

        C = np.asarray(centroids)              # k x d
        X = np.vstack(e.values)                # n x d
        # matmul form: argmin_c (c·c − 2·x·c) == argmin_c ‖x−c‖² (the
        # x·x term is a per-row constant). O(n·k) memory per Arrow
        # batch instead of the (n, k, d) broadcast cube — the
        # subtraction form costs GBs per batch once the √n cell policy
        # pushes k into the thousands (round 12).
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    _assign.__annotations__ = {"e": pd.Series, "return": pd.Series}
    return pandas_udf(_assign, "int")


def kmeans_centroids(
    emb: DataFrame, vec_col: str = "embedding", k: int = 8, n_iter: int = 5,
    compute_inertia: bool = False,
) -> tuple[list[list[float]], list[float]]:
    """Run the Lloyd iterations and return ``(centroids, inertia_path)``.

    The per-iteration data-sized work is one assignment pass + one
    (cluster, pos)-keyed mean aggregation. ``compute_inertia`` adds an
    extra full-data job per iteration — only the convergence tests need
    it, so callers that just want the quantizer (IVF index build) skip it.
    """
    base = emb.select("vec_id", F.col(vec_col).cast("array<double>").alias("e")).persist()

    # deterministic init: first k vectors by vec_id
    centroids = [r.e for r in base.orderBy("vec_id").limit(k).collect()]
    inertia_path: list[float] = []

    for _ in range(n_iter):
        assigned = base.withColumn("cluster", _assign_udf(centroids)(F.col("e")))

        if compute_inertia:
            # inertia vs the centroids used for this assignment (JVM fold)
            from bigdata_processing_spark.sources.writers import literal_df

            cdf = literal_df(
                base.sparkSession,
                [(i, list(c)) for i, c in enumerate(centroids)],
                "cluster int, cent array<double>",
            )
            inertia = (
                assigned.join(F.broadcast(cdf), "cluster")
                .select(
                    F.aggregate(
                        F.zip_with("e", "cent", lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    ).alias("d2")
                )
                .agg(F.sum("d2").alias("i"))
                .collect()[0]
                .i
            )
            inertia_path.append(float(inertia))

        # centroid update: explode (pos, val), per-(cluster, pos) mean,
        # re-assemble arrays in position order — one shuffle over data
        stats = (
            assigned.select("cluster", F.posexplode("e").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("mean_val"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mean_val"))).alias("mv"))
            .select("cluster", F.col("mv.mean_val").alias("centroid"))
        )
        new_centroids = {r.cluster: list(r.centroid) for r in stats.collect()}
        centroids = [new_centroids.get(i, centroids[i]) for i in range(k)]

    base.unpersist()
    return centroids, inertia_path


def kmeans_fit(emb: DataFrame, vec_col: str = "embedding", k: int = 8,
               n_iter: int = 5,
               compute_inertia: bool = True) -> tuple[DataFrame, list[float]]:
    """Returns (assignments DataFrame [vec_id, cluster], inertia per
    iteration). ``emb`` must have a unique ``vec_id`` column.
    ``compute_inertia=False`` returns an empty inertia path and skips
    one full-data job PER ITERATION — callers that only want the
    assignments (cluster-size reports) shouldn't pay for a convergence
    metric they discard (guide §1.2)."""
    centroids, inertia_path = kmeans_centroids(
        emb, vec_col=vec_col, k=k, n_iter=n_iter,
        compute_inertia=compute_inertia,
    )
    final = emb.select(
        "vec_id", F.col(vec_col).cast("array<double>").alias("e")
    ).withColumn("cluster", _assign_udf(centroids)(F.col("e"))).select(
        "vec_id", "cluster"
    )
    return final, inertia_path
