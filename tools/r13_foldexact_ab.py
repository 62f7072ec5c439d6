#!/usr/bin/env python
"""Round-13 A/B probe: can the interpreted ``aggregate(zip_with(...))``
fold be replaced by an Arrow-batched numpy kernel that REPLAYS the fold's
sequential per-dim order (loop over dims, vectorize over rows) —
bit-identical doubles at vectorized speed?

Probes (each compares outputs BIT-FOR-BIT and times both forms):
  --assign   seeded_assign_cells (fold) vs foldexact assigner on the
             fixture embeddings x the trained centroid set
  --dot      the brute-force pair frame's V.dot scoring vs
             dot_foldexact vs dot_vectorized

Round-13 verdict from these probes: at fixture scale (2k vectors) the
Arrow boundary DOMINATES (foldexact assigner 0.73 s warm vs 0.46 s for
the interpreted fold), so the foldexact swap was NOT adopted for
distributed assignment — instead the whole exact fit moved to the
driver (operators/ivf._exact_fit_on_driver), which uses the same
replay-the-fold numpy kernel proven bit-identical here.

Working tool for the optimization round; feeds nothing into bench
artifacts.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402

from bigdata_processing_spark.catalog import load_table, table_rows  # noqa: E402
from bigdata_processing_spark.functions import vectors as V  # noqa: E402
from bigdata_processing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def dot_foldexact(a, b):
    """Arrow-batched dot replaying dot()'s sequential fold order."""

    def _pdot(x: pd.Series, y: pd.Series) -> pd.Series:
        X = np.vstack(x.values)
        Y = np.vstack(y.values)
        acc = np.zeros(len(X))
        for i in range(X.shape[1]):
            acc = acc + X[:, i] * Y[:, i]
        return pd.Series(acc)

    return pandas_udf(_pdot, "double")(V.as_double(a), V.as_double(b))


def assign_foldexact(cents):
    """Arrow-batched argmin assigner replaying seeded_assign_cells'
    fold order and (s, cell) tie-break."""
    C = np.asarray(cents, dtype=np.float64)  # k x d
    cc = np.empty(len(C))
    for j, c in enumerate(C):
        acc = 0.0
        for x in c:
            acc = acc + x * x
        cc[j] = acc

    def _assign(v: pd.Series) -> pd.Series:
        arr = v.to_numpy()
        nulls = np.fromiter((x is None for x in arr), dtype=bool, count=len(arr))
        out = np.zeros(len(arr), dtype=np.int32)  # fold lands nulls in cell 0
        if not nulls.all():
            Vb = np.stack(arr[~nulls])
            acc = np.zeros((len(Vb), len(C)))
            for i in range(Vb.shape[1]):
                acc = acc + Vb[:, i][:, None] * C[:, i][None, :]
            S = cc[None, :] - 2.0 * acc
            out[~nulls] = np.argmin(S, axis=1).astype(np.int32)
        return pd.Series(out)

    return pandas_udf(_assign, "int")


def probe_assign(spark) -> None:
    from bigdata_processing_spark.operators.ivf import (
        allpairs_cell_count,
        seeded_assign_cells,
        trained_centroids,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    n = table_rows(SF_DIR, "embeddings")
    k = allpairs_cell_count(n)
    t0 = time.perf_counter()
    cents = trained_centroids(emb, k, n_iter=2, exact=True)
    t1 = time.perf_counter()
    print(f"trained_centroids(exact fold) n={n} k={k}: {t1-t0:.2f}s")

    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    ).repartition(64).persist()
    base.count()

    # fold form
    for lbl in ("cold", "warm"):
        t0 = time.perf_counter()
        noop(seeded_assign_cells(base, cents))
        print(f"assign fold {lbl}: {time.perf_counter()-t0:.2f}s")
    # foldexact form
    fx = assign_foldexact(cents)
    for lbl in ("cold", "warm"):
        t0 = time.perf_counter()
        noop(base.select("vec_id", fx(F.col("e")).alias("cell")))
        print(f"assign foldexact {lbl}: {time.perf_counter()-t0:.2f}s")

    a = seeded_assign_cells(base, cents).toPandas().set_index("vec_id")
    b = (
        base.select("vec_id", fx(F.col("e")).alias("cell"))
        .toPandas()
        .set_index("vec_id")
    )
    j = a.join(b, lsuffix="_a", rsuffix="_b")
    eq = (j["cell_a"] == j["cell_b"]).all()
    print(f"assign equal on all {len(j)} rows: {eq}")
    base.unpersist()


def probe_dot(spark) -> None:
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qe"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("ce"),
    ).repartition(64)
    joined = c.join(F.broadcast(q), F.col("cid") != F.col("qid")).persist()
    npairs = joined.count()
    print(f"pairs: {npairs}")

    forms = {
        "fold(V.dot)": V.dot(F.col("qe"), F.col("ce")),
        "foldexact": dot_foldexact(F.col("qe"), F.col("ce")),
        "einsum(dot_vectorized)": V.dot_vectorized(F.col("qe"), F.col("ce")),
    }
    for name, col in forms.items():
        df = joined.select("qid", "cid", col.alias("s"))
        for lbl in ("cold", "warm"):
            t0 = time.perf_counter()
            noop(df)
            print(f"dot {name} {lbl}: {time.perf_counter()-t0:.2f}s")

    # bit-compare fold vs foldexact on a deterministic slice
    sl = joined.filter(F.col("cid") % 17 == 0)
    a = sl.select(
        "qid", "cid", V.dot(F.col("qe"), F.col("ce")).alias("s")
    ).toPandas().sort_values(["qid", "cid"]).reset_index(drop=True)
    b = sl.select(
        "qid", "cid", dot_foldexact(F.col("qe"), F.col("ce")).alias("s")
    ).toPandas().sort_values(["qid", "cid"]).reset_index(drop=True)
    eq = (a["s"].to_numpy().view(np.int64) == b["s"].to_numpy().view(np.int64)).all()
    print(f"dot bit-identical on {len(a)} sampled pairs: {eq}")
    joined.unpersist()


def main() -> None:
    spark = get_spark("r13-foldexact-ab")
    spark.sparkContext.setLogLevel("ERROR")
    args = sys.argv[1:] or ["--assign", "--dot"]
    if "--assign" in args:
        probe_assign(spark)
    if "--dot" in args:
        probe_dot(spark)
    spark.stop()


if __name__ == "__main__":
    main()
