"""Vector math over ``array<float>`` embedding columns — pure Column
expressions (``zip_with`` + ``aggregate`` fold, JVM-side).

Precision contract: elements are cast to double BEFORE any arithmetic so
that Spark and the DuckDB oracle (``embedding::DOUBLE[]`` +
``list_dot_product``) fold the same doubles in the same array order —
verified to agree bit-for-bit on the fixture embeddings.

North-star extension (SURVEY.md §2.12); no reference analog.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec) -> Column:
    return F.col(vec).cast("array<double>") if isinstance(vec, str) else vec.cast("array<double>")


def dot(a, b) -> Column:
    """Dot product: fold of elementwise products in array order."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    """Cosine similarity. DuckDB twin:
    list_dot_product(a::DOUBLE[], b::DOUBLE[]) /
    (sqrt(list_dot_product(a,a)) * sqrt(list_dot_product(b,b)))."""
    a, b = as_double(a), as_double(b)
    return dot(a, b) / (norm(a) * norm(b))


def dot_vectorized(a, b) -> Column:
    """Arrow-batched numpy dot (einsum) — the fast path for LARGE
    pairwise workloads, where Catalyst's interpreted higher-order fold
    dominates (lambda expressions are not codegen'd; measured ~1.5x on
    200k pair rows). Summation order differs from the sequential fold by
    ~1e-15 relative — far inside the engine's 1e-6 oracle tolerance.
    Prefer ``dot`` for small workloads: it keeps Python out of the path.
    """
    from pyspark.sql.functions import pandas_udf

    def _pdot(x, y):
        import numpy as np

        return pd.Series(
            np.einsum("ij,ij->i", np.vstack(x.values), np.vstack(y.values))
        )

    _pdot.__annotations__ = {"x": pd.Series, "y": pd.Series, "return": pd.Series}
    return pandas_udf(_pdot, "double")(as_double(a), as_double(b))
