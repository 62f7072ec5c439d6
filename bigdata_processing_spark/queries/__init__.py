"""Query registry.

Every operator from SURVEY.md §2 lands here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
an ANSI-SQL oracle string run by DuckDB over the same parquet tables.

The registry is what ``__spark_entry__.queries()`` / ``oracle_sql()``
expose to the driver's correctness harness.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    """Decorator: register a query under ``name`` with an optional DuckDB
    oracle. Queries without an oracle get the driver's weaker rows-only
    check (reserved for genuinely non-SQL-expressible ops)."""
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn
    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (imports populate the
    registry via the decorator)."""
    global _LOADED
    if _LOADED:
        return
    from bigdata_processing_spark.queries import (  # noqa: F401
        relational,
        joins,
        analytic,
        semistructured,
        text_analysis,
        dedup,
        similarity,
        multimodal,
        timeseries,
        extended,
        temporal_ext,
        nlp,
        subqueries,
        quality,
    )
    _LOADED = True
