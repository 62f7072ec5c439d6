"""Catalog: declared-schema loading of the fixture star schema.

The reference has no catalog — every job re-parses raw text and re-asserts
arity/type constraints per line (SURVEY.md §2.2, e.g. reference
``Codes/etherTransactionsAnalysis/etherTransactionsAnalysis.py:19-28``).
Here tables are columnar parquet with schemas declared once; readers get
column pruning + filter pushdown for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Back-compat: an earlier fixture generation wrote these columns as
# parquet TIMESTAMP(NANOS), which Spark reads as long under
# spark.sql.legacy.parquet.nanosAsLong; the catalog then restores
# TimestampType at microsecond precision. Current fixtures write naive
# timestamp[us] (read as TIMESTAMP_NTZ), for which the bigint branch
# below is a no-op — both generations load to equivalent wall times.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Plain ``spark.read.parquet`` — schema comes
    from the parquet footer; Catalyst prunes columns and pushes filters
    into the vectorized reader."""
    if name in _NANO_TS_COLS:
        # ensure nanos-typed parquet is readable regardless of how the
        # caller's session was built (the driver harness uses a plain one)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for c in _NANO_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(c) == "bigint":
            # integer `div` (not `/`): float division would round-trip the
            # nano count through double and lose sub-microsecond precision
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES
            if os.path.exists(table_path(sf_dir, name))}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for the spark.sql
    surface). Mirrors the DuckDB oracle's pre-registered views."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


# ---------------------------------------------------------------------------
# Cost-based-optimizer feed: catalog tables + ANALYZE statistics.
#
# Temp views carry no persisted stats, so CBO join reordering and
# broadcast decisions fall back to size-on-disk heuristics. At cluster
# scale the win comes from table/column stats (rowCount, NDV, min/max):
# `ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS` feeds them to
# the optimizer (session.get_spark enables spark.sql.cbo.* so the
# estimates are actually used).
# ---------------------------------------------------------------------------
STATS_DB = "stats"


def register_analyzed_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] | None = None,
    for_columns: bool = True,
) -> dict[str, DataFrame]:
    """External catalog tables over the fixture parquet with computed
    statistics. Returns {name: DataFrame} resolving to ``stats.<name>``.

    ANALYZE scans each table once (row count + per-column NDV/min/max/
    null count); on a production cluster this runs after ingest, amortized
    over every query that plans against the table."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {STATS_DB}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out: dict[str, DataFrame] = {}
    for name in tables or TABLES:
        p = table_path(sf_dir, name)
        if not os.path.exists(p):
            continue
        spark.sql(f"DROP TABLE IF EXISTS {STATS_DB}.{name}")
        spark.sql(f"CREATE TABLE {STATS_DB}.{name} USING parquet LOCATION '{p}'")
        suffix = " FOR ALL COLUMNS" if for_columns else ""
        spark.sql(f"ANALYZE TABLE {STATS_DB}.{name} COMPUTE STATISTICS{suffix}")
        out[name] = spark.table(f"{STATS_DB}.{name}")
    return out
