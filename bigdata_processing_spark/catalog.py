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

# Table-handle memo (round 12, guide §1/§6): ``spark.read.parquet`` costs
# ~130 ms of DRIVER work per call (datasource resolution + footer schema
# read + file-index build), and the query registry re-loads its inputs on
# EVERY query construction — the r12 isolation probe measured 47.5 s of
# the 166-query suite's wall in Python-side construction, most of it
# repeated loads (a register_views query re-read all 10 tables per call).
# The memo caches the UNEXECUTED scan DataFrame per (session, dir, table):
# pure plan metadata — every action still scans parquet; results are
# never cached. Keyed by applicationId so a new session never sees a
# stale handle. Fixture dirs are immutable for a session's lifetime
# (regenerating a table in place mid-session would need a fresh dir, as
# every existing caller already does).
_TABLE_MEMO: dict[tuple[str, str, str], DataFrame] = {}

# register_views memo: appId -> sf_dir whose views are current. The
# expensive part (table loads) is covered by _TABLE_MEMO; this skips the
# ~0.5 s of repeated createOrReplaceTempView py4j hops when the SAME dir
# is re-registered (the common per-query pattern). Switching dirs
# re-registers, so mixed-scale sessions stay correct.
_VIEWS_MEMO: dict[str, str] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Plain ``spark.read.parquet`` — schema comes
    from the parquet footer; Catalyst prunes columns and pushes filters
    into the vectorized reader. Memoized per (session, dir, table) — see
    ``_TABLE_MEMO``."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_MEMO.get(key)
    if cached is not None:
        return cached
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
    _TABLE_MEMO[key] = df
    return df


# Footer row-count memo (round 12): the ANN/dedup families need the input
# table's ROW COUNT for regime sizing (histogram-prune bounds, IVF cell
# counts) — a semantic-free exact integer that `df.count()` spends a
# Spark job on per query construction (the r12 probe measured 1.0 s for
# matryoshka's derived-frame count alone). Parquet footers carry the same
# exact count as pure file metadata. Keyed by (dir, table) only: the
# number is a property of the files, not the session.
_ROWS_MEMO: dict[tuple[str, str], int] = {}


def table_rows(sf_dir: str, name: str) -> int:
    """EXACT row count of a fixture table from parquet footer metadata —
    no Spark job. Equals ``load_table(...).count()`` by the parquet spec
    (num_rows is required footer metadata, enforced on write)."""
    key = (sf_dir, name)
    n = _ROWS_MEMO.get(key)
    if n is None:
        import glob as _glob

        import pyarrow.parquet as pq

        p = table_path(sf_dir, name)
        files = [p] if os.path.isfile(p) else sorted(
            _glob.glob(os.path.join(p, "*.parquet"))
        )
        n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        _ROWS_MEMO[key] = n
    return n


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES
            if os.path.exists(table_path(sf_dir, name))}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for the spark.sql
    surface). Mirrors the DuckDB oracle's pre-registered views.

    Re-registration for the dir already current is skipped (see
    ``_VIEWS_MEMO``); calling with a DIFFERENT dir re-points the views."""
    dfs = load_tables(spark, sf_dir)
    app_id = spark.sparkContext.applicationId
    if _VIEWS_MEMO.get(app_id) != sf_dir:
        for name, df in dfs.items():
            df.createOrReplaceTempView(name)
        _VIEWS_MEMO[app_id] = sf_dir
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
