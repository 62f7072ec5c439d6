"""CBO statistics feed: ANALYZE'd catalog tables expose real rowCount /
column stats to the optimizer, and a planned query's estimates reflect
them (the cluster-scale prerequisite for cost-based join reordering)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import STATS_DB, register_analyzed_tables

SF = "/root/testdata/sf0.001"


def test_analyze_produces_row_and_column_stats(spark):
    tbls = register_analyzed_tables(spark, SF, tables=("nation", "orders"))
    assert set(tbls) == {"nation", "orders"}

    desc = {r.col_name: r.data_type for r in spark.sql(
        f"DESCRIBE TABLE EXTENDED {STATS_DB}.orders").collect()}
    assert "Statistics" in desc and "rows" in desc["Statistics"]

    n_orders = spark.table(f"{STATS_DB}.orders").count()
    assert f"{n_orders} rows" in desc["Statistics"]

    # column-level stats (NDV / min / max) — DESC EXTENDED col surface
    col = {r.info_name: r.info_value for r in spark.sql(
        f"DESCRIBE TABLE EXTENDED {STATS_DB}.orders o_orderkey").collect()}
    assert col.get("distinct_count") not in (None, "NULL")
    assert col.get("min") not in (None, "NULL")


def test_optimizer_estimates_use_stats(spark):
    register_analyzed_tables(spark, SF, tables=("orders",))
    full = spark.table(f"{STATS_DB}.orders")
    n = full.count()

    stats = full._jdf.queryExecution().optimizedPlan().stats()
    assert stats.rowCount().isDefined()
    assert stats.rowCount().get() == n

    # a selective filter must SHRINK the estimate (CBO filter selectivity
    # from column min/max/NDV), not just echo the table size
    filtered = full.filter(F.col("o_orderstatus") == "F")
    fstats = filtered._jdf.queryExecution().optimizedPlan().stats()
    assert fstats.rowCount().isDefined()
    assert fstats.rowCount().get() < n
