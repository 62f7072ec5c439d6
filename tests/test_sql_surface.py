"""spark.sql surface: the registered-view catalog serves the same
queries through plain SQL — DataFrame and SQL plans converge to the
same results (and the same Catalyst plans)."""

from __future__ import annotations

from conftest import SF_SMALL

from bigdata_processing_spark.catalog import register_views
from bigdata_processing_spark.queries.joins import top_customers_by_revenue
from bigdata_processing_spark.queries.relational import monthly_orders


def test_sql_equals_dataframe_agg(spark):
    register_views(spark, SF_SMALL)
    sql = spark.sql("""
        SELECT date_format(o_orderdate, 'yyyy-MM') AS order_month,
               count(*) AS order_count,
               sum(o_totalprice) AS total_revenue,
               avg(o_totalprice) AS avg_revenue
        FROM orders GROUP BY 1 ORDER BY order_month
    """).collect()
    df = monthly_orders(spark, SF_SMALL).collect()
    assert [tuple(r) for r in sql] == [tuple(r) for r in df]


def test_sql_equals_dataframe_join_topk(spark):
    register_views(spark, SF_SMALL)
    sql = spark.sql("""
        SELECT c.c_custkey, any_value(c.c_name) AS c_name,
               sum(o.o_totalprice) AS total_revenue, count(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
        ORDER BY total_revenue DESC, c_custkey ASC
        LIMIT 10
    """).collect()
    df = top_customers_by_revenue(spark, SF_SMALL).collect()
    assert [tuple(r) for r in sql] == [tuple(r) for r in df]


def test_views_cover_all_tables(spark):
    dfs = register_views(spark, SF_SMALL)
    assert set(dfs) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    for name in dfs:
        assert spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0].n > 0
