"""Subquery and multi-grouping surface: scalar subqueries, correlated
EXISTS/IN, GROUPING SETS with grouping_id, ordered string aggregation.

The reference's only subquery-like shape is join-as-filter (SURVEY.md
§2.2 F8); this module rounds out the ANSI subquery family an OLAP user
expects. All plans stay declarative — Catalyst rewrites correlated
subqueries into joins (scalar → broadcast cross of a 1-row aggregate,
EXISTS/IN → left-semi), so at scale these cost exactly what the
equivalent hand-written join costs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table, register_views
from bigdata_processing_spark.queries import register


# ---------------------------------------------------------------------------
# Scalar subquery: parts priced above the global average retail price.
# Catalyst plans the aggregate once and broadcasts the single row.
# ---------------------------------------------------------------------------
@register(
    "scalar_subquery_above_avg",
    oracle="""
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        ORDER BY p_retailprice DESC, p_partkey
        LIMIT 100
    """,
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        ORDER BY p_retailprice DESC, p_partkey
        LIMIT 100
    """)


# ---------------------------------------------------------------------------
# Correlated EXISTS: customers having at least one urgent open order.
# Catalyst → left-semi join on the correlation key.
# ---------------------------------------------------------------------------
@register(
    "correlated_exists_urgent",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
              AND o.o_orderstatus = 'O'
        )
        ORDER BY c_custkey
    """,
)
def correlated_exists_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
              AND o.o_orderstatus = 'O'
        )
        ORDER BY c_custkey
    """)


# ---------------------------------------------------------------------------
# Correlated scalar subquery: each order vs its customer's average order
# value — orders more than 2x their customer's own average.
# ---------------------------------------------------------------------------
@register(
    "correlated_above_customer_avg",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 2 * (
            SELECT avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
        )
        ORDER BY o_orderkey
    """,
)
def correlated_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 2 * (
            SELECT avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
        )
        ORDER BY o_orderkey
    """)


# ---------------------------------------------------------------------------
# NOT IN with null-safety: nations no supplier is registered in.
# (NOT IN over a nullable column is the classic ANSI trap; n_nationkey
# and s_nationkey are non-null here, so semantics are the safe case —
# Catalyst plans a null-aware anti join regardless.)
# ---------------------------------------------------------------------------
@register(
    "not_in_supplier_nations",
    oracle="""
        SELECT n_nationkey, n_name
        FROM nation
        WHERE n_nationkey NOT IN (SELECT s_nationkey FROM supplier)
        ORDER BY n_nationkey
    """,
)
def not_in_supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT n_nationkey, n_name
        FROM nation
        WHERE n_nationkey NOT IN (SELECT s_nationkey FROM supplier)
        ORDER BY n_nationkey
    """)


# ---------------------------------------------------------------------------
# GROUPING SETS with grouping_id: one pass producing per-status,
# per-priority, and grand-total revenue (the general form that rollup
# and cube specialize).
# ---------------------------------------------------------------------------
@register(
    "grouping_sets_revenue",
    oracle="""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid,
               count(*) AS n_orders,
               sum(o_totalprice) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, status, priority
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
               count(*) AS n_orders,
               sum(o_totalprice) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, status, priority
    """)


# ---------------------------------------------------------------------------
# Ordered string aggregation: per-segment ordered list of top customer
# names (listagg/string_agg — deterministic ORDER BY inside the agg).
# ---------------------------------------------------------------------------
@register(
    "string_agg_top_customers",
    oracle="""
        WITH top5 AS (
            SELECT c_mktsegment, c_name, c_acctbal,
                   row_number() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer
        )
        SELECT c_mktsegment,
               string_agg(c_name, ',' ORDER BY rn) AS top_names
        FROM top5
        WHERE rn <= 5
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
)
def string_agg_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    top5 = cust.withColumn("rn", F.row_number().over(w).cast("long")).filter(F.col("rn") <= 5)
    # array_sort on (rn, name) structs → ordered concat: the portable
    # ordered-string-agg (listagg ordering semantics differ per engine)
    return (
        top5.groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "c_name"))),
                    lambda s: s["c_name"],
                ),
                ",",
            ).alias("top_names")
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# LATERAL correlated subquery: each nation's single top customer by
# balance — the per-row-subquery form of top-1-per-group (Catalyst plans
# a DomainJoin → window, not a per-row re-execution).
# ---------------------------------------------------------------------------
@register(
    "lateral_top_customer_per_nation",
    oracle="""
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n,
             LATERAL (
                 SELECT c_name, c_acctbal
                 FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey
                 LIMIT 1
             ) t
        ORDER BY n.n_name
    """,
)
def lateral_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n,
             LATERAL (
                 SELECT c_name, c_acctbal
                 FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey
                 LIMIT 1
             ) t
        ORDER BY n.n_name
    """)
