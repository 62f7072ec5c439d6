"""Core relational queries: filters, projections, time bucketing,
keyed/composite/global aggregation, argmax, sorts/limits/top-k.

Each query is the fixture-schema analog of a reference pipeline
(SURVEY.md §2 operator IDs cited per query). All are pure DataFrame-API
plans — Catalyst supplies pushdown, pruning, partial aggregation and
top-k (TakeOrderedAndProject) physical strategies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.queries import register


# ---------------------------------------------------------------------------
# Flagship: monthly order count + revenue (reference
# etherTransactionsAnalysis.py:44-54 — monthly txn count + avg value;
# operators F1, P1, P3, A1, A2, A4 collapsed into one groupBy).
# The reference computed count and avg as two reduceByKey passes joined on
# month; Catalyst computes all three aggregates in ONE shuffle with
# map-side partial aggregation.
# ---------------------------------------------------------------------------
@register(
    "monthly_orders",
    oracle="""
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
               count(*) AS order_count,
               sum(o_totalprice) AS total_revenue,
               avg(o_totalprice) AS avg_revenue
        FROM orders
        GROUP BY 1
        ORDER BY order_month
    """,
)
def monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count("*").alias("order_count"),
            F.sum("o_totalprice").alias("total_revenue"),
            F.avg("o_totalprice").alias("avg_revenue"),
        )
        .orderBy("order_month")
    )


# ---------------------------------------------------------------------------
# Monthly average series (reference ethergasguzzlers.py:61-63 — avg gas
# price per month via hand-rolled (sum,count) tuple; operator A3).
# ---------------------------------------------------------------------------
@register(
    "monthly_avg_price",
    oracle="""
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               avg(l_extendedprice) AS avg_price,
               sum(l_quantity) AS total_qty
        FROM lineitem
        GROUP BY 1
        ORDER BY ship_month
    """,
)
def monthly_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.avg("l_extendedprice").alias("avg_price"),
            F.sum("l_quantity").alias("total_qty"),
        )
        .orderBy("ship_month")
    )


# ---------------------------------------------------------------------------
# Join-of-aggregates (reference etherTransactionsAnalysis.py:51-54 joins a
# sum-RDD with a count-RDD on month then divides; operators A4, J2).
# Kept as an explicit aggregate⋈aggregate to exercise the join-of-two-
# groupBys plan; both sides are tiny post-aggregation so AQE broadcasts.
# ---------------------------------------------------------------------------
@register(
    "join_of_aggregates",
    oracle="""
        WITH sums AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
                   sum(o_totalprice) AS total_revenue
            FROM orders GROUP BY 1
        ), counts AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
                   count(*) AS order_count
            FROM orders GROUP BY 1
        )
        SELECT s.order_month AS order_month,
               s.total_revenue AS total_revenue,
               c.order_count AS order_count,
               s.total_revenue / c.order_count AS avg_revenue
        FROM sums s JOIN counts c ON s.order_month = c.order_month
        ORDER BY order_month
    """,
)
def join_of_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    sums = orders.groupBy(month).agg(F.sum("o_totalprice").alias("total_revenue"))
    counts = orders.groupBy(month).agg(F.count("*").alias("order_count"))
    return (
        sums.join(counts, "order_month")
        .select(
            "order_month",
            "total_revenue",
            "order_count",
            (F.col("total_revenue") / F.col("order_count")).alias("avg_revenue"),
        )
        .orderBy("order_month")
    )


# ---------------------------------------------------------------------------
# Top-k by aggregate (reference etherTopMiners.py:44-46 — sum block size
# per miner, takeOrdered(10); operators A2, T1). Spark plans this as
# TakeOrderedAndProject: per-partition heap top-k + driver merge, same
# O(n log k) as the reference's takeOrdered but JVM-side.
# Deterministic tie-break on the key.
# ---------------------------------------------------------------------------
@register(
    "top_suppliers_by_quantity",
    oracle="""
        SELECT l_suppkey, sum(l_quantity) AS total_qty
        FROM lineitem
        GROUP BY l_suppkey
        ORDER BY total_qty DESC, l_suppkey ASC
        LIMIT 10
    """,
)
def top_suppliers_by_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.col("total_qty").desc(), F.col("l_suppkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Global (grand-total) aggregate over string-length arithmetic
# (reference etheroverhead.py:48-49 — bits wasted by 5 hex columns,
# constant-key reduceByKey; operators P8, A5, X3, X6).
# Spark: keyless agg — partial aggregation per partition, single-row final.
# ---------------------------------------------------------------------------
@register(
    "global_overhead",
    oracle="""
        SELECT CAST(sum((length(text) - 2) * 4) AS BIGINT) AS wasted_bits,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               count(*) AS doc_count
        FROM documents
    """,
)
def global_overhead(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.sum((F.length("text") - F.lit(2)) * F.lit(4)).alias("wasted_bits"),
        F.sum("n_chars").alias("total_chars"),
        F.count("*").alias("doc_count"),
    )


# ---------------------------------------------------------------------------
# Argmax / top-1 by aggregate (reference etherscams.py:57-58 — most
# lucrative scam id and category; operators A7, T2). Two idioms: the
# orderBy/limit form below and max_by in `argmax_event_type`.
# ---------------------------------------------------------------------------
@register(
    "top_event_type_by_value",
    oracle="""
        SELECT event_type, sum(value) AS total_value
        FROM events
        GROUP BY event_type
        ORDER BY total_value DESC, event_type ASC
        LIMIT 1
    """,
)
def top_event_type_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.sum("value").alias("total_value"))
        .orderBy(F.col("total_value").desc(), F.col("event_type").asc())
        .limit(1)
    )


@register(
    "argmax_user_by_type",
    oracle="""
        SELECT event_type,
               max_by(user_id, value) AS top_user,
               max(value) AS max_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def argmax_user_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by argmax — single-pass, no sort (SURVEY.md §2.6 A7)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.max_by("user_id", "value").alias("top_user"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Composite-key series (reference etherscams.py:59 — ((month, category),
# value) sums; operator A6) over events by (day, event_type).
# ---------------------------------------------------------------------------
@register(
    "events_by_day_and_type",
    oracle="""
        SELECT strftime(ts, '%Y-%m-%d') AS event_day,
               event_type,
               sum(value) AS total_value,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2
        ORDER BY event_day, event_type
    """,
)
def events_by_day_and_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
            "event_type",
        )
        .agg(
            F.sum("value").alias("total_value"),
            F.count("*").alias("n_events"),
            # exact distinct rides in the same aggregate (Expand-based
            # plan); keeps the distinct-count operator driver-checked
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_day", "event_type")
    )


# ---------------------------------------------------------------------------
# Prefix-predicate filter + null-safe typed filter (reference
# etherTop10Contracts.py:19-29 validators; operators F2, F3, X2).
# The prefix predicate compiles to a parquet StartsWith pushed filter.
# ---------------------------------------------------------------------------
@register(
    "filter_prefix_predicate",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_name LIKE 'Customer#00000001%'
          AND c_acctbal IS NOT NULL
          AND c_acctbal > 0
        ORDER BY c_custkey
    """,
)
def filter_prefix_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.filter(
            F.col("c_name").startswith("Customer#00000001")
            & F.col("c_acctbal").isNotNull()
            & (F.col("c_acctbal") > 0)
        )
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Multi-predicate scan + derived-column projection (operators F1, P6, X6;
# TPC-H Q1 shape — generalizes the reference's per-month measures to
# multi-aggregate grouped summary).
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               sum(l_extendedprice) AS sum_base_price,
               sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
               avg(l_quantity) AS avg_qty,
               avg(l_extendedprice) AS avg_price,
               avg(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-06-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Distinct aggregation (SURVEY.md §2.6 "not present in reference, engine
# exposes via built-ins"): count distinct + grouped distinct.
# ---------------------------------------------------------------------------
@register(
    "distinct_users_by_type",
    oracle="""
        SELECT event_type,
               count(DISTINCT user_id) AS distinct_users,
               count(*) AS n_events
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("distinct_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Rollup (grouping-sets family — §2.6 "not present, engine exposes").
# ---------------------------------------------------------------------------
@register(
    "rollup_order_priority",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               sum(o_totalprice) AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("total_price"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# Sort + unordered limit (reference ethergasguzzlers.py:72,90 —
# sortByKey + take(100); operators T3, T4). A deterministic keyed sort
# with limit; limit pushes into the sort (TakeOrderedAndProject).
# ---------------------------------------------------------------------------
@register(
    "sorted_daily_value",
    oracle="""
        SELECT strftime(ts, '%Y-%m-%d') AS event_day,
               sum(value) AS total_value
        FROM events
        GROUP BY 1
        ORDER BY event_day ASC
        LIMIT 100
    """,
)
def sorted_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("event_day"))
        .agg(F.sum("value").alias("total_value"))
        .orderBy(F.col("event_day").asc())
        .limit(100)
    )
