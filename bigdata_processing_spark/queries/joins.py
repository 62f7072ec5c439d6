"""Join queries: inner/semi/anti/outer equi-joins, broadcast strategy,
join-as-filter, top-k over a join.

Reference joins are all RDD inner hash equi-joins on one string key
(SURVEY.md §2.5, J1-J5). Here every join is declarative; small sides get
explicit ``broadcast()`` hints (AQE would convert at runtime anyway, the
hint makes the 100TB-scale plan deterministic: never shuffle the fact
table to join a dimension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.queries import register


# ---------------------------------------------------------------------------
# Big ⋈ small inner join + per-key sum + top-k (reference
# etherTop10Contracts.py:56-68: txns ⋈ contracts, sum value per address,
# top 10; operators J1, A2, T1). customer is the dimension side →
# broadcast; orders never shuffles.
# ---------------------------------------------------------------------------
@register(
    "top_customers_by_revenue",
    oracle="""
        SELECT c.c_custkey, any_value(c.c_name) AS c_name,
               sum(o.o_totalprice) AS total_revenue,
               count(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
        ORDER BY total_revenue DESC, c_custkey ASC
        LIMIT 10
    """,
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        # c_name rides the GROUP BY key, not an any_value(): a string
        # aggregation buffer is not hash-aggregable, so any_value(c_name)
        # made Catalyst plan SortAggregate — sorting the orders-sized
        # join output on both sides of the exchange. c_name is
        # functionally dependent on c_custkey, so the composite key is
        # value-identical and keeps the plan a pure HashAggregate.
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum("o_totalprice").alias("total_revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.col("total_revenue").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Semi-join as membership filter (reference etherTop10Contracts.py:63-65
# maps contracts to (addr, 1) and inner-joins purely to filter — the
# membership-set idiom, F8/J5). left_semi states the intent, never
# duplicates rows, and broadcasts the filter side.
# ---------------------------------------------------------------------------
@register(
    "semi_join_filter",
    oracle="""
        SELECT l.l_suppkey, sum(l.l_extendedprice) AS total_price,
               count(*) AS n_items
        FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
        GROUP BY l.l_suppkey
        ORDER BY l_suppkey
    """,
)
def semi_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(
            F.sum("l_extendedprice").alias("total_price"),
            F.count("*").alias("n_items"),
        )
        .orderBy("l_suppkey")
    )


# ---------------------------------------------------------------------------
# Anti join (engine extension per SURVEY.md §2.5 "not present in
# reference"): customers with no orders.
# ---------------------------------------------------------------------------
@register(
    "customers_without_orders",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        ORDER BY c_custkey
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Left outer join + null-aware aggregation (engine extension, §2.5).
# ---------------------------------------------------------------------------
@register(
    "nation_order_counts_outer",
    oracle="""
        SELECT n.n_name,
               count(o.o_orderkey) AS n_orders,
               coalesce(sum(o.o_totalprice), 0) AS total_revenue
        FROM nation n
        LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY n.n_name
        ORDER BY n_name
    """,
)
def nation_order_counts_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        nation
        .join(cust, cust.c_nationkey == nation.n_nationkey, "left_outer")
        .join(orders, orders.o_custkey == cust.c_custkey, "left_outer")
        .groupBy("n_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("total_revenue"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Multi-hop dimension chain join (region → nation → customer → orders):
# the star-schema generalization of the reference's two-table joins.
# All dimension hops broadcast; the single shuffle is the final groupBy.
# ---------------------------------------------------------------------------
@register(
    "revenue_by_region",
    oracle="""
        SELECT r.r_name,
               sum(o.o_totalprice) AS total_revenue,
               count(*) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        ORDER BY r_name
    """,
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum("o_totalprice").alias("total_revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# Tiny-side filter join to a precomputed top-k (reference
# ethergasguzzlers.py:75-77 joins the txn stream against the top-10
# contract list purely to filter; J5). Implemented as semi-join against
# a derived top-k aggregate — two-phase: aggregate to find the top set,
# broadcast it back against the fact table.
# ---------------------------------------------------------------------------
@register(
    "top_customer_monthly_series",
    oracle="""
        WITH topc AS (
            SELECT o_custkey FROM orders
            GROUP BY o_custkey
            ORDER BY sum(o_totalprice) DESC, o_custkey ASC
            LIMIT 10
        )
        SELECT strftime(o.o_orderdate, '%Y-%m') AS order_month,
               avg(o.o_totalprice) AS avg_price,
               count(*) AS n_orders
        FROM orders o
        WHERE o.o_custkey IN (SELECT o_custkey FROM topc)
        GROUP BY 1
        ORDER BY order_month
    """,
)
def top_customer_monthly_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    topc = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("tv"))
        .orderBy(F.col("tv").desc(), F.col("o_custkey").asc())
        .limit(10)
        .select("o_custkey")
    )
    return (
        orders.join(F.broadcast(topc), "o_custkey", "left_semi")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(F.avg("o_totalprice").alias("avg_price"), F.count("*").alias("n_orders"))
        .orderBy("order_month")
    )


# ---------------------------------------------------------------------------
# Set operations (engine extension per SURVEY.md step 5):
# union / intersect / except on key sets.
# ---------------------------------------------------------------------------
@register(
    "set_ops_customer_keys",
    oracle="""
        WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
             rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
        SELECT 'union' AS op, count(*) AS n FROM (SELECT k FROM buyers UNION SELECT k FROM rich)
        UNION ALL
        SELECT 'intersect' AS op, count(*) AS n FROM (SELECT k FROM buyers INTERSECT SELECT k FROM rich)
        UNION ALL
        SELECT 'except' AS op, count(*) AS n FROM (SELECT k FROM buyers EXCEPT SELECT k FROM rich)
        ORDER BY op
    """,
)
def set_ops_customer_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    buyers = orders.select(F.col("o_custkey").alias("k")).distinct()
    rich = cust.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k"))
    u = buyers.union(rich).distinct().agg(F.count("*").alias("n")).select(F.lit("union").alias("op"), "n")
    i = buyers.intersect(rich).agg(F.count("*").alias("n")).select(F.lit("intersect").alias("op"), "n")
    e = buyers.exceptAll(rich.distinct()).distinct().agg(F.count("*").alias("n")).select(F.lit("except").alias("op"), "n")
    return u.union(i).union(e).orderBy("op")


# ---------------------------------------------------------------------------
# Bag-semantics set operations (ALL variants — multiplicity preserved):
# the multiset algebra over order priorities per status.
# ---------------------------------------------------------------------------
@register(
    "set_ops_all_variants",
    oracle="""
        WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'O'),
             b AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'F')
        SELECT 'union_all' AS op, count(*) AS n FROM (SELECT p FROM a UNION ALL SELECT p FROM b)
        UNION ALL
        SELECT 'intersect_all', count(*) FROM (SELECT p FROM a INTERSECT ALL SELECT p FROM b)
        UNION ALL
        SELECT 'except_all', count(*) FROM (SELECT p FROM a EXCEPT ALL SELECT p FROM b)
        ORDER BY op
    """,
)
def set_ops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_orderpriority").alias("p"))
    b = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_orderpriority").alias("p"))
    rows = [
        ("union_all", a.unionAll(b)),
        ("intersect_all", a.intersectAll(b)),
        ("except_all", a.exceptAll(b)),
    ]
    out = None
    for op, df in rows:
        one = df.agg(F.count("*").alias("n")).select(F.lit(op).alias("op"), "n")
        out = one if out is None else out.union(one)
    return out.orderBy("op")


# ---------------------------------------------------------------------------
# Bloom-bitmap pre-join pruning (operators/sketches.py): the selective
# big⋈small join with the big side hash-pruned BEFORE the join's
# shuffle. The bitmap pass admits a superset of the true matches (no
# false negatives), and the exact semi-join then removes the ~n/bits
# false positives — so the result, and hence the oracle, is exactly the
# plain semi-join aggregate. At 100 TB this is the difference between
# shuffling the whole fact table and shuffling (selectivity + fpr) of
# it; here selectivity ≈ 20% and the bitmap is ≤ 2048 broadcast rows.
# ---------------------------------------------------------------------------
@register(
    "bloom_prejoin_revenue",
    oracle="""
        SELECT l.l_returnflag, sum(l.l_extendedprice) AS revenue,
               count(*) AS n_items
        FROM lineitem l
        WHERE l.l_orderkey IN
              (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY 1
        ORDER BY l_returnflag
    """,
)
def bloom_prejoin_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_processing_spark.operators.sketches import bloom_prune

    li = load_table(spark, sf_dir, "lineitem")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    pruned = bloom_prune(li, urgent, "l_orderkey", "o_orderkey")
    return (
        pruned.join(urgent, pruned.l_orderkey == urgent.o_orderkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.sum("l_extendedprice").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("l_returnflag")
    )
