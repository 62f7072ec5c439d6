"""Temporal & frame extensions: rolling time-range windows, the
date-function family, pagination, array-function family.

The rolling RANGE-frame window is the time-series staple the reference
approximated with month buckets (P3) — a true sliding aggregate over an
interval, computed in one pass."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.functions.temporal import epoch_us
from bigdata_processing_spark.queries import register


# ---------------------------------------------------------------------------
# Rolling 1-hour average per event (RANGE frame over event time).
# Spark: range frame over unix-micros ordering — identical inclusive
# bounds to DuckDB's RANGE BETWEEN INTERVAL 1 HOUR PRECEDING.
#
# Scale shape (round 10): the naive translation is a GLOBAL
# Window.orderBy(ts) — no partition key, so Spark sorts the entire
# events table in ONE task (measured: the 10x sweep's slowest
# non-dedup stage, one core busy on a 32-core host; at real scale a
# single-partition sort of the fact table). Instead the window is
# HOUR-BUCKETED WITH A ONE-BUCKET HALO: every event goes to its own
# hour bucket, and a flagged copy goes to the NEXT bucket as lookback
# context. A 1-hour frame ending at t ∈ bucket b reaches back at most
# to start(b) − 1h = start(b − 1), so the frame is always fully
# contained in b ∪ (b−1): windowing within each bucket over
# (own rows + halo rows) and dropping the halo rows' own output is
# EXACTLY the global window, row for row, at 2x the rows but
# hours-of-data-way parallelism. (Frames are RANGE-based, so equal-ts
# rows behave identically in both forms.)
# ---------------------------------------------------------------------------
_HOUR_US = 3_600_000_000
@register(
    "rolling_1h_stats",
    oracle="""
        SELECT event_id,
               round(avg(value) OVER w, 6) AS avg_1h,
               count(*) OVER w AS n_1h
        FROM events
        WINDOW w AS (ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                     AND CURRENT ROW)
        ORDER BY event_id
        LIMIT 500
    """,
)
def rolling_1h_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cur = events.select(
        "event_id",
        "value",
        epoch_us(events, "ts").alias("tus"),
    ).withColumn("bk", F.floor(F.col("tus") / F.lit(_HOUR_US)))
    halo = cur.withColumn("bk", F.col("bk") + 1).withColumn(
        "halo", F.lit(True)
    )
    un = cur.withColumn("halo", F.lit(False)).unionByName(halo)
    w = (
        Window.partitionBy("bk")
        .orderBy("tus")
        .rangeBetween(-_HOUR_US, 0)
    )
    return (
        un.select(
            "event_id",
            F.round(F.avg("value").over(w), 6).alias("avg_1h"),
            F.count("*").over(w).alias("n_1h"),
            "halo",
        )
        .filter(~F.col("halo"))
        .drop("halo")
        .orderBy("event_id")
        .limit(500)
    )


# ---------------------------------------------------------------------------
# Date-function family (X5 generalized): parts, truncation, arithmetic.
# dayofweek dialects differ (Spark Sun=1; DuckDB Sun=0) — normalized to
# ISO weekday (Mon=0) on both sides.
# ---------------------------------------------------------------------------
@register(
    "date_functions",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate) AS y,
               quarter(o_orderdate) AS q,
               month(o_orderdate) AS m,
               day(o_orderdate) AS d,
               isodow(o_orderdate) - 1 AS iso_weekday,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
               datediff('day', o_orderdate, TIMESTAMP '2001-09-01') AS days_to_ref
        FROM orders
        WHERE o_orderkey < 200
        ORDER BY o_orderkey
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("y"),
            F.quarter("o_orderdate").cast("long").alias("q"),
            F.month("o_orderdate").cast("long").alias("m"),
            F.dayofmonth("o_orderdate").cast("long").alias("d"),
            F.weekday("o_orderdate").cast("long").alias("iso_weekday"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
            F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
            F.datediff(F.lit("2001-09-01").cast("timestamp"), F.col("o_orderdate")).cast("long").alias("days_to_ref"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Math-function family (X6 generalized): rounding, powers, logs, sign.
# ---------------------------------------------------------------------------
@register(
    "math_functions",
    oracle="""
        SELECT event_id,
               round(value, 1) AS v_round,
               CAST(ceil(value) AS BIGINT) AS v_ceil,
               CAST(floor(value) AS BIGINT) AS v_floor,
               abs(value - 50) AS v_absdiff,
               round(sqrt(value), 6) AS v_sqrt,
               round(ln(value + 1), 6) AS v_ln,
               round(pow(value, 2), 6) AS v_sq,
               CAST(sign(value - 50) AS DOUBLE) AS v_sign,
               greatest(value, 10.0) AS v_hi,
               least(value, 10.0) AS v_lo
        FROM events
        WHERE event_id < 300
        ORDER BY event_id
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return (
        events.filter(F.col("event_id") < 300)
        .select(
            "event_id",
            F.round(v, 1).alias("v_round"),
            F.ceil(v).alias("v_ceil"),
            F.floor(v).alias("v_floor"),
            F.abs(v - 50).alias("v_absdiff"),
            F.round(F.sqrt(v), 6).alias("v_sqrt"),
            F.round(F.log(v + 1), 6).alias("v_ln"),
            F.round(F.pow(v, 2), 6).alias("v_sq"),
            F.signum(v - 50).alias("v_sign"),
            F.greatest(v, F.lit(10.0)).alias("v_hi"),
            F.least(v, F.lit(10.0)).alias("v_lo"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Distribution window functions: percent_rank / cume_dist over grouped
# aggregates (completes the rank family from supplier_quantity_ranks).
# ---------------------------------------------------------------------------
@register(
    "distribution_ranks",
    oracle="""
        WITH s AS (
            SELECT l_suppkey, sum(l_extendedprice) AS total_price
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT l_suppkey, total_price,
               round(percent_rank() OVER (ORDER BY total_price, l_suppkey), 9) AS pr,
               round(cume_dist() OVER (ORDER BY total_price, l_suppkey), 9) AS cd
        FROM s
        ORDER BY l_suppkey
    """,
)
def distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_suppkey").agg(F.sum("l_extendedprice").alias("total_price"))
    w = Window.orderBy(F.col("total_price").asc(), F.col("l_suppkey").asc())
    return (
        s.select(
            "l_suppkey",
            "total_price",
            F.round(F.percent_rank().over(w), 9).alias("pr"),
            F.round(F.cume_dist().over(w), 9).alias("cd"),
        )
        .orderBy("l_suppkey")
    )


# ---------------------------------------------------------------------------
# ntile bucketing: customers quartiled by account balance within their
# market segment (equal-count tiles — the cohort-split window function,
# distinct from value-based quantiles).
# ---------------------------------------------------------------------------
@register(
    "ntile_balance_quartiles",
    oracle="""
        WITH t AS (
            SELECT c_mktsegment,
                   ntile(4) OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal, c_custkey) AS quartile,
                   c_acctbal
            FROM customer
        )
        SELECT c_mktsegment, quartile,
               count(*) AS n_customers,
               min(c_acctbal) AS min_bal,
               max(c_acctbal) AS max_bal
        FROM t
        GROUP BY c_mktsegment, quartile
        ORDER BY c_mktsegment, quartile
    """,
)
def ntile_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return (
        cust.select("c_mktsegment", F.ntile(4).over(w).cast("long").alias("quartile"), "c_acctbal")
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
        .orderBy("c_mktsegment", "quartile")
    )


# ---------------------------------------------------------------------------
# Pagination: deterministic ORDER BY + LIMIT/OFFSET (page 3 of 25).
# ---------------------------------------------------------------------------
@register(
    "pagination_page3",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        ORDER BY c_custkey
        LIMIT 25 OFFSET 50
    """,
)
def pagination_page3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_custkey", "c_name").orderBy("c_custkey").offset(50).limit(25)


# ---------------------------------------------------------------------------
# Array-function family over tokenized documents: contains, concat,
# flatten, zip_with, slice (engine's array-algebra surface).
# ---------------------------------------------------------------------------
@register(
    "array_functions",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ')[1:6] AS toks
            FROM documents WHERE doc_id < 30
        )
        SELECT doc_id,
               len(toks) AS n,
               list_contains(toks, 'data') AS has_data,
               array_to_string(toks[1:2] || toks[-2:], '|') AS ends,
               array_to_string(list_transform(toks, t -> length(t)), '|') AS tok_lens,
               CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS total_len
        FROM t
        ORDER BY doc_id
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Array outputs (`ends`, `tok_lens`) are '|'-joined to strings: the
    # driver's pandas canonicalizer can't hash list columns (r02 err).
    docs = load_table(spark, sf_dir, "documents")
    toks = F.slice(F.split("text", " "), 1, 6)
    tok_lens = F.transform(toks, lambda t: F.length(t))
    return (
        docs.filter(F.col("doc_id") < 30)
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n"),
            F.array_contains(toks, "data").alias("has_data"),
            F.array_join(
                F.concat(F.slice(toks, 1, 2), F.slice(toks, -2, 2)), "|"
            ).alias("ends"),
            F.array_join(
                F.transform(tok_lens, lambda x: x.cast("string")), "|"
            ).alias("tok_lens"),
            F.aggregate(tok_lens, F.lit(0), lambda a, x: a + x).cast("long").alias("total_len"),
        )
        .orderBy("doc_id")
    )
