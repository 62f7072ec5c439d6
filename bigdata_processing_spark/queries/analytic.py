"""Analytic queries: window functions, pivot, time-window aggregation.

Windows generalize the reference's global top-k (SURVEY.md §2.7 T1 — per
group instead of global) and the notebook's pandas pivot
(reference ``Codes/graphs.ipynb`` cell 7, R1/R2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.functions.temporal import epoch_us
from bigdata_processing_spark.queries import register


# ---------------------------------------------------------------------------
# Top-k per group via row_number window (generalizes reference top-10
# at etherTop10Contracts.py:68 from global to per-group; SURVEY.md step 5).
# ---------------------------------------------------------------------------
@register(
    "top3_orders_per_segment",
    oracle="""
        SELECT c_mktsegment, o_orderkey, o_totalprice, rn
        FROM (
            SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                   row_number() OVER (
                       PARTITION BY c.c_mktsegment
                       ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
                   ) AS rn
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        )
        WHERE rn <= 3
        ORDER BY c_mktsegment, rn
    """,
)
def top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


# ---------------------------------------------------------------------------
# Running / frame-spec window aggregates: cumulative sum + lag delta over
# the daily value series (SURVEY.md step 5 — lag/lead/sum over frames).
# ---------------------------------------------------------------------------
@register(
    "daily_value_running",
    oracle="""
        WITH daily AS (
            SELECT strftime(ts, '%Y-%m-%d') AS event_day, sum(value) AS day_value
            FROM events GROUP BY 1
        )
        SELECT event_day, day_value,
               sum(day_value) OVER (ORDER BY event_day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_value,
               day_value - lag(day_value) OVER (ORDER BY event_day) AS delta
        FROM daily
        ORDER BY event_day
    """,
)
def daily_value_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("event_day")
    ).agg(F.sum("value").alias("day_value"))
    w = Window.orderBy("event_day")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily
        .withColumn("running_value", F.sum("day_value").over(run))
        .withColumn("delta", F.col("day_value") - F.lag("day_value").over(w))
        .orderBy("event_day")
    )


# ---------------------------------------------------------------------------
# Offset/navigation window family: lead (next value), first/last value
# over an explicit frame, nth_value — per-user event navigation.
# ---------------------------------------------------------------------------
@register(
    "event_navigation_windows",
    oracle="""
        SELECT event_id, user_id, value,
               lead(value) OVER w AS next_value,
               lead(value, 2) OVER w AS next2_value,
               first_value(value) OVER w AS first_val,
               last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val,
               nth_value(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_val
        FROM events
        WHERE user_id < 20
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, event_id
    """,
)
def event_navigation_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # full-partition frame: last_value/nth_value default to the running
    # frame (CURRENT ROW upper bound), which is almost never what a
    # navigation query means — pin it explicitly
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        events.filter(F.col("user_id") < 20)
        .select(
            "event_id",
            "user_id",
            "value",
            F.lead("value").over(w).alias("next_value"),
            F.lead("value", 2).over(w).alias("next2_value"),
            F.first("value").over(w).alias("first_val"),
            F.last("value").over(full).alias("last_val"),
            F.nth_value("value", 3).over(full).alias("third_val"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# Rank with gaps + dense rank (window family completeness).
# ---------------------------------------------------------------------------
@register(
    "supplier_quantity_ranks",
    oracle="""
        WITH s AS (
            SELECT l_suppkey, sum(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT l_suppkey, total_qty,
               rank() OVER (ORDER BY total_qty DESC, l_suppkey ASC) AS qty_rank,
               dense_rank() OVER (ORDER BY total_qty DESC, l_suppkey ASC) AS qty_dense_rank,
               ntile(4) OVER (ORDER BY total_qty DESC, l_suppkey ASC) AS quartile
        FROM s
        ORDER BY qty_rank
    """,
)
def supplier_quantity_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_suppkey").agg(F.sum("l_quantity").alias("total_qty"))
    w = Window.orderBy(F.col("total_qty").desc(), F.col("l_suppkey").asc())
    return (
        s.withColumn("qty_rank", F.rank().over(w).cast("long"))
        .withColumn("qty_dense_rank", F.dense_rank().over(w).cast("long"))
        .withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .orderBy("qty_rank")
    )


# ---------------------------------------------------------------------------
# Pivot long→wide (reference notebook graphs.ipynb cell 7 pandas
# `unstack`; SURVEY.md §2.9 R2). Explicit pivot values keep the plan
# single-pass (no distinct-values pre-query) — at 100TB you always name
# the pivot columns.
# ---------------------------------------------------------------------------
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_daily_by_type",
    oracle="""
        SELECT strftime(ts, '%Y-%m-%d') AS event_day,
               sum(value) FILTER (event_type = 'click') AS click,
               sum(value) FILTER (event_type = 'error') AS error,
               sum(value) FILTER (event_type = 'purchase') AS purchase,
               sum(value) FILTER (event_type = 'signup') AS signup,
               sum(value) FILTER (event_type = 'view') AS view
        FROM events
        GROUP BY 1
        ORDER BY event_day
    """,
)
def pivot_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("event_day"))
        .pivot("event_type", EVENT_TYPES)
        .sum("value")
        .orderBy("event_day")
    )


# ---------------------------------------------------------------------------
# Tumbling time-window aggregation (batch analog of the streaming slice,
# SURVEY.md §2.11): 6-hour windows over events. Same window() expression
# works unchanged under readStream + watermark (see streaming/windows.py).
# ---------------------------------------------------------------------------
@register(
    "tumbling_window_6h",
    oracle="""
        SELECT epoch_us(time_bucket(INTERVAL 6 HOURS, ts)) AS window_start_us,
               count(*) AS n_events,
               sum(value) AS total_value
        FROM events
        GROUP BY 1
        ORDER BY window_start_us
    """,
)
def tumbling_window_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    agg = (
        events.groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )
    # window start as epoch micros — exact cross-engine compare, no
    # ns-vs-us pandas/arrow precision ambiguity (same convention as
    # session_windows_30m)
    return (
        agg.select(
            epoch_us(agg, "window_start").alias("window_start_us"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start_us")
    )


# ---------------------------------------------------------------------------
# Session windows in batch mode (streaming/windows.py::session_window_agg
# is the same expression under readStream): events within a 30-minute gap
# of each other merge into one per-user session. Oracle = the classic
# gaps-and-islands rewrite. Timestamps exported as epoch micros for an
# exact cross-engine compare.
# ---------------------------------------------------------------------------
@register(
    "session_windows_30m",
    oracle="""
        WITH g AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
            SELECT user_id, ts, value,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM g
        )
        SELECT user_id,
               epoch_us(min(ts)) AS session_start_us,
               epoch_us(max(ts) + INTERVAL 30 MINUTES) AS session_end_us,
               count(*) AS n_events,
               sum(value) AS total_value
        FROM s
        GROUP BY user_id, sid
        ORDER BY user_id, session_start_us
    """,
)
def session_windows_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_processing_spark.streaming.windows import session_window_agg

    events = load_table(spark, sf_dir, "events")
    sessions = session_window_agg(events, gap="30 minutes")
    return (
        sessions
        .select(
            "user_id",
            epoch_us(sessions, "session_start").alias("session_start_us"),
            epoch_us(sessions, "session_end").alias("session_end_us"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start_us")
    )
