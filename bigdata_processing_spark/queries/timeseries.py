"""Time-series & advanced-join queries: as-of join, equi+range join,
bucketed range join, exact quantiles, salted skew aggregation, typed
casts.

These extend the reference surface with the operators a time-series /
training-data workload needs (engine policy: compose from DataFrame ops
first — SURVEY.md §4 'custom Catalyst work needed: none')."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.functions.temporal import epoch_us
from bigdata_processing_spark.operators.asof import asof_join
from bigdata_processing_spark.operators.skew import salted_agg
from bigdata_processing_spark.queries import register
from bigdata_processing_spark.sources.writers import literal_df


# ---------------------------------------------------------------------------
# As-of join: for every purchase event, the user's most recent prior (or
# simultaneous) view event. Spark composition: union + window, ONE
# shuffle, no join product (operators/asof.py). DuckDB oracle: native
# ASOF LEFT JOIN.
# ---------------------------------------------------------------------------
@register(
    "asof_purchase_last_view",
    oracle="""
        SELECT p.event_id,
               p.user_id,
               epoch_us(p.ts) AS purchase_ts_us,
               v.event_id AS view_event_id,
               v.value AS view_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND v.ts <= p.ts
        ORDER BY p.event_id
    """,
)
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases,
        views,
        on="user_id",
        ts="ts",
        right_payload={"event_id": "view_event_id", "value": "view_value"},
    )
    return joined.select(
        "event_id",
        "user_id",
        epoch_us(joined, "ts").alias("purchase_ts_us"),
        "view_event_id",
        "view_value",
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Equi + range join: lineitems shipped within 90 days of their order's
# date. The equi key (orderkey) keeps the join hash/merge-partitioned —
# the range predicate rides along as a post-join filter condition, so
# this scales like any equi join.
# ---------------------------------------------------------------------------
@register(
    "shipped_within_90d",
    oracle="""
        SELECT o.o_orderstatus,
               count(*) AS n_lineitems,
               sum(l.l_extendedprice) AS total_price
        FROM lineitem l
        JOIN orders o
          ON l.l_orderkey = o.o_orderkey
         AND l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate < o.o_orderdate + INTERVAL 90 DAYS
        GROUP BY o.o_orderstatus
        ORDER BY o_orderstatus
    """,
)
def shipped_within_90d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate < F.date_add(orders.o_orderdate, 90))
    )
    return (
        li.join(orders, cond)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum("l_extendedprice").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Pure range join via the bucket rewrite: histogram of event values
# against a literal band table. A naive range join is a nested-loop
# product; binning each row to candidate buckets turns it into an equi
# join on bucket id — the 100TB-safe rewrite (band table broadcast).
# ---------------------------------------------------------------------------
_BANDS: list[tuple[int, float, float, str]] = [
    (0, 0.0, 10.0, "low"),
    (1, 10.0, 50.0, "mid"),
    (2, 50.0, 200.0, "high"),
    (3, 200.0, 1000.0, "extreme"),
]


@register(
    "range_join_value_bands",
    oracle="""
        WITH bands(band_id, lo, hi, band) AS (
            VALUES (0, 0.0, 10.0, 'low'), (1, 10.0, 50.0, 'mid'),
                   (2, 50.0, 200.0, 'high'), (3, 200.0, 1000.0, 'extreme')
        )
        SELECT b.band, count(*) AS n_events, sum(e.value) AS total_value
        FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        GROUP BY b.band
        ORDER BY band
    """,
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The bucket rewrite, not a nested-loop range join: each band expands
    # to the fixed-width buckets it covers (tiny, broadcast); each event
    # computes its bucket → hash equi-join on bucket + residual range
    # check. Turns O(rows × bands) condition evals into O(rows) probes —
    # measured 5× faster here and the only shape that survives when the
    # band table isn't tiny.
    bucket_w = 10.0
    events = load_table(spark, sf_dir, "events")
    bands = literal_df(spark, _BANDS, "band_id int, lo double, hi double, band string")
    band_buckets = bands.select(
        "band", "lo", "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / bucket_w).cast("int"),
                F.floor((F.col("hi") - 1e-9) / bucket_w).cast("int"),
            )
        ).alias("bucket"),
    )
    ev = events.withColumn("bucket", F.floor(F.col("value") / bucket_w).cast("int"))
    return (
        ev.join(F.broadcast(band_buckets), "bucket")
        .filter((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
        .groupBy("band")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# Exact quantiles (continuous interpolation) per group — the percentile
# family the reference lacked entirely (§2.6 'not present').
# ---------------------------------------------------------------------------
@register(
    "value_quantiles_by_type",
    oracle="""
        SELECT event_type,
               quantile_cont(value, 0.25) AS p25,
               quantile_cont(value, 0.50) AS p50,
               quantile_cont(value, 0.75) AS p75,
               quantile_cont(value, 0.95) AS p95
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def value_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # ONE percentile aggregate over an array of fractions: the group's
    # values are buffered/sorted once, not once per fraction (4 separate
    # F.percentile calls measured 2.1x slower at sf0.1)
    pct = F.percentile("value", F.array(*[F.lit(x) for x in (0.25, 0.50, 0.75, 0.95)]))
    return (
        events.groupBy("event_type")
        .agg(pct.alias("ps"))
        .select(
            "event_type",
            F.col("ps")[0].alias("p25"),
            F.col("ps")[1].alias("p50"),
            F.col("ps")[2].alias("p75"),
            F.col("ps")[3].alias("p95"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Approximate distinct — the sketch path for 100TB cardinality
# estimation. Uses the portable KMV sketch (operators/sketches.py) whose
# md5-derived hash any engine reproduces bit-for-bit, so unlike HLL
# (engine-internal registers; exercised in tests/test_operators.py) the
# estimate itself is oracle-checkable.
# ---------------------------------------------------------------------------
@register(
    "approx_distinct_users",
    oracle="""
        WITH h AS (
            SELECT DISTINCT event_type,
                   CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13) AS BIGINT)
                       / 4503599627370496.0 AS h
            FROM events
        ),
        r AS (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM h
        ),
        s AS (
            SELECT event_type, count(*) AS n_min, max(h) AS h_k
            FROM r WHERE rn <= 64 GROUP BY event_type
        ),
        x AS (
            SELECT event_type, count(DISTINCT user_id) AS exact_users
            FROM events GROUP BY event_type
        )
        SELECT s.event_type,
               CASE WHEN n_min < 64 THEN n_min::DOUBLE ELSE 63.0 / h_k END AS kmv_users,
               exact_users,
               abs(CASE WHEN n_min < 64 THEN n_min::DOUBLE ELSE 63.0 / h_k END - exact_users)
                   / exact_users AS rel_err
        FROM s JOIN x ON s.event_type = x.event_type
        ORDER BY s.event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct users per event type, with the exact count and the
    sketch's realized relative error alongside. The estimate is
    deterministic (md5-hash k-minimums), so the driver checks the sketch
    *value*, not just its plausibility."""
    from bigdata_processing_spark.operators.sketches import kmv_distinct

    events = load_table(spark, sf_dir, "events")
    est = kmv_distinct(events, "user_id", ["event_type"], k=64)
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            F.col("kmv_est").alias("kmv_users"),
            "exact_users",
            (F.abs(F.col("kmv_est") - F.col("exact_users")) / F.col("exact_users")).alias(
                "rel_err"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Salted skew aggregation: same answer as a plain groupBy (the oracle
# proves it), computed via two-stage salt — the pattern for power-law
# keys where one reducer would otherwise take the whole hot key.
# ---------------------------------------------------------------------------
@register(
    "salted_supplier_totals",
    oracle="""
        SELECT l_suppkey,
               sum(l_quantity) AS total_qty,
               count(*) AS n_items
        FROM lineitem
        GROUP BY l_suppkey
        ORDER BY l_suppkey
    """,
)
def salted_supplier_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        ["l_suppkey"],
        {"total_qty": ("sum", "l_quantity"), "n_items": ("count", "l_quantity")},
        n_salts=16,
    ).orderBy("l_suppkey")


# ---------------------------------------------------------------------------
# Typed-cast projections (reference X4 float/int casts, P7 stringified
# measures): exact-integer cents arithmetic and stable string keys.
# ---------------------------------------------------------------------------
@register(
    "typed_casts",
    oracle="""
        SELECT o_orderkey,
               round(o_totalprice * 100)::BIGINT AS price_cents,
               o_custkey::VARCHAR AS custkey_str,
               (o_totalprice >= 200000) AS is_large,
               to_json({'k': o_orderkey,
                        'cents': round(o_totalprice * 100)::BIGINT})::VARCHAR AS payload
        FROM orders
        WHERE o_orderkey < 100
        ORDER BY o_orderkey
    """,
)
def typed_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed casts (X4/P7) plus per-row JSON serialization (X8) in one
    checked row — ``payload`` round-trips the cast result through
    ``to_json`` with byte-identical rendering in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
            F.col("o_custkey").cast("string").alias("custkey_str"),
            (F.col("o_totalprice") >= 200000).alias("is_large"),
        )
        .withColumn(
            "payload",
            F.to_json(
                F.struct(
                    F.col("o_orderkey").alias("k"),
                    F.col("price_cents").alias("cents"),
                )
            ),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Batch gap-sessionization: the batch twin of the streaming session
# window (streaming/windows.py session_windows_30m) — lag + cumulative
# flag-sum assigns session ids, then a two-level rollup. The classic
# telemetry/clickstream shape.
# ---------------------------------------------------------------------------
SESSION_GAP_US = 1_800_000_000  # 30 min

# Shared sessionization CTEs: ONE definition of the gap rule / session-id
# assignment serves every session-scoped query (histogram, funnel) — the
# session boundary must never be allowed to drift between them.
_SQL_SESS = f"""e AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events
        ),
        flag AS (
            SELECT user_id, event_id, event_type, tus,
                   CASE WHEN lag(tus) OVER w IS NULL
                             OR tus - lag(tus) OVER w > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
        ),
        sess AS (
            SELECT user_id, event_type, tus,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM flag
        )"""


def _sessionized(ev: DataFrame) -> DataFrame:
    """(user_id, event_type, tus, sid) — the Spark twin of _SQL_SESS."""
    e = ev.select(
        "user_id", "event_id", "event_type", epoch_us(ev, "ts").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gap = F.col("tus") - F.lag("tus").over(w)
    return (
        e.withColumn(
            "new_s",
            F.when(gap.isNull() | (gap > SESSION_GAP_US), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .withColumn(
            "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .select("user_id", "event_type", "tus", "sid")
    )


@register(
    "sessionize_events",
    oracle=f"""
        WITH {_SQL_SESS},
        agg AS (
            SELECT user_id, sid, count(*) AS n_events,
                   max(tus) - min(tus) AS dur_us
            FROM sess GROUP BY user_id, sid
        )
        SELECT least(n_events, 10)::BIGINT AS events_per_session,
               count(*) AS n_sessions,
               count(DISTINCT user_id) AS n_users,
               avg(dur_us / 1e6) AS avg_duration_s
        FROM agg
        GROUP BY events_per_session
        ORDER BY events_per_session
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch: per user, a new session starts
    whenever the gap to the previous event exceeds 30 minutes (lag +
    running flag-sum), then sessions roll up into an events-per-session
    histogram (capped at 10+) with average duration. This is the batch
    twin of the streaming session window — run it to calibrate the gap
    before committing a streaming job to it.

    Scale shape: ONE shuffle on user_id serves both window functions and
    the (user_id, sid) aggregate (same partitioning, no re-shuffle); the
    final histogram is a tiny rollup. Ordering ties on ts are broken by
    event_id so session boundaries are deterministic across engines."""
    sess = _sessionized(load_table(spark, sf_dir, "events"))
    agg = sess.groupBy("user_id", "sid").agg(
        F.count("*").alias("n_events"),
        (F.max("tus") - F.min("tus")).alias("dur_us"),
    )
    return (
        agg.select(
            "user_id",
            F.least(F.col("n_events"), F.lit(10)).cast("long").alias("events_per_session"),
            "dur_us",
        )
        .groupBy("events_per_session")
        .agg(
            F.count("*").alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
            F.avg(F.col("dur_us") / 1e6).alias("avg_duration_s"),
        )
        .orderBy("events_per_session")
    )


# ---------------------------------------------------------------------------
# Skew diagnostics: the report you run BEFORE choosing a shuffle
# strategy (salting / AQE skew-join) — top hot keys with their share of
# total rows and their multiple of the average key's load.
# ---------------------------------------------------------------------------
@register(
    "hot_key_skew_report",
    oracle="""
        WITH k AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
        g AS (SELECT avg(n) AS avg_n, sum(n) AS total FROM k)
        SELECT user_id, n,
               round(n::DOUBLE / g.total, 6) AS share,
               round(n::DOUBLE / g.avg_n, 6) AS skew_factor
        FROM k CROSS JOIN g
        ORDER BY n DESC, user_id
        LIMIT 5
    """,
)
def hot_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 hottest shuffle keys with share-of-total and
    multiple-of-average-load — the input to the salting / AQE decision
    operators/skew.py encodes. One count shuffle on the key; the global
    denominators ride a broadcast 1-row cross join; top-k plans as
    TakeOrderedAndProject (no global sort)."""
    events = load_table(spark, sf_dir, "events")
    k = events.groupBy("user_id").agg(F.count("*").alias("n"))
    g = k.agg(
        F.avg("n").alias("avg_n"), F.sum("n").cast("double").alias("total")
    )
    return (
        k.crossJoin(F.broadcast(g))
        .select(
            "user_id",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
            F.round(F.col("n").cast("double") / F.col("avg_n"), 6).alias(
                "skew_factor"
            ),
        )
        .orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Winsorized statistics: clip each type's values at its own p01/p99 and
# report how much the mean moves — the robust-stats complement of the
# Tukey fences (which drop outliers; winsorizing caps them).
# ---------------------------------------------------------------------------
@register(
    "winsorized_value_stats",
    oracle="""
        WITH q AS (
            SELECT event_type,
                   quantile_cont(value, 0.01) AS p01,
                   quantile_cont(value, 0.99) AS p99
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               count(*) AS n,
               sum(CASE WHEN e.value < q.p01 OR e.value > q.p99 THEN 1 ELSE 0 END)::BIGINT
                   AS n_clipped,
               avg(e.value) AS mean_raw,
               avg(least(greatest(e.value, q.p01), q.p99)) AS mean_winsorized
        FROM events e JOIN q USING (event_type)
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorization audit: exact p01/p99 (one percentile
    aggregate per type — a tiny table), broadcast back onto the events
    stream, clip, and compare raw vs winsorized means. Two passes over
    events, both aggregation-only; no sort of the full data — the
    percentile buffers per (type) group, and types are few."""
    events = load_table(spark, sf_dir, "events")
    q = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.01)).alias("p01"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
    )
    j = events.join(F.broadcast(q), "event_type")
    clipped = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    out_of_range = F.when(
        (F.col("value") < F.col("p01")) | (F.col("value") > F.col("p99")), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        j.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(out_of_range).alias("n_clipped"),
            F.avg("value").alias("mean_raw"),
            F.avg(clipped).alias("mean_winsorized"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Regular-grid resampling with forward fill: the gap between event logs
# and time-series models (which want one row per (series, step), gaps
# filled). Grid generation is sequence+explode — data-driven, no driver
# loop; the fill is a running last-non-null window.
# ---------------------------------------------------------------------------
@register(
    "resample_hourly_ffill",
    oracle="""
        WITH e AS (
            SELECT event_type, epoch_us(ts) // 3600000000 AS h, value
            FROM events
        ),
        bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
        grid AS (
            SELECT t.event_type, gs.h
            FROM (SELECT DISTINCT event_type FROM e) t
            CROSS JOIN (
                SELECT unnest(generate_series((SELECT h0 FROM bounds),
                                              (SELECT h1 FROM bounds))) AS h
            ) gs
        ),
        obs AS (
            SELECT event_type, h, count(*) AS n_obs, avg(value) AS avg_v
            FROM e GROUP BY event_type, h
        )
        SELECT g.event_type, g.h AS hour_idx,
               coalesce(o.n_obs, 0)::BIGINT AS n_obs,
               last_value(o.avg_v IGNORE NULLS)
                   OVER (PARTITION BY g.event_type ORDER BY g.h
                         ROWS UNBOUNDED PRECEDING) AS value_ffill
        FROM grid g
        LEFT JOIN obs o ON g.event_type = o.event_type AND g.h = o.h
        ORDER BY g.event_type, hour_idx
    """,
)
def resample_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the event stream onto a dense hourly grid per type,
    forward-filling empty hours with the last observed hourly average
    (leading hours before a type's first observation stay NULL — no
    invented data). Hour indices are integer epoch-hour buckets, so the
    grid is timezone-proof and the grid join is an integer equi-join.

    Scale shape: the grid is types × hours — generated by
    sequence+explode off a broadcast 1-row bounds aggregate, never a
    driver loop; observations aggregate BEFORE joining the grid (the
    join is grid-sized, not event-sized); the fill is one running
    window per series, partition-parallel across series."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.floor(epoch_us(ev, "ts") / F.lit(3_600_000_000)).cast("long").alias("h"),
        "value",
    )
    bounds = e.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        e.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h"),
        )
    )
    obs = e.groupBy("event_type", "h").agg(
        F.count("*").alias("n_obs"), F.avg("value").alias("avg_v")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.col("h").alias("hour_idx"),
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs"),
            F.last("avg_v", ignorenulls=True).over(w).alias("value_ffill"),
        )
        .orderBy("event_type", "hour_idx")
    )


# ---------------------------------------------------------------------------
# Funnel analysis inside gap-sessions: of the sessions that VIEWED, how
# many went on to CLICK after the view, and then PURCHASE after the
# click — ordered-step conversion, the canonical product-analytics ask.
# Reuses the sessionization shuffle: window + per-session min-ts
# aggregate share the user_id partitioning.
# ---------------------------------------------------------------------------
@register(
    "session_funnel",
    oracle=f"""
        WITH {_SQL_SESS},
        steps AS (
            SELECT user_id, sid,
                   min(CASE WHEN event_type = 'view' THEN tus END) AS t_view,
                   min(CASE WHEN event_type = 'click' THEN tus END) AS t_click,
                   min(CASE WHEN event_type = 'purchase' THEN tus END) AS t_buy
            FROM sess GROUP BY user_id, sid
        )
        SELECT count(*) AS n_sessions,
               sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS viewed,
               sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                        THEN 1 ELSE 0 END)::BIGINT AS clicked_after_view,
               sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                             AND t_buy > t_click
                        THEN 1 ELSE 0 END)::BIGINT AS purchased_after_click
        FROM steps
    """,
)
def session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view → click → purchase conversion counted per
    gap-session: a step counts only if its first occurrence follows the
    previous step's first occurrence inside the SAME session (NULL
    comparisons fall out false in both engines, so sessions missing a
    step never count). Same single user_id exchange as
    sessionize_events; the funnel itself is a global 1-row rollup."""
    sess = _sessionized(load_table(spark, sf_dir, "events"))
    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("tus")))
    steps = sess.groupBy("user_id", "sid").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_buy"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    bought = clicked & (F.col("t_buy") > F.col("t_click"))
    as_int = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return steps.agg(
        F.count("*").alias("n_sessions"),
        as_int(viewed).alias("viewed"),
        as_int(clicked).alias("clicked_after_view"),
        as_int(bought).alias("purchased_after_click"),
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly screen on the hourly series: each hour scored
# against the TRAILING 24-hour window (exclusive of itself — the value
# under test must not contaminate its own baseline). The monitoring
# query a pipeline runs over ingest-volume / metric series.
# ---------------------------------------------------------------------------
@register(
    "anomalous_hours_by_type",
    oracle="""
        WITH e AS (
            SELECT event_type, epoch_us(ts) // 3600000000 AS h, value
            FROM events
        ),
        obs AS (
            SELECT event_type, h, avg(value) AS v
            FROM e GROUP BY event_type, h
        ),
        stats AS (
            SELECT event_type, h, v,
                   avg(v) OVER w AS mu,
                   stddev_samp(v) OVER w AS sd,
                   count(*) OVER w AS n_win
            FROM obs
            WINDOW w AS (PARTITION BY event_type ORDER BY h
                         ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_type,
               count(*) AS n_hours,
               sum(CASE WHEN n_win >= 12 AND sd > 1e-9
                             AND round(abs((v - mu) / sd), 6) > 2.0
                        THEN 1 ELSE 0 END)::BIGINT AS n_anomalous,
               max(CASE WHEN n_win >= 12 AND sd > 1e-9
                        THEN round(abs((v - mu) / sd), 6) END) AS max_abs_z
        FROM stats
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def anomalous_hours_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose mean value sits more than 2 trailing-window standard
    deviations from the previous 24 hours' mean, per type — warm-up
    hours (window < 12 obs) and flat windows (sd ~ 0) never flag. The
    z-score is rounded before the threshold compare so the flag
    decision is stable against float summation-order differences
    between engines.

    Scale shape: raw events collapse to (type, hour) BEFORE any window
    (the rolling stats run over series-length rows, not event-length);
    one shuffle keyed on type serves the window and the final rollup."""
    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.select(
            "event_type",
            F.floor(epoch_us(ev, "ts") / F.lit(3_600_000_000)).cast("long").alias("h"),
            "value",
        )
        .groupBy("event_type", "h")
        .agg(F.avg("value").alias("v"))
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    stats = obs.select(
        "event_type",
        "h",
        "v",
        F.avg("v").over(w).alias("mu"),
        F.stddev_samp("v").over(w).alias("sd"),
        F.count("*").over(w).alias("n_win"),
    )
    ok = (F.col("n_win") >= 12) & (F.col("sd") > 1e-9)
    z = F.round(F.abs((F.col("v") - F.col("mu")) / F.col("sd")), 6)
    return (
        stats.groupBy("event_type")
        .agg(
            F.count("*").alias("n_hours"),
            F.sum(F.when(ok & (z > 2.0), 1).otherwise(0)).alias("n_anomalous"),
            F.max(F.when(ok, z)).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Windowed event dedup (batch twin of streaming
# dropDuplicatesWithinWatermark): a (user, type) event is a re-delivery
# if the SAME key fired within the previous 5 minutes; only the first
# of such a burst survives. lag over the key partition — one shuffle.
# ---------------------------------------------------------------------------
DEDUP_WINDOW_US = 300_000_000  # 5 min


@register(
    "windowed_event_dedup",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_type, event_id, epoch_us(ts) AS tus FROM events
        ),
        flag AS (
            SELECT event_type,
                   CASE WHEN lag(tus) OVER w IS NULL
                             OR tus - lag(tus) OVER w > {DEDUP_WINDOW_US}
                        THEN 1 ELSE 0 END AS keep
            FROM e WINDOW w AS (PARTITION BY user_id, event_type
                                ORDER BY tus, event_id)
        )
        SELECT event_type,
               count(*) AS n_events,
               sum(keep)::BIGINT AS n_kept,
               (count(*) - sum(keep))::BIGINT AS n_dropped
        FROM flag
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def windowed_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppress re-deliveries: an event whose (user, type) key fired
    within the previous 5 minutes is a duplicate; the first of each
    burst survives. This is the BATCH definition of the streaming
    dropDuplicatesWithinWatermark contract (tests/test_streaming.py) —
    run it to size the dedup window and forecast state volume before
    deploying the stream. One shuffle on the key serves the lag window
    and the rollup."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_type", "event_id", epoch_us(ev, "ts").alias("tus")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("tus", "event_id")
    gap = F.col("tus") - F.lag("tus").over(w)
    keep = F.when(gap.isNull() | (gap > DEDUP_WINDOW_US), 1).otherwise(0)
    return (
        e.select("event_type", keep.alias("keep"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("keep").alias("n_kept"),
            (F.count("*") - F.sum("keep")).alias("n_dropped"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Month-over-month deltas ON an aggregate: lag applied to the rolled-up
# series (12-ish rows), not raw orders — the standard reporting idiom.
# ---------------------------------------------------------------------------
@register(
    "monthly_revenue_mom_change",
    oracle="""
        WITH m AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   sum(o_totalprice) AS revenue
            FROM orders GROUP BY month
        )
        SELECT month, revenue,
               lag(revenue) OVER (ORDER BY month) AS prev_revenue,
               round((revenue - lag(revenue) OVER (ORDER BY month))
                     / lag(revenue) OVER (ORDER BY month) * 100, 6) AS pct_change
        FROM m
        ORDER BY month
    """,
)
def monthly_revenue_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue change: aggregate first (months ≪
    orders), THEN window over the tiny series — the lag never touches
    raw rows, so the global-ordering window is harmless at any scale.
    First month's change is NULL (no fabricated baseline)."""
    orders = load_table(spark, sf_dir, "orders")
    m = (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return (
        m.select(
            "month",
            "revenue",
            prev.alias("prev_revenue"),
            F.round((F.col("revenue") - prev) / prev * 100, 6).alias("pct_change"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Count-min sketch audit (operators/sketches.py): per-user CMS count
# estimate next to the exact count. Like the KMV query above, the
# sketch hash is the portable 52-bit md5 integer, so DuckDB rebuilds
# the identical d×w counter matrix and the driver hash-checks the
# *estimates themselves*, not just their plausibility. The overestimate
# column is the CMS guarantee made visible: never negative, expected
# ≈ N/width under the min of depth rows.
# ---------------------------------------------------------------------------
@register(
    "cms_overestimate_audit",
    oracle="""
        WITH seeds AS (SELECT unnest([0, 1, 2]) AS i),
        cells AS (
            SELECT s.i,
                   CAST('0x' || substr(md5(CAST(e.user_id AS VARCHAR) || ':' ||
                        CAST(s.i AS VARCHAR)), 1, 13) AS BIGINT) % 256 AS b,
                   count(*) AS c
            FROM events e CROSS JOIN seeds s
            GROUP BY 1, 2
        ),
        probes AS (SELECT DISTINCT user_id FROM events),
        pc AS (
            SELECT p.user_id, s.i,
                   CAST('0x' || substr(md5(CAST(p.user_id AS VARCHAR) || ':' ||
                        CAST(s.i AS VARCHAR)), 1, 13) AS BIGINT) % 256 AS b
            FROM probes p CROSS JOIN seeds s
        ),
        est AS (
            SELECT pc.user_id, min(cells.c) AS cms_est
            FROM pc JOIN cells USING (i, b)
            GROUP BY 1
        ),
        exact AS (SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY 1)
        SELECT est.user_id, exact_cnt, cms_est,
               cms_est - exact_cnt AS overestimate
        FROM est JOIN exact USING (user_id)
        ORDER BY user_id
    """,
)
def cms_overestimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_processing_spark.operators.sketches import cms_estimates

    events = load_table(spark, sf_dir, "events")
    probes = events.select("user_id").distinct()
    est = cms_estimates(events, "user_id", probes)
    exact = events.groupBy("user_id").agg(F.count("*").alias("exact_cnt"))
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch audit (operators/sketches.bottomk_sample):
# per-type value quantiles estimated from the DETERMINISTIC 256-row
# bottom-k-by-md5 sample next to the exact percentiles. The quantile
# member of the portable-sketch family — like KMV and CMS, DuckDB picks
# the IDENTICAL sample rows, so the estimates themselves hash-match,
# and the error columns show the realized ±O(1/√k) rank error.
# ---------------------------------------------------------------------------
_QSK_K = 256


@register(
    "quantile_sketch_audit",
    oracle=f"""
        WITH h AS (
            SELECT event_type, value,
                   CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 13)
                        AS BIGINT) / 4503599627370496.0 AS hh
            FROM events
        ),
        samp AS (
            SELECT event_type, value FROM (
                SELECT *, row_number() OVER (PARTITION BY event_type
                                             ORDER BY hh) AS rn
                FROM h
            ) WHERE rn <= {_QSK_K}
        ),
        est AS (
            SELECT event_type,
                   quantile_cont(value, 0.5) AS p50_est,
                   quantile_cont(value, 0.9) AS p90_est
            FROM samp GROUP BY event_type
        ),
        exact AS (
            SELECT event_type, count(*) AS n_rows,
                   quantile_cont(value, 0.5) AS p50,
                   quantile_cont(value, 0.9) AS p90
            FROM events GROUP BY event_type
        )
        SELECT exact.event_type AS event_type, n_rows,
               round(p50, 6) AS p50, round(p50_est, 6) AS p50_est,
               round(abs(p50_est - p50), 6) AS p50_err,
               round(p90, 6) AS p90, round(p90_est, 6) AS p90_est,
               round(abs(p90_est - p90), 6) AS p90_err
        FROM exact JOIN est ON exact.event_type = est.event_type
        ORDER BY event_type
    """,
)
def quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_processing_spark.operators.sketches import bottomk_sample

    events = load_table(spark, sf_dir, "events")
    samp = bottomk_sample(events, "event_id", ["event_type"], k=_QSK_K)
    est = samp.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50_est"),
        F.expr("percentile(value, 0.9)").alias("p90_est"),
    )
    exact = events.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
    )
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "n_rows",
            F.round("p50", 6).alias("p50"),
            F.round("p50_est", 6).alias("p50_est"),
            F.round(F.abs(F.col("p50_est") - F.col("p50")), 6).alias("p50_err"),
            F.round("p90", 6).alias("p90"),
            F.round("p90_est", 6).alias("p90_est"),
            F.round(F.abs(F.col("p90_est") - F.col("p90")), 6).alias("p90_err"),
        )
        .orderBy("event_type")
    )
