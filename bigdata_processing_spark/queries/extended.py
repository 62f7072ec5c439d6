"""Extended relational coverage: scalar-function families, null
handling, statistical aggregates, cube, sorted list aggregation,
unpivot, deterministic sampling, rollup reuse.

Rounds out SURVEY.md §2.6/§2.8's "engine exposes via built-ins" items
and adds the sampling/splitting operators a training-data pipeline needs
(deterministic hash sampling — reproducible across engines and runs,
unlike seeded RNG sampling which is engine-specific)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.functions import text as T
from bigdata_processing_spark.queries import register


# ---------------------------------------------------------------------------
# String-function family (X1-X3 generalized): one pass exercising the
# common scalar string ops with identical semantics in both engines.
# ---------------------------------------------------------------------------
@register(
    "string_functions",
    oracle="""
        SELECT c_custkey,
               upper(c_mktsegment) AS seg_upper,
               lower(c_name) AS name_lower,
               lpad(c_custkey::VARCHAR, 10, '0') AS key_padded,
               substr(c_name, 10, 5) AS name_mid,
               replace(c_name, 'Customer', 'C') AS name_short,
               left(c_mktsegment, 3) AS seg3,
               reverse(c_mktsegment) AS seg_rev,
               length(c_name) AS name_len,
               instr(c_name, '#') AS hash_pos,
               concat(c_mktsegment, '/', c_custkey::VARCHAR) AS seg_key
        FROM customer
        WHERE c_custkey < 50
        ORDER BY c_custkey
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.filter(F.col("c_custkey") < 50)
        .select(
            "c_custkey",
            F.upper("c_mktsegment").alias("seg_upper"),
            F.lower("c_name").alias("name_lower"),
            F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
            F.substring("c_name", 10, 5).alias("name_mid"),
            F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias("name_short"),
            F.left(F.col("c_mktsegment"), F.lit(3)).alias("seg3"),
            F.reverse("c_mktsegment").alias("seg_rev"),
            F.length("c_name").cast("long").alias("name_len"),
            F.instr(F.col("c_name"), "#").cast("long").alias("hash_pos"),
            F.concat_ws("/", "c_mktsegment", F.col("c_custkey").cast("string")).alias("seg_key"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Null-handling family: coalesce / nullif / null-aware aggregation.
# ---------------------------------------------------------------------------
@register(
    "null_handling",
    oracle="""
        WITH x AS (
            SELECT c_custkey,
                   nullif(c_mktsegment, 'MACHINERY') AS seg_or_null,
                   CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_pos
            FROM customer
        )
        SELECT coalesce(seg_or_null, '(machinery)') AS segment,
               count(*) AS n_total,
               count(bal_pos) AS n_pos,
               sum(coalesce(bal_pos, 0)) AS total_pos_bal
        FROM x
        GROUP BY 1
        ORDER BY segment
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    x = cust.select(
        F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg_or_null"),
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal_pos"),
    )
    return (
        x.groupBy(F.coalesce("seg_or_null", F.lit("(machinery)")).alias("segment"))
        .agg(
            F.count("*").alias("n_total"),
            F.count("bal_pos").alias("n_pos"),
            F.sum(F.coalesce("bal_pos", F.lit(0.0))).alias("total_pos_bal"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Statistical aggregates (§2.6 "not present; engine exposes"):
# stddev/variance (sample + population).
# ---------------------------------------------------------------------------
@register(
    "value_statistics",
    oracle="""
        SELECT event_type,
               stddev_samp(value) AS sd_samp,
               stddev_pop(value) AS sd_pop,
               var_samp(value) AS var_s,
               min(value) AS v_min,
               max(value) AS v_max
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def value_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.stddev_samp("value").alias("sd_samp"),
            F.stddev_pop("value").alias("sd_pop"),
            F.var_samp("value").alias("var_s"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Cube (full grouping-sets lattice; rollup already covered).
# ---------------------------------------------------------------------------
@register(
    "cube_status_priority",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders, sum(o_totalprice) AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("total_price"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# Sorted list aggregation (collect_list/set made deterministic via
# array_sort — unordered collect is not a well-defined query result).
# The list is serialized to a '|'-joined string so the output schema is
# flat: the round-2 driver's pandas canonicalizer cannot hash
# array-typed columns (CORRECTNESS_r02 `unhashable type: 'list'`).
# ---------------------------------------------------------------------------
@register(
    "collect_sorted_lists",
    oracle="""
        SELECT n_regionkey,
               array_to_string(list_sort(list(n_name)), '|') AS nations,
               len(list(n_name)) AS n_nations
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey
    """,
)
def collect_sorted_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias(
                "nations"
            ),
            F.count("n_name").alias("n_nations"),
        )
        .orderBy("n_regionkey")
    )


# ---------------------------------------------------------------------------
# Unpivot / melt (inverse of R2's pivot — SURVEY.md §2.9).
# ---------------------------------------------------------------------------
@register(
    "unpivot_segment_metrics",
    oracle="""
        SELECT * FROM (
            SELECT c_mktsegment,
                   avg(c_acctbal) AS avg_bal,
                   max(c_acctbal) AS max_bal,
                   min(c_acctbal) AS min_bal
            FROM customer GROUP BY 1
        ) UNPIVOT (v FOR metric IN (avg_bal, max_bal, min_bal))
        ORDER BY c_mktsegment, metric
    """,
)
def unpivot_segment_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    wide = cust.groupBy("c_mktsegment").agg(
        F.avg("c_acctbal").alias("avg_bal"),
        F.max("c_acctbal").alias("max_bal"),
        F.min("c_acctbal").alias("min_bal"),
    )
    return wide.unpivot(
        ["c_mktsegment"], ["avg_bal", "max_bal", "min_bal"], "metric", "v"
    ).orderBy("c_mktsegment", "metric")


# ---------------------------------------------------------------------------
# Structured extraction via regexp groups: pull the numeric id out of
# the formatted customer name and validate it against the key column —
# the schema-repair / field-extraction pattern over messy text.
# ---------------------------------------------------------------------------
@register(
    "regexp_extract_ids",
    oracle="""
        SELECT (regexp_extract(c_name, '#(0*)([1-9][0-9]*)', 2) = c_custkey::VARCHAR
                OR (c_custkey = 0 AND c_name LIKE '%#000000000')) AS id_matches,
               count(*) AS n
        FROM customer
        GROUP BY 1
        ORDER BY id_matches
    """,
)
def regexp_extract_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    extracted = F.regexp_extract(F.col("c_name"), "#(0*)([1-9][0-9]*)", 2)
    matches = (extracted == F.col("c_custkey").cast("string")) | (
        (F.col("c_custkey") == 0) & F.col("c_name").endswith("#000000000")
    )
    return (
        cust.groupBy(matches.alias("id_matches"))
        .agg(F.count("*").alias("n"))
        .orderBy("id_matches")
    )


# ---------------------------------------------------------------------------
# JSON serialization sink shape (reference X8 — json.dumps before the
# boto3 put, etherTransactionsAnalysis.py:63): to_json over a struct,
# JVM-side. Integer/string fields keep cross-engine rendering exact.
# ---------------------------------------------------------------------------
@register(
    "json_serialize",
    oracle="""
        SELECT event_type,
               to_json({'type': event_type,
                        'n': count(*),
                        'total_cents': round(sum(value) * 100)::BIGINT})::VARCHAR AS payload
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value") * 100).cast("bigint").alias("total_cents"),
        )
        .select(
            "event_type",
            F.to_json(
                F.struct(
                    F.col("event_type").alias("type"),
                    F.col("n"),
                    F.col("total_cents"),
                )
            ).alias("payload"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Ordered first/last + boolean aggregates (§2.6 family completeness).
# ---------------------------------------------------------------------------
@register(
    "first_last_bool_aggs",
    oracle="""
        SELECT o_orderstatus,
               first(o_orderkey ORDER BY o_orderdate, o_orderkey) AS first_key,
               last(o_orderkey ORDER BY o_orderdate, o_orderkey) AS last_key,
               bool_or(o_totalprice > 400000) AS any_large,
               bool_and(o_totalprice > 0) AS all_positive
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
)
def first_last_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # Spark's first()/last() are order-undefined within a group; the
    # deterministic equivalents are min_by/max_by over the sort key.
    sort_key = F.struct("o_orderdate", "o_orderkey")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.min_by("o_orderkey", sort_key).alias("first_key"),
            F.max_by("o_orderkey", sort_key).alias("last_key"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_large"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Deterministic hash sampling — the training-data split primitive.
# Seeded RNG sampling is engine-specific; hashing a stable id is
# reproducible everywhere, composable (disjoint buckets = disjoint
# splits) and cluster-order-independent.
# ---------------------------------------------------------------------------
@register(
    "hash_sample_10pct",
    oracle="""
        SELECT count(*) AS n_sampled,
               sum(value) AS total_value,
               count(DISTINCT user_id) AS n_users
        FROM events
        WHERE ('0x' || substr(md5('s|' || event_id), 1, 8))::BIGINT % 100 < 10
    """,
)
def hash_sample_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bucket = T.hash64(F.col("event_id").cast("string"), "s") % 100
    return events.filter(bucket < 10).agg(
        F.count("*").alias("n_sampled"),
        F.sum("value").alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Deterministic train/test split summary over documents (90/10 by
# fingerprint hash — splitting on CONTENT hash keeps exact dups in the
# same split, the correct train/test hygiene).
# ---------------------------------------------------------------------------
@register(
    "train_test_split",
    oracle="""
        WITH tagged AS (
            SELECT lang,
                   CASE WHEN ('0x' || substr(md5('split|' ||
                            md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))), 1, 8))::BIGINT
                            % 10 < 9
                        THEN 'train' ELSE 'test' END AS split
            FROM documents
        )
        SELECT lang, split, count(*) AS n_docs
        FROM tagged
        GROUP BY lang, split
        ORDER BY lang, split
    """,
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = T.hash64(T.fingerprint(F.col("text")), "split") % 10
    return (
        docs.select(
            "lang",
            F.when(bucket < 9, F.lit("train")).otherwise(F.lit("test")).alias("split"),
        )
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "split")
    )


# ---------------------------------------------------------------------------
# Stratified sampling: exactly k rows per group, deterministic order —
# window row_number over a hash-ordered partition.
# ---------------------------------------------------------------------------
@register(
    "stratified_sample_5_per_type",
    oracle="""
        SELECT event_type, event_id, rn FROM (
            SELECT event_type, event_id,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY ('0x' || substr(md5('strat|' || event_id), 1, 8))::BIGINT,
                                event_id
                   ) AS rn
            FROM events
        )
        WHERE rn <= 5
        ORDER BY event_type, rn
    """,
)
def stratified_sample_5_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    h = T.hash64(F.col("event_id").cast("string"), "strat")
    w = Window.partitionBy("event_type").orderBy(h.asc(), F.col("event_id").asc())
    return (
        events.select("event_type", "event_id")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .orderBy("event_type", "rn")
    )


# ---------------------------------------------------------------------------
# Rollup reuse (hypertable-style continuous aggregate): the monthly
# series is computed FROM the daily rollup, not from raw events —
# aggregate-of-aggregate correctness is the invariant the oracle checks.
# ---------------------------------------------------------------------------
@register(
    "monthly_from_daily_rollup",
    oracle="""
        WITH daily AS (
            SELECT strftime(ts, '%Y-%m-%d') AS d,
                   count(*) AS n, sum(value) AS v
            FROM events GROUP BY 1
        )
        SELECT substr(d, 1, 7) AS event_month,
               CAST(sum(n) AS BIGINT) AS n_events,
               sum(v) AS total_value,
               sum(v) / sum(n) AS avg_value
        FROM daily
        GROUP BY 1
        ORDER BY event_month
    """,
)
def monthly_from_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("d")).agg(
        F.count("*").alias("n"), F.sum("value").alias("v")
    )
    return (
        daily.groupBy(F.substring("d", 1, 7).alias("event_month"))
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("v").alias("total_value"),
            (F.sum("v") / F.sum("n")).alias("avg_value"),
        )
        .orderBy("event_month")
    )


# ---------------------------------------------------------------------------
# Exact-decimal money mode (SURVEY.md §1.3 / §7 risk register): wei-scale
# integers exceed int64 (the reference accepted float error parsing wei
# with float() — Codes/etherTransactionsAnalysis.py value handling);
# DecimalType(38,0) carries them exactly through sums, and DuckDB's
# HUGEINT oracle proves the aggregation is exact, not approximated. The
# totals are rendered as strings because the *digits* are the assertion.
# ---------------------------------------------------------------------------
@register(
    "wei_decimal_topk",
    oracle="""
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT) * 1000000000000) AS VARCHAR)
                   AS wei_total,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_custkey
        ORDER BY sum(CAST(round(o_totalprice * 100) AS HUGEINT) * 1000000000000) DESC,
                 o_custkey
        LIMIT 10
    """,
)
def wei_decimal_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by an exact wei-scale total: cents × 10^12 puts
    single rows above int64 range (~5e19), so a bigint or double sum
    would silently truncate or round — DecimalType(38,0) does not
    (pipelines/ethereum.exact_value_mode is the same mode applied to the
    reference's transaction values)."""
    orders = load_table(spark, sf_dir, "orders")
    wei = F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)") * F.lit(
        1_000_000_000_000
    ).cast("decimal(38,0)")
    return (
        orders.groupBy("o_custkey")
        .agg(F.sum(wei).alias("wei_dec"), F.count("*").alias("n_orders"))
        .orderBy(F.col("wei_dec").desc(), F.col("o_custkey"))
        .limit(10)
        .select(
            "o_custkey",
            F.col("wei_dec").cast("string").alias("wei_total"),
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# Mergeable-sketch set algebra (operators/sketches.py): distinct-count
# estimates for two customer cohorts AND their union/intersection
# computed purely from the cohorts' KMV sketches — the union sketch is
# the k smallest of the two k-min sets (never a rescan of raw data),
# intersection by inclusion-exclusion. The portable md5 hash means
# DuckDB rebuilds the identical sketches, so all four estimates are
# hash-verified, each next to its exact count. At 100 TB this is the
# pattern for pre-aggregated per-partition/per-day sketches rolled up
# to arbitrary cohort combinations without touching the fact table.
# ---------------------------------------------------------------------------
@register(
    "kmv_set_algebra",
    oracle="""
        WITH tagged AS (
            SELECT CASE WHEN year(o_orderdate) = 1995 THEN 'y1995'
                        ELSE 'y1996' END AS tag, o_custkey
            FROM orders WHERE year(o_orderdate) IN (1995, 1996)
        ),
        h AS (
            SELECT DISTINCT tag,
                   CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 13) AS BIGINT)
                       / 4503599627370496.0 AS h
            FROM tagged
        ),
        mins AS (
            SELECT tag, h FROM (
                SELECT tag, h, row_number() OVER (PARTITION BY tag ORDER BY h) AS rn
                FROM h
            ) WHERE rn <= 256
        ),
        umins AS (
            SELECT 'union' AS tag, h FROM (
                SELECT h, row_number() OVER (ORDER BY h) AS rn
                FROM (SELECT DISTINCT h FROM mins)
            ) WHERE rn <= 256
        ),
        est AS (
            SELECT tag,
                   CASE WHEN count(*) < 256 THEN count(*)::DOUBLE
                        ELSE 255.0 / max(h) END AS kmv_est
            FROM (SELECT * FROM mins UNION ALL SELECT * FROM umins)
            GROUP BY tag
        ),
        est4 AS (
            SELECT * FROM est
            UNION ALL
            SELECT 'intersection',
                   sum(CASE WHEN tag = 'union' THEN -kmv_est ELSE kmv_est END)
            FROM est
        ),
        exact AS (
            SELECT 'y1995' AS tag, count(DISTINCT o_custkey) AS exact_distinct
            FROM orders WHERE year(o_orderdate) = 1995
            UNION ALL
            SELECT 'y1996', count(DISTINCT o_custkey)
            FROM orders WHERE year(o_orderdate) = 1996
            UNION ALL
            SELECT 'union', count(DISTINCT o_custkey)
            FROM orders WHERE year(o_orderdate) IN (1995, 1996)
            UNION ALL
            SELECT 'intersection', count(*) FROM (
                SELECT o_custkey FROM tagged
                GROUP BY 1 HAVING count(DISTINCT tag) = 2
            )
        )
        SELECT est4.tag AS set_name, kmv_est, exact_distinct
        FROM est4 JOIN exact ON est4.tag = exact.tag
        ORDER BY set_name
    """,
)
def kmv_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_processing_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_minset,
    )

    K = 256
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    tagged = orders.filter(yr.isin(1995, 1996)).select(
        F.when(yr == 1995, "y1995").otherwise("y1996").alias("tag"), "o_custkey"
    )
    ms = kmv_minset(tagged, "o_custkey", ["tag"], k=K)
    union_ms = kmv_merge(
        ms.select(F.lit("union").alias("tag"), "h"), ["tag"], K
    )
    est = kmv_estimate(ms.select("tag", "h").union(union_ms), ["tag"], K)
    inter = est.agg(
        F.sum(
            F.when(F.col("tag") == "union", -F.col("kmv_est")).otherwise(
                F.col("kmv_est")
            )
        ).alias("kmv_est")
    ).select(F.lit("intersection").alias("tag"), "kmv_est")
    est4 = est.union(inter)

    # exact legs in ONE pass (r12, guide §1.2/§2.4): the four cohort
    # counts are all functions of the per-custkey tag membership, so one
    # groupBy(custkey) + one tiny rollup replaces four scans of orders
    # (3× countDistinct + the HAVING leg) — integer counts, bit-exact:
    # distinct custkeys with y1995 = Σ has95, union = count(*) of the
    # key-grouped frame, intersection = Σ has95·has96.
    # null-key filter + coalesce (ADVICE r12): count(DISTINCT col)
    # excludes NULL keys and yields 0 on an empty cohort, where the
    # grouped-sum form would keep a NULL group / return NULL sums.
    # Unreachable with TPC-H data (o_custkey NOT NULL, both years
    # populated at every sf > 0) — alignment of degenerate-input
    # semantics with the oracle, not a behavior change.
    per_cust = tagged.filter(F.col("o_custkey").isNotNull()).groupBy("o_custkey").agg(
        F.max(F.when(F.col("tag") == "y1995", 1).otherwise(0)).alias("h95"),
        F.max(F.when(F.col("tag") == "y1996", 1).otherwise(0)).alias("h96"),
    )
    exact = per_cust.agg(
        F.coalesce(F.sum("h95"), F.lit(0)).alias("n95"),
        F.coalesce(F.sum("h96"), F.lit(0)).alias("n96"),
        F.count("*").alias("nu"),
        F.coalesce(F.sum(F.col("h95") * F.col("h96")), F.lit(0)).alias("ni"),
    ).select(
        F.expr(
            "stack(4, 'y1995', n95, 'y1996', n96, 'union', nu, "
            "'intersection', ni) AS (tag, exact_distinct)"
        )
    )
    return (
        est4.join(exact, "tag")
        .select(F.col("tag").alias("set_name"), "kmv_est", "exact_distinct")
        .orderBy("set_name")
    )
