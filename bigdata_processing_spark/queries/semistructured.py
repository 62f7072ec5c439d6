"""Semi-structured queries: JSON parsing, struct/map field extraction,
array and map-entry explode.

Reference analogs: scams.json per-line ``json.loads`` + dict unnest +
address-array flatMap (reference ``Codes/etherscams/etherscams.py:45-49``;
SURVEY.md §2.4 U1/U2, §2.8 X7). Here JSON parsing is ``from_json`` with a
declared schema — parsed JVM-side inside codegen, not per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, MapType, StringType, StructField, StructType

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.queries import register

PROPS_SCHEMA = StructType([StructField("k", LongType())])


# ---------------------------------------------------------------------------
# JSON field extraction with declared schema (X7/P9 analog — the
# reference parsed each scams.json line into dicts; etherscams.py:46-48).
# ---------------------------------------------------------------------------
@register(
    "json_props_extract",
    oracle="""
        SELECT (props::JSON ->> 'k')::BIGINT % 10 AS k_bucket,
               count(*) AS n_events,
               sum(value) AS total_value
        FROM events
        GROUP BY 1
        ORDER BY k_bucket
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events
        .withColumn("props_s", F.from_json("props", PROPS_SCHEMA))
        .groupBy((F.col("props_s.k") % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .orderBy("k_bucket")
    )


# ---------------------------------------------------------------------------
# Map-entries explode (U1 analog — scams.json dict-of-records flatMap at
# etherscams.py:48): parse props as map<string,long>, explode entries.
# ---------------------------------------------------------------------------
@register(
    "map_entries_explode",
    oracle="""
        SELECT key AS prop_key,
               count(*) AS n_events,
               CAST(sum((props::JSON ->> key)::BIGINT) AS BIGINT) AS total_v
        FROM (
            SELECT unnest(json_keys(props::JSON)) AS key, props
            FROM events
        )
        GROUP BY 1
        ORDER BY prop_key
    """,
)
def map_entries_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn(
        "props_m", F.from_json("props", MapType(StringType(), LongType()))
    )
    return (
        parsed.select(F.explode("props_m").alias("prop_key", "prop_value"))
        .groupBy("prop_key")
        .agg(F.count("*").alias("n_events"), F.sum("prop_value").alias("total_v"))
        .orderBy("prop_key")
    )


# ---------------------------------------------------------------------------
# Array explode (U2 analog — per-scam address array flatMap at
# etherscams.py:49): tokenize documents, explode, top-20 token counts.
# ---------------------------------------------------------------------------
@register(
    "explode_token_counts",
    oracle="""
        SELECT tok AS token, count(*) AS n,
               CAST(min(pos) - 1 AS BIGINT) AS min_pos
        FROM (
            SELECT unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents
        )
        WHERE tok <> ''
        GROUP BY tok
        ORDER BY n DESC, token ASC
        LIMIT 20
    """,
)
def explode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode with position (posexplode — U2 both idioms in one
    driver-checked query): top-20 tokens with occurrence counts and the
    earliest position each token appears at."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(
            F.count("*").alias("n"),
            F.min("pos").cast("long").alias("min_pos"),
        )
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# posexplode — positional unnest (engine extension of U2): first 3 tokens
# of each doc with their position, re-aggregated into per-position
# vocabulary sizes.
# ---------------------------------------------------------------------------
@register(
    "positional_tokens",
    oracle="""
        SELECT pos - 1 AS pos, count(DISTINCT tok) AS vocab, count(*) AS n
        FROM (
            SELECT unnest(string_split(text, ' ')[1:3]) AS tok,
                   generate_subscripts(string_split(text, ' ')[1:3], 1) AS pos
            FROM documents
        )
        GROUP BY 1
        ORDER BY pos
    """,
)
def positional_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.posexplode(F.slice(F.split("text", " "), 1, 3)).alias("pos", "tok")
        )
        .withColumn("pos", F.col("pos").cast("long"))
        .groupBy("pos")
        .agg(F.countDistinct("tok").alias("vocab"), F.count("*").alias("n"))
        .orderBy("pos")
    )


# ---------------------------------------------------------------------------
# VARIANT-typed semi-structured access (Spark 4): parse once into the
# binary variant encoding, path-extract with variant_get. Unlike
# from_json, VARIANT needs no declared schema and keeps nested structure
# shredded-columnar at rest — the open-schema ingestion posture for
# event streams whose payload drifts. Values here equal the schema-
# declared extraction (json_props_extract), which is the point: same
# answers without pre-declaring the payload shape.
# ---------------------------------------------------------------------------
@register(
    "variant_props_quartiles",
    oracle="""
        SELECT (props::JSON ->> 'k')::BIGINT // 25 AS k_quartile,
               count(*) AS n_events,
               min((props::JSON ->> 'k')::BIGINT) AS k_min,
               max((props::JSON ->> 'k')::BIGINT) AS k_max,
               sum(value) AS total_value
        FROM events
        GROUP BY 1
        ORDER BY k_quartile
    """,
)
def variant_props_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        events.select(F.floor(k / 25).alias("k_quartile"), k.alias("k"), "value")
        .groupBy("k_quartile")
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum("value").alias("total_value"),
        )
        .orderBy("k_quartile")
    )
