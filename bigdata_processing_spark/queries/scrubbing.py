"""Corpus-preparation ops an LLM training pipeline runs before anything
else touches the text: PII redaction, URL/domain inventory, and
source-mixture weighting.

The fixture corpus is synthetic word-salad with no natural PII or URLs,
so the first two queries INJECT deterministic spans (email, phone, URL
derived from doc_id) into the text inside BOTH twins — the Spark side
and the SQL oracle build the identical augmented string, then the
redaction / extraction logic under test runs against real matches
instead of vacuous zero-hit data.

All regex work is JVM-side (``regexp_replace`` / ``regexp_extract_all``
inside whole-stage codegen) — per-doc string ops with no shuffle until
the final aggregate, the shape that scales to a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.queries import register

EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.com"
PHONE_RE = "555-[0-9]{4}"
URL_RE = "https://([a-z0-9.]+)/[a-z0-9/]*"


def _augmented(doc_id, text):
    """text + deterministic PII/URL spans (Spark twin of the SQL concat)."""
    return F.concat(
        text,
        F.lit(" contact user"), doc_id.cast("string"),
        F.lit("@example"), (doc_id % 7).cast("string"), F.lit(".com"),
        F.lit(" or 555-"), F.lpad((doc_id % 10000).cast("string"), 4, "0"),
        F.lit(" see https://w"), (doc_id % 13).cast("string"),
        F.lit(".mirror"), (doc_id % 5).cast("string"),
        F.lit(".org/p/"), doc_id.cast("string"),
    )


_SQL_AUG = """
        aug AS (
            SELECT doc_id, lang,
                   text || ' contact user' || doc_id
                        || '@example' || (doc_id % 7) || '.com'
                        || ' or 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                        || ' see https://w' || (doc_id % 13)
                        || '.mirror' || (doc_id % 5) || '.org/p/' || doc_id
                   AS t
            FROM documents
        )
"""


@register(
    "pii_redaction_stats",
    oracle=f"""
        WITH {_SQL_AUG}
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(len(regexp_extract_all(t, '{EMAIL_RE}'))) AS BIGINT) AS n_emails,
               CAST(sum(len(regexp_extract_all(t, '{PHONE_RE}'))) AS BIGINT) AS n_phones,
               CAST(sum(length(t) - length(
                   regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                                  '{PHONE_RE}', '<PHONE>', 'g'))) AS BIGINT)
                   AS bytes_redacted
        FROM aug
        GROUP BY lang
        ORDER BY lang
    """,
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails/phones and account for what was removed, per
    language — the audit artifact a scrubbing pass must emit. Redaction
    and counting are single-pass column expressions; the only shuffle is
    the per-lang rollup."""
    docs = load_table(spark, sf_dir, "documents")
    t = _augmented(F.col("doc_id"), F.col("text"))
    clean = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return (
        docs.select(
            "lang",
            F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).alias("e"),
            F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0))).alias("p"),
            (F.length(t) - F.length(clean)).alias("removed"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("e").cast("long").alias("n_emails"),
            F.sum("p").cast("long").alias("n_phones"),
            F.sum("removed").cast("long").alias("bytes_redacted"),
        )
        .orderBy("lang")
    )


@register(
    "url_domain_topk",
    oracle=f"""
        WITH {_SQL_AUG}
        SELECT regexp_extract(t, '{URL_RE}', 1) AS domain,
               count(*) AS n_docs,
               CAST(min(doc_id) AS BIGINT) AS first_doc
        FROM aug
        GROUP BY domain
        ORDER BY n_docs DESC, domain
        LIMIT 20
    """,
)
def url_domain_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain inventory over extracted URLs (the crawl-provenance /
    blocklist view): extract → groupBy domain → top-k. The top-k is a
    TakeOrderedAndProject, not a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    t = _augmented(F.col("doc_id"), F.col("text"))
    return (
        docs.select(
            F.regexp_extract(t, URL_RE, 1).alias("domain"), "doc_id"
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .orderBy(F.desc("n_docs"), "domain")
        .limit(20)
    )


@register(
    "mixture_weights",
    oracle="""
        WITH src AS (
            SELECT source, count(*) AS n_docs
            FROM documents GROUP BY source
        )
        SELECT source, n_docs,
               sqrt(n_docs) / sum(sqrt(n_docs)) OVER () AS weight,
               10000 * sqrt(n_docs) / sum(sqrt(n_docs)) OVER () AS expected_docs
        FROM src
        ORDER BY source
    """,
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (alpha = 0.5): weight_i =
    n_i^alpha / sum_j n_j^alpha, plus the expected per-source document
    count for a 10k-doc sampling budget. The window aggregate runs over
    #sources rows (tiny), AFTER the corpus-sized groupBy — the
    heavyweight stage is one count-per-source shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    total = F.sum(F.sqrt("n_docs")).over(Window.partitionBy())
    return src.select(
        "source",
        "n_docs",
        (F.sqrt("n_docs") / total).alias("weight"),
        (F.lit(10000) * F.sqrt("n_docs") / total).alias("expected_docs"),
    ).orderBy("source")


def _zorder_oracle() -> str:
    from bigdata_processing_spark.operators.zorder import zorder_key_sql

    zk = zorder_key_sql("x", "y", 8)
    return f"""
        WITH b AS (
            SELECT event_id,
                   user_id % 256 AS x,
                   event_id % 256 AS y
            FROM events WHERE event_id < 500
        )
        SELECT event_id, x, y, CAST({zk} AS BIGINT) AS zkey
        FROM b
        ORDER BY event_id
    """


@register("zorder_curve_sample", oracle=_zorder_oracle())
def zorder_curve_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Morton-curve kernel behind operators/zorder.py
    (write_zordered_parquet's layout key), validated value-by-value
    cross-engine: pure shift/and/or bit arithmetic, so the Spark column
    expression and the generated SQL twin must agree bit-for-bit."""
    from bigdata_processing_spark.operators.zorder import zorder_key

    events = load_table(spark, sf_dir, "events")
    x = (F.col("user_id") % 256).alias("x")
    y = (F.col("event_id") % 256).alias("y")
    return (
        events.filter(F.col("event_id") < 500)
        .select(
            "event_id",
            x,
            y,
            zorder_key(F.col("user_id") % 256, F.col("event_id") % 256, 8)
            .alias("zkey"),
        )
        .orderBy("event_id")
    )


CHUNK_WIN = 32     # tokens per context-window chunk
CHUNK_STRIDE = 24  # overlap = WIN - STRIDE = 8 tokens


@register(
    "chunk_documents",
    oracle=f"""
        WITH ks AS (SELECT range AS k FROM range(8)),
        t AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM documents WHERE doc_id < 200
        )
        SELECT t.doc_id,
               CAST(ks.k AS BIGINT) AS chunk_idx,
               CAST(len(toks[ks.k*{CHUNK_STRIDE}+1 : ks.k*{CHUNK_STRIDE}+{CHUNK_WIN}]) AS BIGINT)
                   AS chunk_len,
               array_to_string(toks[ks.k*{CHUNK_STRIDE}+1 : ks.k*{CHUNK_STRIDE}+{CHUNK_WIN}], ' ')
                   AS chunk_text
        FROM t JOIN ks ON ks.k * {CHUNK_STRIDE} < t.n
        ORDER BY doc_id, chunk_idx
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking (win={win}, stride={stride}):
    every token appears in ≥1 chunk, consecutive chunks share
    win-stride tokens — the pre-tokenization splitter feeding a training
    batch assembler. All JVM-side: sequence→transform→explode, no UDF,
    no shuffle until the presentation sort; chunk count per doc is
    data-driven (ceil(n/stride)), never a driver loop."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(CHUNK_STRIDE)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.struct(
            k.cast("long").alias("chunk_idx"),
            F.slice(toks, k * CHUNK_STRIDE + 1, CHUNK_WIN).alias("c"),
        ),
    )
    return (
        docs.filter(F.col("doc_id") < 200)
        .select("doc_id", F.explode(chunks).alias("ch"))
        .select(
            "doc_id",
            F.col("ch.chunk_idx").alias("chunk_idx"),
            F.size("ch.c").cast("long").alias("chunk_len"),
            F.array_join("ch.c", " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


chunk_documents.__doc__ = chunk_documents.__doc__.format(
    win=CHUNK_WIN, stride=CHUNK_STRIDE
)


@register(
    "seq_length_histogram",
    oracle="""
        SELECT CAST(power(2, ceil(log2(greatest(len(string_split(text, ' ')), 1)))) AS BIGINT)
                   AS bucket_max_tokens,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               CAST(sum(CAST(power(2, ceil(log2(greatest(len(string_split(text, ' ')), 1)))) AS BIGINT)
                        - len(string_split(text, ' '))) AS BIGINT) AS padding_tokens
        FROM documents
        GROUP BY 1
        ORDER BY bucket_max_tokens
    """,
)
def seq_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram in power-of-2 buckets — the batch-shape
    planning view: how many documents land in each padded-length class
    and how many padding tokens that costs. Single groupBy over a
    codegen expression; at 100 TB this is one count-shuffle over ~20
    distinct bucket keys."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split("text", " "))
    bucket = F.pow(F.lit(2.0), F.ceil(F.log2(F.greatest(n, F.lit(1))))).cast("long")
    return (
        docs.select(bucket.alias("bucket_max_tokens"), n.alias("n"))
        .groupBy("bucket_max_tokens")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").cast("long").alias("total_tokens"),
            F.sum(F.col("bucket_max_tokens") - F.col("n")).cast("long").alias("padding_tokens"),
        )
        .orderBy("bucket_max_tokens")
    )


@register(
    "boilerplate_chunk_stats",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, source, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM documents
        ),
        -- chunk indices sized from the data (max doc's chunk count),
        -- matching the Spark side's per-doc ceil(n/stride) — a frozen
        -- literal cap would silently diverge on longer docs
        ks AS (
            SELECT unnest(range((SELECT CAST(ceil(max(n)::DOUBLE / {CHUNK_STRIDE}) AS BIGINT) FROM t))) AS k
        ),
        ch AS (
            SELECT t.doc_id, t.source,
                   md5(array_to_string(
                       toks[ks.k*{CHUNK_STRIDE}+1 : ks.k*{CHUNK_STRIDE}+{CHUNK_WIN}], ' ')) AS ck
            FROM t JOIN ks ON ks.k * {CHUNK_STRIDE} < t.n
        ),
        bp AS (
            SELECT ck FROM ch GROUP BY ck HAVING count(DISTINCT doc_id) >= 2
        )
        SELECT source,
               count(*) AS n_chunks,
               sum(CASE WHEN bp.ck IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS bp_chunks,
               round(sum(CASE WHEN bp.ck IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                     / count(*), 6) AS bp_ratio
        FROM ch LEFT JOIN bp USING (ck)
        GROUP BY source
        ORDER BY source
    """,
)
def boilerplate_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-chunk (boilerplate) detection: chunk every doc with the
    same overlapping windows as chunk_documents, fingerprint each chunk
    (md5 — the one hash both engines share), and flag chunks whose
    fingerprint appears in 2+ distinct docs. The per-source boilerplate
    ratio is the headline signal line-level dedup pipelines
    (C4/RefinedWeb-style) act on — here at window granularity because
    the fixture corpus has no line structure.

    Scale shape: chunks never carry their text past the fingerprint —
    the repeated-chunk aggregate and the flag join are keyed on the
    16-byte digest, so shuffle width is O(chunks × 16B) regardless of
    chunk length. One (ck) shuffle for the boilerplate set, one for the
    flag join, then a tiny per-source rollup."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(CHUNK_STRIDE)).cast("int")
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.md5(F.array_join(F.slice(toks, k * CHUNK_STRIDE + 1, CHUNK_WIN), " ")),
    )
    ch = docs.select("doc_id", "source", F.explode(windows).alias("ck"))
    bp = (
        ch.groupBy("ck")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("ck", F.lit(1).alias("is_bp"))
    )
    flagged = ch.join(bp, "ck", "left")
    hit = F.when(F.col("is_bp").isNotNull(), F.lit(1)).otherwise(F.lit(0))
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(hit).alias("bp_chunks"),
            F.round(F.sum(hit).cast("double") / F.count("*"), 6).alias("bp_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Deterministic training-shard assignment (operators/sharding): every doc
# gets a seeded portable hash (md5-derived, bit-identical in DuckDB); the
# shard is hash % N, the within-shard order is the hash itself — a global
# seeded shuffle realized with ONE hash exchange and a per-partition sort
# instead of a total-order sort. This query is the oracle-checked twin of
# the exact geometry emit_training_shards writes to disk
# (tests/test_sharding.py pins query == files).
# ---------------------------------------------------------------------------
SHARD_SEED = 0
TRAIN_N_SHARDS = 8


@register(
    "training_shard_stats",
    oracle=f"""
        WITH s AS (
            SELECT doc_id,
                   ('0x' || substr(md5('{SHARD_SEED}|' || doc_id::VARCHAR), 1, 8))::BIGINT
                       AS shuffle_key,
                   len(list_filter(string_split(text, ' '), t -> t <> '')) AS ntok
            FROM documents
        )
        SELECT (shuffle_key % {TRAIN_N_SHARDS})::BIGINT AS shard,
               count(*)::BIGINT AS n_docs,
               sum(ntok)::BIGINT AS sum_tokens,
               arg_min(doc_id, shuffle_key * 1048576 + doc_id) AS first_doc
        FROM s
        GROUP BY 1
        ORDER BY shard
    """,
)
def training_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard doc count, token mass, and the first doc in shuffled
    order (a determinism witness for the loader-visible stream head).
    Rides operators/sharding.assign_shards — the same expressions
    emit_training_shards shards and orders by on disk."""
    from bigdata_processing_spark.functions import text as T
    from bigdata_processing_spark.operators.sharding import assign_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    assigned = assign_shards(
        docs, id_col="doc_id", n_shards=TRAIN_N_SHARDS, seed=SHARD_SEED
    )
    # shuffle_key is a 32-bit-range nonnegative bigint, so % == pmod and
    # the combined key can't overflow; doc_id < 2^20 at every tested SF
    # keeps (key << 20 | doc_id) collision-free → first_doc deterministic
    ck = F.col("shuffle_key") * 1048576 + F.col("doc_id")
    return (
        assigned.select(
            F.col("shard").cast("bigint").alias("shard"),
            T.token_count(F.col("text")).alias("ntok"),
            F.col("doc_id"),
            ck.alias("ck"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").alias("sum_tokens"),
            F.min_by("doc_id", "ck").alias("first_doc"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture weights (round 7): the multilingual
# sampling-temperature table — w_i(τ) = n_i^τ / Σ n_j^τ per language,
# swept over a τ grid. τ=1 is proportional sampling (big languages
# dominate), τ→0 is uniform; production multilingual LMs sample at
# τ≈0.3-0.7 to up-weight the tail. One tiny per-language count, the τ
# expansion is a literal cross join over grid×languages rows —
# metadata-sized at any corpus scale.
# ---------------------------------------------------------------------------
MIXTURE_TAUS = (0.3, 0.5, 0.7, 1.0)


@register(
    "temperature_mixture_weights",
    oracle=f"""
        WITH lang_n AS (
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        ),
        taus AS (SELECT unnest([{', '.join(str(t) for t in MIXTURE_TAUS)}]) AS tau)
        SELECT t.tau AS tau, l.lang AS lang, l.n_docs AS n_docs,
               round(pow(l.n_docs, t.tau)
                     / sum(pow(l.n_docs, t.tau)) OVER (PARTITION BY t.tau), 9)
                   AS weight
        FROM lang_n l CROSS JOIN taus t
        ORDER BY tau, lang
    """,
)
def temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from bigdata_processing_spark.sources.writers import literal_df

    docs = load_table(spark, sf_dir, "documents")
    lang_n = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    taus = literal_df(
        docs.sparkSession, [(t,) for t in MIXTURE_TAUS], "tau double"
    )
    w = Window.partitionBy("tau")
    scaled = F.pow(F.col("n_docs").cast("double"), F.col("tau"))
    return (
        lang_n.crossJoin(F.broadcast(taus))
        .select(
            "tau", "lang", "n_docs",
            F.round(scaled / F.sum(scaled).over(w), 9).alias("weight"),
        )
        .orderBy("tau", "lang")
    )
