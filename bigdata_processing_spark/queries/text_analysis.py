"""Text-analysis queries over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, fingerprinting.

North-star LLM-pipeline surface (SURVEY.md §2.12). Everything is built-in
Column expressions — at 100TB these stay inside whole-stage codegen; no
Python crosses the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.functions import text as T
from bigdata_processing_spark.queries import register

_SW = "('a','and','in','is','of','the','to')"


# ---------------------------------------------------------------------------
# Per-language corpus statistics: docs, chars, whitespace tokens,
# avg token length. (Generalizes reference X1/X3 split+len usage.)
# ---------------------------------------------------------------------------
@register(
    "text_stats_by_lang",
    oracle=f"""
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(length(text)) AS BIGINT) AS total_chars,
               CAST(sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS total_tokens,
               avg(length(text)) AS avg_chars,
               sum(length(text))::DOUBLE
                   / sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS chars_per_token
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", F.length("text").alias("nc"), T.token_count(F.col("text")).alias("nt"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nc").alias("total_chars"),
            F.sum("nt").alias("total_tokens"),
            F.avg("nc").alias("avg_chars"),
            (F.sum("nc").cast("double") / F.sum("nt")).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# BPE-ish token counting (regex pre-tokenizer) per source.
# ---------------------------------------------------------------------------
@register(
    "bpe_token_counts",
    oracle=f"""
        SELECT source,
               CAST(sum(len(regexp_extract_all(text, '{T.BPE_TOKEN_RE}'))) AS BIGINT) AS bpe_tokens,
               CAST(sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS ws_tokens,
               count(*) AS n_docs
        FROM documents
        GROUP BY source
        ORDER BY source
    """,
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.sum(T.bpe_token_count(F.col("text"))).alias("bpe_tokens"),
            F.sum(T.token_count(F.col("text"))).alias("ws_tokens"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Quality scoring: length / punctuation / stopword-ratio heuristics →
# one score per doc, summarized into score-decile buckets.
# ---------------------------------------------------------------------------
@register(
    "quality_scores",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id,
                   least(length(text) / 500.0, 1.0) AS len_score,
                   len(list_filter(string_split(text, ' '), t -> t IN {_SW}))::DOUBLE
                       / greatest(len(list_filter(string_split(text, ' '), t -> t <> '')), 1) AS stop_ratio,
                   len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))::DOUBLE
                       / greatest(length(text), 1) AS punct_ratio
            FROM documents
        )
        SELECT floor((0.5 * len_score + 0.3 * stop_ratio + 0.2 * (1 - punct_ratio)) * 10)::BIGINT
                   AS score_bucket,
               count(*) AS n_docs,
               avg(len_score) AS avg_len_score,
               avg(stop_ratio) AS avg_stop_ratio,
               avg(punct_ratio) AS avg_punct_ratio
        FROM scored
        GROUP BY 1
        ORDER BY score_bucket
    """,
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.least(F.length("text") / 500.0, F.lit(1.0)).alias("len_score"),
        (
            T.stopword_count(F.col("text")).cast("double")
            / F.greatest(T.token_count(F.col("text")), F.lit(1))
        ).alias("stop_ratio"),
        (
            T.punct_count(F.col("text")).cast("double")
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("punct_ratio"),
    )
    score = (
        0.5 * F.col("len_score") + 0.3 * F.col("stop_ratio") + 0.2 * (1 - F.col("punct_ratio"))
    )
    return (
        scored.groupBy(F.floor(score * 10).cast("bigint").alias("score_bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.avg("len_score").alias("avg_len_score"),
            F.avg("stop_ratio").alias("avg_stop_ratio"),
            F.avg("punct_ratio").alias("avg_punct_ratio"),
        )
        .orderBy("score_bucket")
    )


# ---------------------------------------------------------------------------
# Language-ID heuristic (stopword-density n-gram-free variant): predict
# 'en' when ≥8% of tokens are English stopwords, else 'unknown';
# confusion matrix against the labeled lang column.
# ---------------------------------------------------------------------------
@register(
    "lang_id_confusion",
    oracle=f"""
        WITH pred AS (
            SELECT lang,
                   CASE WHEN len(list_filter(string_split(text, ' '), t -> t IN {_SW}))::DOUBLE
                             / greatest(len(list_filter(string_split(text, ' '), t -> t <> '')), 1)
                             >= 0.08
                        THEN 'en' ELSE 'unknown' END AS predicted
            FROM documents
        )
        SELECT lang, predicted, count(*) AS n
        FROM pred
        GROUP BY lang, predicted
        ORDER BY lang, predicted
    """,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    density = T.stopword_count(F.col("text")).cast("double") / F.greatest(
        T.token_count(F.col("text")), F.lit(1)
    )
    return (
        docs.select(
            "lang",
            F.when(density >= 0.08, F.lit("en")).otherwise(F.lit("unknown")).alias("predicted"),
        )
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted")
    )


# ---------------------------------------------------------------------------
# Document fingerprinting: md5 over normalized text (lower/trim/collapse
# whitespace) — the exact-dedup key. Output: corpus fingerprint summary
# plus the lexicographically-first fingerprints as a spot check.
# ---------------------------------------------------------------------------
@register(
    "fingerprint_sample",
    oracle="""
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
        ORDER BY fp ASC
        LIMIT 25
    """,
)
def fingerprint_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))
        .orderBy(F.col("fp").asc())
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Quality-weighted sampling: keep each doc with probability equal to its
# quality score — the soft alternative to a hard threshold filter
# (gradually down-weights mediocre text instead of cliff-dropping it).
# Deterministic: the "coin flip" is a content-independent md5 hash of
# doc_id quantized to 1e-4, so both engines keep exactly the same docs
# and reruns are reproducible (resampling = change the seed string).
# ---------------------------------------------------------------------------
@register(
    "quality_weighted_sample",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, source,
                   least(greatest(
                       0.5 * least(length(text) / 500.0, 1.0)
                       + 0.3 * (len(list_filter(string_split(text, ' '), t -> t IN {_SW}))::DOUBLE
                                / greatest(len(list_filter(string_split(text, ' '), t -> t <> '')), 1))
                       + 0.2 * (1 - len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))::DOUBLE
                                    / greatest(length(text), 1)),
                   0.0), 1.0) AS w,
                   (('0x' || substr(md5('q|' || doc_id), 1, 8))::BIGINT % 10000) / 10000.0 AS u
            FROM documents
        )
        SELECT source,
               count(*) AS n_docs,
               sum(CASE WHEN u < w THEN 1 ELSE 0 END)::BIGINT AS n_kept,
               round(sum(w), 6) AS expected_kept,
               avg(CASE WHEN u < w THEN w END) AS avg_kept_quality
        FROM scored
        GROUP BY source
        ORDER BY source
    """,
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source acceptance report for quality-proportional sampling:
    keep doc iff hash-uniform(doc_id) < quality(doc). ``expected_kept``
    (the sum of weights) against ``n_kept`` is the audit a pipeline runs
    to confirm the sampler is unbiased. One corpus pass, score and coin
    are codegen'd column exprs, the only shuffle is the per-source
    rollup."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.least(
        F.greatest(
            0.5 * F.least(F.length("text") / 500.0, F.lit(1.0))
            + 0.3
            * (
                T.stopword_count(F.col("text")).cast("double")
                / F.greatest(T.token_count(F.col("text")), F.lit(1))
            )
            + 0.2
            * (
                1
                - T.punct_count(F.col("text")).cast("double")
                / F.greatest(F.length("text"), F.lit(1))
            ),
            F.lit(0.0),
        ),
        F.lit(1.0),
    )
    u = (T.hash64(F.col("doc_id").cast("string"), "q") % 10000) / 10000.0
    scored = docs.select("source", w.alias("w"), u.alias("u"))
    kept = F.when(F.col("u") < F.col("w"), F.lit(1)).otherwise(F.lit(0))
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept).alias("n_kept"),
            F.round(F.sum("w"), 6).alias("expected_kept"),
            F.avg(F.when(F.col("u") < F.col("w"), F.col("w"))).alias(
                "avg_kept_quality"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility by language (round 7): BPE-ish tokens per word and
# bytes per token, per language — the number multilingual tokenizer/
# vocab decisions read first (high fertility = the tokenizer fragments
# that language; byte-level fallback shows up as bytes/token → 1). One
# scan, map-side expressions, one tiny groupBy — scan-bounded at any
# corpus size. utf-8 BYTES (Spark octet_length == DuckDB strlen), not
# chars.
# ---------------------------------------------------------------------------
@register(
    "token_fertility_by_lang",
    oracle=f"""
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
               CAST(sum(len(regexp_extract_all(text, '{T.BPE_TOKEN_RE}'))) AS BIGINT)
                   AS bpe_tokens,
               CAST(sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT)
                   AS ws_tokens,
               round(sum(len(regexp_extract_all(text, '{T.BPE_TOKEN_RE}')))::DOUBLE
                   / sum(len(list_filter(string_split(text, ' '), t -> t <> ''))), 6)
                   AS fertility,
               round(sum(strlen(text))::DOUBLE
                   / sum(len(regexp_extract_all(text, '{T.BPE_TOKEN_RE}'))), 6)
                   AS bytes_per_token
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
)
def token_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.octet_length("text")).alias("total_bytes"),
            F.sum(T.bpe_token_count(F.col("text"))).alias("bpe_tokens"),
            F.sum(T.token_count(F.col("text"))).alias("ws_tokens"),
        )
        .select(
            "lang", "n_docs", "total_bytes", "bpe_tokens", "ws_tokens",
            F.round(
                F.col("bpe_tokens").cast("double") / F.col("ws_tokens"), 6
            ).alias("fertility"),
            F.round(
                F.col("total_bytes").cast("double") / F.col("bpe_tokens"), 6
            ).alias("bytes_per_token"),
        )
        .orderBy("lang")
    )
