"""Corpus-quality operators: repetition scoring and train/test
decontamination — LLM-pipeline surface beyond the reference
(SURVEY.md §2.12 north-star family).

- Repetition ratio (1 - distinct/total bigrams) is the classic
  degenerate-text signal (boilerplate, keyboard mash, template spam):
  pure array arithmetic per doc, no shuffle until the band rollup.
- Decontamination: test-split docs sharing most of their trigram
  shingles with the train split. At 100TB this is THE pre-release
  hygiene query — one distinct-shingle vocabulary build on train (the
  big side, shuffled once by shingle), one shingle-keyed join from the
  test side (small by construction), never a doc×doc product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.functions import text as T
from bigdata_processing_spark.operators.regime import bcast_if_small
from bigdata_processing_spark.queries import register

CONTAM_FRAC = 0.5  # test doc is contaminated if ≥ this frac of its
# distinct trigrams appear anywhere in the train split

_SQL_TOKS = """
        toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
            FROM documents
        )
"""


@register(
    "repetition_ratio_bands",
    oracle=f"""
        WITH {_SQL_TOKS},
        rep AS (
            SELECT doc_id,
                   greatest(len(tk) - 1, 0) AS total_bi,
                   len(list_distinct(list_transform(
                       range(1, greatest(len(tk) - 1, 0) + 1),
                       i -> tk[i] || '_' || tk[i + 1]))) AS distinct_bi
            FROM toks
        ),
        scored AS (
            SELECT doc_id,
                   CASE WHEN total_bi > 0
                        THEN 1.0 - distinct_bi::DOUBLE / total_bi
                        ELSE 0.0 END AS rep_ratio
            FROM rep
        )
        SELECT floor(rep_ratio * 10) / 10 AS band,
               count(*) AS n_docs,
               avg(rep_ratio) AS avg_ratio,
               min(doc_id) AS first_doc
        FROM scored
        GROUP BY band
        ORDER BY band
    """,
)
def repetition_ratio_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram repetition ratio per doc, rolled up into 0.1-wide bands —
    the filter threshold sweep a pipeline runs before choosing a cutoff."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.filter(T.tokens(F.col("text")), lambda t: t != "")
    total_bi = F.greatest(F.size(tk) - 1, F.lit(0))
    distinct_bi = F.size(T.word_shingles(F.col("text"), 2))
    ratio = F.when(
        total_bi > 0, F.lit(1.0) - distinct_bi.cast("double") / total_bi
    ).otherwise(F.lit(0.0))
    return (
        docs.select("doc_id", ratio.alias("rep_ratio"))
        .select(
            "doc_id",
            "rep_ratio",
            (F.floor(F.col("rep_ratio") * 10) / 10).alias("band"),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_docs"),
            F.avg("rep_ratio").alias("avg_ratio"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("band")
    )


TOKEN_BUDGET = 256  # tokens per packed training sequence


@register(
    "token_packing_bins",
    oracle=f"""
        WITH {_SQL_TOKS},
        sized AS (
            SELECT doc_id,
                   (SELECT lang FROM documents d WHERE d.doc_id = toks.doc_id) AS lang,
                   len(tk) AS n_tokens
            FROM toks
        ),
        packed AS (
            SELECT lang, doc_id, n_tokens,
                   floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                              ROWS UNBOUNDED PRECEDING) - n_tokens)
                         / {TOKEN_BUDGET}) AS bin
            FROM sized
        )
        SELECT lang, bin::BIGINT AS bin,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        FROM packed
        GROUP BY lang, bin
        ORDER BY lang, bin
    """,
)
def token_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: fill training bins up to TOKEN_BUDGET tokens in
    deterministic doc order, independently per language partition.

    The window is PARTITIONED BY lang, so packing parallelizes across
    partitions — the scale-correct form of the inherently-sequential
    greedy pack (a single global ordering would serialize on one task).
    A doc larger than the budget gets its own bin(s) boundary — bins may
    overflow by at most one document, the standard contiguous-pack
    semantics."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select("doc_id", "lang", T.token_count(F.col("text")).alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = sized.withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / TOKEN_BUDGET),
    )
    return (
        binned.groupBy("lang", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("bin_tokens"))
        .orderBy("lang", "bin")
    )


@register(
    "balanced_mixture_sample",
    oracle="""
        WITH counts AS (
            SELECT source, count(*) AS n FROM documents GROUP BY source
        ),
        rates AS (
            SELECT source, n,
                   (SELECT min(n) FROM counts)::DOUBLE / n AS rate
            FROM counts
        ),
        kept AS (
            SELECT d.source, r.rate, r.n
            FROM documents d JOIN rates r USING (source)
            WHERE ('0x' || substr(md5('mix|' || d.doc_id), 1, 8))::BIGINT % 1000000
                  < r.rate * 1000000
        )
        SELECT source,
               any_value(n) AS n_total,
               count(*) AS n_kept,
               round(any_value(rate), 9) AS target_rate
        FROM kept
        GROUP BY source
        ORDER BY source
    """,
)
def balanced_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture balancing: deterministically down-sample every source
    to the smallest source's size (rate = min_n / n_source), selection by
    content-stable hash so the same doc is kept across reruns/engines.
    At 100TB the rates table is a handful of rows (broadcast join); the
    corpus is filtered in one pass, no shuffle before the report agg."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    min_n = counts.agg(F.min("n").alias("m"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "source", "n", (F.col("m").cast("double") / F.col("n")).alias("rate")
    )
    keep = (
        T.hash64(F.col("doc_id").cast("string"), "mix") % 1_000_000
        < F.col("rate") * 1_000_000
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(keep)
        .groupBy("source")
        .agg(
            F.any_value("n").alias("n_total"),
            F.count("*").alias("n_kept"),
            F.round(F.any_value("rate"), 9).alias("target_rate"),
        )
        .orderBy("source")
    )


@register(
    "contamination_test_vs_train",
    oracle=f"""
        WITH {_SQL_TOKS},
        tagged AS (
            SELECT doc_id, tk,
                   CASE WHEN ('0x' || substr(md5('split|' ||
                            md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))), 1, 8))::BIGINT
                            % 10 < 9
                        THEN 'train' ELSE 'test' END AS split
            FROM documents JOIN toks USING (doc_id)
        ),
        sh AS (
            SELECT doc_id, split,
                   list_distinct(list_transform(
                       range(1, greatest(len(tk) - 2, 0) + 1),
                       i -> tk[i] || '_' || tk[i + 1] || '_' || tk[i + 2])) AS s3
            FROM tagged
        ),
        train_vocab AS (
            SELECT DISTINCT unnest(s3) AS s FROM sh WHERE split = 'train'
        ),
        test_ex AS (
            SELECT doc_id, len(s3) AS n_sh, unnest(s3) AS s
            FROM sh WHERE split = 'test' AND len(s3) > 0
        ),
        hits AS (
            SELECT doc_id, n_sh, count(*) AS n_seen
            FROM test_ex JOIN train_vocab USING (s)
            GROUP BY doc_id, n_sh
        )
        SELECT doc_id, n_sh, n_seen,
               round(n_seen::DOUBLE / n_sh, 9) AS contam_frac
        FROM hits
        WHERE n_seen::DOUBLE / n_sh >= {CONTAM_FRAC}
        ORDER BY doc_id
    """,
)
def contamination_test_vs_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-split docs whose trigram shingles mostly appear in the train
    split (content-hash split, same rule as train_test_split — exact dups
    land in one split, so hits here are CROSS-document leakage)."""
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(
        T.hash64(T.fingerprint(F.col("text")), "split") % 10 < 9, "train"
    ).otherwise("test")
    # r12 note — examined, deliberately left on the two-branch join: a
    # one-pass rewrite (explode once, resolve train-membership with a
    # max-over-Window keyed on the shingle) measured ~16% faster at
    # sf0.1, but a Window.partitionBy(shingle) buffers every occurrence
    # of a hot shingle in ONE task — AQE skew handling covers joins, not
    # windows — so at corpus scale a stopword trigram becomes an
    # unsplittable straggler. The join form keeps map-side dedup on the
    # train side (hot shingles collapse before the exchange) and AQE
    # skew-split on the probe join; the second corpus scan is the price.
    base = docs.select(
        "doc_id", split.alias("split"), T.word_shingles(F.col("text"), 3).alias("s3")
    )
    train_vocab = (
        base.filter(F.col("split") == "train").select(F.explode("s3").alias("s")).distinct()
    )
    test_ex = (
        base.filter((F.col("split") == "test") & (F.size("s3") > 0))
        .select("doc_id", F.size("s3").cast("long").alias("n_sh"), F.explode("s3").alias("s"))
    )
    hits = test_ex.join(train_vocab, "s").groupBy("doc_id", "n_sh").agg(
        F.count("*").alias("n_seen")
    )
    frac = F.col("n_seen").cast("double") / F.col("n_sh")
    return (
        hits.filter(frac >= CONTAM_FRAC)
        .select("doc_id", "n_sh", "n_seen", F.round(frac, 9).alias("contam_frac"))
        .orderBy("doc_id")
    )


@register(
    "value_outlier_fences",
    oracle="""
        WITH q AS (
            SELECT event_type,
                   quantile_cont(value, 0.25) AS q1,
                   quantile_cont(value, 0.75) AS q3
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               count(*) AS n_events,
               round(any_value(q1 - 1.5 * (q3 - q1)), 9) AS lo_fence,
               round(any_value(q3 + 1.5 * (q3 - q1)), 9) AS hi_fence,
               CAST(sum(CASE WHEN value < q1 - 1.5 * (q3 - q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
               CAST(sum(CASE WHEN value > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_above
        FROM events e JOIN q USING (event_type)
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
)
def value_outlier_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier screen per event type: quantile aggregate
    (tiny — one row per type) broadcast back onto the stream; the data
    passes twice but never shuffles by anything except the final
    per-type rollup."""
    events = load_table(spark, sf_dir, "events")
    q = events.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("q1"),
        F.percentile("value", 0.75).alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        events.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.any_value(lo), 9).alias("lo_fence"),
            F.round(F.any_value(hi), 9).alias("hi_fence"),
            F.sum(F.when(F.col("value") < lo, 1).otherwise(0)).alias("n_below"),
            F.sum(F.when(F.col("value") > hi, 1).otherwise(0)).alias("n_above"),
        )
        .orderBy("event_type")
    )


@register(
    "word_entropy_bands",
    oracle=f"""
        WITH {_SQL_TOKS},
        tok AS (SELECT doc_id, unnest(tk) AS t FROM toks),
        cnt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
        tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY doc_id),
        ent AS (
            SELECT cnt.doc_id,
                   -sum((c::DOUBLE / n) * log2(c::DOUBLE / n)) AS h
            FROM cnt JOIN tot USING (doc_id)
            GROUP BY cnt.doc_id
        )
        SELECT floor(round(h, 6) * 2) / 2 AS band,
               count(*) AS n_docs,
               avg(h) AS avg_entropy,
               min(doc_id) AS first_doc
        FROM ent
        GROUP BY band
        ORDER BY band
    """,
)
def word_entropy_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram (word-distribution) Shannon entropy per doc, rolled into
    0.5-bit bands — the complement of the bigram repetition ratio: low
    entropy flags vocabulary-degenerate text (template spam, keyword
    stuffing) that a distinct-bigram count alone can miss when the few
    words are shuffled. Classic Gopher-family quality rule.

    Scale shape: explode -> (doc_id, token) count -> per-doc fold; the
    only shuffle keyed on (doc_id, token), partial-aggregated map-side.
    Entropy is rounded to 1e-6 BEFORE banding so the band key (the
    groupBy key) is stable against float summation-order differences
    between engines; the residual avg_entropy stays under the driver's
    relative tolerance."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.filter(T.tokens(F.col("text")), lambda t: t != "")
    cnt = (
        docs.select("doc_id", F.explode(tk).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("c"))
    )
    # Single-aggregation entropy (r12, guide §2.4): h = −Σ (c/n)·log2(c/n)
    # = log2(n) − (Σ c·log2 c)/n, so the per-doc total needs no self-join
    # back onto the counts — one groupBy(doc_id) replaces the tot
    # aggregation + join + re-aggregation (plan: 5 → 3 Exchange, the
    # token-level frame is shuffled once). Float rounding shifts at the
    # 1e-15 level; the band key rounds h to 1e-6 first, so grouping is
    # unchanged (oracle-verified at sf0.001/0.01/0.1).
    c = F.col("c").cast("double")
    ent = (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(c * F.log2(c)).alias("slc"),
        )
        .select(
            "doc_id",
            (F.log2(F.col("n").cast("double")) - F.col("slc") / F.col("n")).alias("h"),
        )
    )
    return (
        ent.select(
            "doc_id", "h", (F.floor(F.round(F.col("h"), 6) * 2) / 2).alias("band")
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_docs"),
            F.avg("h").alias("avg_entropy"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("band")
    )


@register(
    "unigram_surprisal_bands",
    oracle=f"""
        WITH {_SQL_TOKS},
        tok AS (SELECT doc_id, unnest(tk) AS t FROM toks),
        vocab AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
        tot AS (SELECT sum(c)::DOUBLE AS n FROM vocab),
        sur AS (
            SELECT tok.doc_id, avg(-log2(vocab.c::DOUBLE / tot.n)) AS s
            FROM tok JOIN vocab USING (t) CROSS JOIN tot
            GROUP BY tok.doc_id
        )
        SELECT floor(round(s, 6) * 2) / 2 AS band,
               count(*) AS n_docs,
               avg(s) AS avg_surprisal,
               min(doc_id) AS first_doc
        FROM sur
        GROUP BY band
        ORDER BY band
    """,
)
def unigram_surprisal_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality filter with a unigram stand-in: fit a unigram
    language model on the whole corpus (token -> count / total), score
    every doc by its mean token surprisal avg(-log2 p(w)), and roll into
    0.5-bit bands. Low-surprisal docs are stuffed with the corpus's most
    common words (template/spam); high-surprisal docs are noise/garbled —
    both tails are what an LM-perplexity filter (CCNet-style) trims.

    Scale shape: the vocabulary aggregate is one (token) shuffle with
    map-side combine; scoring re-joins tokens to the vocab through the
    shared regime switch (vocab ≪ corpus after aggregation, so it
    broadcasts at test scale; a web-scale vocab degrades to a sort-merge
    join on token, still vocab-bounded — operators/regime.py); the 1-row
    total rides a broadcast cross join. Mean
    surprisal is rounded to 1e-6 before banding so the groupBy key is
    stable against summation-order float differences across engines."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.filter(T.tokens(F.col("text")), lambda t: t != "")
    tok = docs.select("doc_id", F.explode(tk).alias("t"))
    vocab = tok.groupBy("t").agg(F.count("*").alias("c"))
    tot = vocab.agg(F.sum("c").cast("double").alias("n"))
    sur = (
        tok.join(bcast_if_small(vocab, sf_dir), "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.avg(-F.log2(F.col("c").cast("double") / F.col("n"))).alias("s"))
    )
    return (
        sur.select(
            "doc_id", "s", (F.floor(F.round(F.col("s"), 6) * 2) / 2).alias("band")
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_docs"),
            F.avg("s").alias("avg_surprisal"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# Compression-ratio quality screen (zlib): deflate(text)/len(text) — the
# classic corpus-filter signal (highly repetitive or templated docs
# compress far below natural prose; random noise barely compresses).
# Needs a real compressor, so this is the registry's showcase ARROW-
# BATCHED pandas UDF (not a row-at-a-time Python UDF): zlib runs per
# batch on the executors, everything around it stays relational.
# No DuckDB twin exists (no compression functions in its SQL surface) →
# register(driver=False): bench-tracked + pytest-gated
# (tests/test_functions.py), like the k-means family.
# ---------------------------------------------------------------------------
@register("compression_ratio_bands", driver=False)
def compression_ratio_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs banded by zlib compression ratio (compressed/raw bytes,
    level 6), 10 bands of width 0.1 capped at band 9. The UDF is
    vectorized over Arrow batches; the scan projects only (doc_id,
    text) and the rollup shuffles counters only."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _ratio_fn(texts):
        import zlib

        def one(t):
            if not t:
                return None
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(one)

    # `from __future__ import annotations` stringifies signatures, which
    # pandas_udf can't resolve for locally-imported pandas — annotate
    # explicitly (same idiom as operators/clustering._assign_udf)
    _ratio_fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    _ratio = pandas_udf(_ratio_fn, "double")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = docs.select(
        "doc_id", _ratio(F.col("text")).alias("ratio")
    ).filter(F.col("ratio").isNotNull())
    band = F.least(F.floor(F.col("ratio") * 10), F.lit(9)).cast("bigint")
    return (
        scored.groupBy(band.alias("ratio_band"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("ratio"), 6).alias("avg_ratio"),
        )
        .orderBy("ratio_band")
    )


# ---------------------------------------------------------------------------
# Gopher-style rule funnel (Rae et al. 2021, MassiveText §A1.1 adapted to
# this corpus's measured distributions): five independent document-quality
# rules, reported BOTH ways a pipeline needs them — per-rule independent
# kill counts (what each rule would drop alone) and the sequential
# survivor funnel (what's left after applying rules 1..i in order).
# Complements quality_scores (a weighted composite) with the
# rule-attribution view used to TUNE a filter stack.
#
# Scale shape: one documents scan projecting (text) only, all five
# signals are whole-stage-codegen column folds over the token array
# (no UDF, no shuffle), one keyless aggregate, 5-row stack. At 100 TB
# this is a single map-side pass.
# ---------------------------------------------------------------------------
GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 90
GOPHER_MWL_LO = 4.0    # mean-word-length window (Gopher: 3..10, tightened
GOPHER_MWL_HI = 5.0    # to this corpus's measured 3.7..5.3 range)
GOPHER_MIN_STOPWORD_FRAC = 0.03
GOPHER_MAX_DUP_BIGRAM_FRAC = 0.08
GOPHER_MIN_ALPHA_FRAC = 0.8

_SW = "('a','and','in','is','of','the','to')"

_GOPHER_RULES = (
    ("token_count_20_90", "p1"),
    ("mean_word_len_4_5", "p2"),
    ("stopword_frac_ge_003", "p3"),
    ("dup_bigram_frac_le_008", "p4"),
    ("alpha_token_frac_ge_08", "p5"),
)


@register(
    "gopher_rule_funnel",
    oracle=f"""
        WITH {_SQL_TOKS},
        s AS (
            SELECT doc_id, len(tk) AS n,
                   coalesce(list_aggregate(list_transform(tk, x -> length(x)), 'sum'), 0)::DOUBLE
                       / greatest(len(tk), 1) AS mwl,
                   len(list_filter(tk, x -> x IN {_SW}))::DOUBLE
                       / greatest(len(tk), 1) AS swf,
                   CASE WHEN len(tk) > 1
                        THEN 1.0 - len(list_distinct(list_transform(
                                 range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1])))::DOUBLE
                             / (len(tk) - 1)
                        ELSE 0.0 END AS dupbi,
                   len(list_filter(tk, x -> regexp_matches(x, '^[a-z]+$')))::DOUBLE
                       / greatest(len(tk), 1) AS alpha
            FROM toks
        ),
        p AS (
            SELECT (n BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS}) AS p1,
                   (mwl >= {GOPHER_MWL_LO} AND mwl <= {GOPHER_MWL_HI}) AS p2,
                   (swf >= {GOPHER_MIN_STOPWORD_FRAC}) AS p3,
                   (dupbi <= {GOPHER_MAX_DUP_BIGRAM_FRAC}) AS p4,
                   (alpha >= {GOPHER_MIN_ALPHA_FRAC}) AS p5
            FROM s
        ),
        a AS (
            SELECT sum(CASE WHEN NOT p1 THEN 1 ELSE 0 END)::BIGINT AS f1,
                   sum(CASE WHEN NOT p2 THEN 1 ELSE 0 END)::BIGINT AS f2,
                   sum(CASE WHEN NOT p3 THEN 1 ELSE 0 END)::BIGINT AS f3,
                   sum(CASE WHEN NOT p4 THEN 1 ELSE 0 END)::BIGINT AS f4,
                   sum(CASE WHEN NOT p5 THEN 1 ELSE 0 END)::BIGINT AS f5,
                   sum(CASE WHEN p1 THEN 1 ELSE 0 END)::BIGINT AS c1,
                   sum(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END)::BIGINT AS c2,
                   sum(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END)::BIGINT AS c3,
                   sum(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END)::BIGINT AS c4,
                   sum(CASE WHEN p1 AND p2 AND p3 AND p4 AND p5 THEN 1 ELSE 0 END)::BIGINT AS c5
            FROM p
        )
        SELECT 1::BIGINT AS rule_idx, 'token_count_20_90' AS rule,
               f1 AS n_fail_indep, c1 AS n_survive_cum FROM a
        UNION ALL SELECT 2, 'mean_word_len_4_5', f2, c2 FROM a
        UNION ALL SELECT 3, 'stopword_frac_ge_003', f3, c3 FROM a
        UNION ALL SELECT 4, 'dup_bigram_frac_le_008', f4, c4 FROM a
        UNION ALL SELECT 5, 'alpha_token_frac_ge_08', f5, c5 FROM a
        ORDER BY rule_idx
    """,
)
def gopher_rule_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule independent fail counts + sequential survivor funnel for
    the five Gopher-style quality rules. One scan, one keyless agg."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.filter(T.tokens(F.col("text")), lambda t: t != "")
    n = F.size(tk)
    charsum = F.aggregate(tk, F.lit(0), lambda acc, x: acc + F.length(x))
    mwl = charsum.cast("double") / F.greatest(n, F.lit(1))
    swf = T.stopword_count(F.col("text")).cast("double") / F.greatest(n, F.lit(1))
    total_bi = F.greatest(n - 1, F.lit(0))
    distinct_bi = F.size(T.word_shingles(F.col("text"), 2))
    dupbi = F.when(
        total_bi > 0, F.lit(1.0) - distinct_bi.cast("double") / total_bi
    ).otherwise(F.lit(0.0))
    alpha = (
        F.size(F.filter(tk, lambda t: t.rlike("^[a-z]+$"))).cast("double")
        / F.greatest(n, F.lit(1))
    )
    scored = docs.select(
        n.between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS).alias("p1"),
        ((mwl >= GOPHER_MWL_LO) & (mwl <= GOPHER_MWL_HI)).alias("p2"),
        (swf >= GOPHER_MIN_STOPWORD_FRAC).alias("p3"),
        (dupbi <= GOPHER_MAX_DUP_BIGRAM_FRAC).alias("p4"),
        (alpha >= GOPHER_MIN_ALPHA_FRAC).alias("p5"),
    )
    aggs = []
    for i in range(1, 6):
        aggs.append(
            F.sum(F.when(~F.col(f"p{i}"), 1).otherwise(0)).alias(f"f{i}")
        )
        cum = F.col("p1")
        for j in range(2, i + 1):
            cum = cum & F.col(f"p{j}")
        aggs.append(F.sum(F.when(cum, 1).otherwise(0)).alias(f"c{i}"))
    stack_args = ", ".join(
        f"CAST({i + 1} AS BIGINT), '{name}', f{i + 1}, c{i + 1}"
        for i, (name, _) in enumerate(_GOPHER_RULES)
    )
    return (
        scored.agg(*aggs)
        .selectExpr(
            f"stack(5, {stack_args}) AS (rule_idx, rule, n_fail_indep, n_survive_cum)"
        )
        .orderBy("rule_idx")
    )


# ---------------------------------------------------------------------------
# Bloom-screened decontamination (round 7): the SCALABLE eval-decon
# shape. curation's trigram decon broadcasts the holdout vocabulary —
# fine for one benchmark, impossible when the holdout is every eval
# suite (millions of n-grams). Here the holdout's trigrams compress to
# a fixed-size Bloom bitmap inlined as a literal predicate on the
# corpus trigram scan (operators/sketches.bloom_prune — the same
# execute-build-side-then-inline move as Spark's runtime bloom
# injection), so only might-match trigrams ever shuffle to the exact
# join. The Bloom is LOSSLESS for the final answer (no false negatives;
# false positives die at the exact join), so the DuckDB twin is the
# plain decon SQL — the sketch changes the plan, not the result
# (pruning power measured in test_quality's plan test, not here).
# ---------------------------------------------------------------------------
DECON_MIN_SHARED = 3
DECON_HOLDOUT_MOD = 100  # doc_id % mod == 7 -> holdout member


@register(
    "bloom_decontamination",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   list_filter(string_split(text, ' '), t -> t <> '') AS tk
            FROM documents
        ),
        tri AS (
            SELECT doc_id, lang,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(tk) - 2, 0) + 1),
                       i -> tk[i] || '_' || tk[i + 1] || '_' || tk[i + 2]))) AS s
            FROM toks
        ),
        ho AS (
            SELECT DISTINCT s FROM tri WHERE doc_id % {DECON_HOLDOUT_MOD} = 7
        ),
        hits AS (
            SELECT t.doc_id, any_value(t.lang) AS lang,
                   count(DISTINCT t.s) AS n_shared
            FROM tri t JOIN ho USING (s)
            WHERE t.doc_id % {DECON_HOLDOUT_MOD} <> 7
            GROUP BY t.doc_id
        ),
        train AS (
            SELECT doc_id, lang FROM documents
            WHERE doc_id % {DECON_HOLDOUT_MOD} <> 7
        )
        SELECT tr.lang AS lang,
               count(*) AS n_docs,
               sum(CASE WHEN h.n_shared >= {DECON_MIN_SHARED} THEN 1 ELSE 0 END)
                   ::BIGINT AS n_contaminated
        FROM train tr LEFT JOIN hits h ON tr.doc_id = h.doc_id
        GROUP BY tr.lang
        ORDER BY lang
    """,
)
def bloom_decontamination(
    spark: SparkSession, sf_dir: str, bloom_bits: int = 1 << 17
) -> DataFrame:
    """Per-language contamination counts of the train split against the
    holdout split's trigram vocabulary, with the corpus-side trigram
    stream Bloom-screened before the exact join. Holdout = doc_id %
    {mod} == 7 — 1% of docs, enough to contaminate a visible band at
    every fixture scale."""
    from bigdata_processing_spark.operators.sketches import bloom_prune

    docs = load_table(spark, sf_dir, "documents")
    is_ho = F.col("doc_id") % DECON_HOLDOUT_MOD == 7
    tri = docs.select(
        "doc_id", "lang",
        F.explode(T.word_shingles(F.col("text"), 3)).alias("s"),
    )
    ho_tri = tri.filter(is_ho).select("s").distinct()
    train_tri = tri.filter(~is_ho)
    # the Bloom literal predicate sits ON THE SCAN side: only trigrams
    # that might be in the holdout reach the exact join's shuffle
    screened = bloom_prune(train_tri, ho_tri, "s", "s", bits=bloom_bits)
    hits = (
        screened.join(ho_tri, "s")  # exact: false positives die here
        .groupBy("doc_id")
        # count(*) == countDistinct(s): word_shingles(3) is per-doc
        # DISTINCT and ho_tri is one row per s, so the joined rows are
        # unique (doc_id, s) — skip the distinct expand (r12)
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= DECON_MIN_SHARED)
        .select("doc_id")
    )
    train = docs.filter(~is_ho).select("doc_id", "lang")
    return (
        train.join(hits.withColumn("hit", F.lit(1)), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_contaminated"),
        )
        .orderBy("lang")
    )
