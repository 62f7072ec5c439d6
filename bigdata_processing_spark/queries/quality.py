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
    base = docs.select(
        "doc_id", split.alias("split"), T.word_shingles(F.col("text"), 3).alias("s3")
    )
    train_vocab = (
        base.filter(F.col("split") == "train").select(F.explode("s3").alias("s")).distinct()
    )
    test_ex = (
        base.filter((F.col("split") == "test") & (F.size("s3") > 0))
        .select("doc_id", F.size("s3").alias("n_sh"), F.explode("s3").alias("s"))
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
