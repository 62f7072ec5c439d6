"""NLP-pipeline queries: TF-IDF term scoring and dataset profiling.

TF-IDF is the classic corpus-statistics operator: term frequencies are
per-document (map-side), document frequencies are one corpus aggregate,
and the join back is by token — the same dictionary-join shape as the
MinHash vocabulary encoding (queries/dedup.py). All JVM-side."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.queries import register


# ---------------------------------------------------------------------------
# Top-3 TF-IDF terms per document (sample of 20 docs; tf and idf both
# computed over the FULL corpus — only the final per-doc ranking is
# sampled).
# ---------------------------------------------------------------------------
@register(
    "tfidf_top_terms",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
            FROM documents
        ),
        tf AS (
            SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok
        ),
        df AS (
            SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY tok
        ),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.tok,
                   round(tf.tf * ln(n.n_docs::DOUBLE / df.df), 9) AS tfidf
            FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
        )
        SELECT doc_id, tok, tfidf, rn FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS rn
            FROM scored
        )
        WHERE rn <= 3 AND doc_id < 20
        ORDER BY doc_id, rn
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = tok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()  # one scalar; the corpus size
    scored = tf.join(F.broadcast(df), "tok").select(
        "doc_id",
        "tok",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 9).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter((F.col("rn") <= 3) & (F.col("doc_id") < 20))
        .orderBy("doc_id", "rn")
    )


# ---------------------------------------------------------------------------
# Dataset profiling: per-column null rate / distinct count / extrema for
# the orders table — the data-quality pass a training pipeline runs
# before ingest. One scan; per-column stats as a long-format union.
# ---------------------------------------------------------------------------
@register(
    "profile_orders",
    oracle="""
        SELECT 'o_custkey' AS col, count(*) AS n,
               count(*) - count(o_custkey) AS n_null,
               count(DISTINCT o_custkey) AS n_distinct,
               min(o_custkey)::VARCHAR AS min_v, max(o_custkey)::VARCHAR AS max_v
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
               count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
               count(DISTINCT o_totalprice),
               round(min(o_totalprice), 2)::VARCHAR, round(max(o_totalprice), 2)::VARCHAR
        FROM orders
        ORDER BY col
    """,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def prof(col: str, render):
        return orders.agg(
            F.lit(col).alias("col"),
            F.count("*").alias("n"),
            (F.count("*") - F.count(col)).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            render(F.min(col)).alias("min_v"),
            render(F.max(col)).alias("max_v"),
        )

    as_str = lambda c: c.cast("string")  # noqa: E731
    as_money = lambda c: F.round(c, 2).cast("string")  # noqa: E731
    return (
        prof("o_custkey", as_str)
        .unionByName(prof("o_orderstatus", as_str))
        .unionByName(prof("o_totalprice", as_money))
        .orderBy("col")
    )
