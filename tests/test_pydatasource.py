"""Custom Python data source: executor-side corpus generation is
deterministic, partition-parallel, and feeds the text operators
unmodified."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_processing_spark.sources.pydatasource import register


def _load(spark, **opts):
    register(spark)
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_generated_corpus_shape_and_determinism(spark):
    df = _load(spark, n_docs=500, n_partitions=4)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 500
    ids = df.agg(F.min("doc_id"), F.max("doc_id"), F.countDistinct("doc_id")).collect()[0]
    assert tuple(ids) == (0, 499, 500)

    # determinism: same options → identical corpus; different
    # parallelism → STILL identical corpus (content is f(doc_id) only)
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in _load(spark, n_docs=500, n_partitions=7).collect())
    assert a == b

    langs = {r.lang for r in df.select("lang").distinct().collect()}
    assert "en" in langs and len(langs) >= 3


def test_generated_corpus_feeds_text_operators(spark):
    from bigdata_processing_spark.functions import text as T

    df = _load(spark, n_docs=200, n_partitions=4, min_tokens=10, max_tokens=30)
    stats = (
        df.select(T.token_count(F.col("text")).alias("n"))
        .agg(F.min("n"), F.max("n"))
        .collect()[0]
    )
    assert stats[0] >= 10 and stats[1] <= 30

    sigs = df.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))
    assert sigs.filter(F.col("fp").isNull()).count() == 0
