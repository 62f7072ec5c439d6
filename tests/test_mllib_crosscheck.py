"""Cross-check: spark.ml's MinHashLSH (the library implementation of the
same algorithm) must find the near-dup pairs our md5-based pipeline
verifies — two independent implementations agreeing on the planted
duplicates is strong evidence both are right."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_ORACLE

from bigdata_processing_spark.queries.dedup import (
    JACCARD_THRESHOLD,
    _shingle_df,
    _verified_dup_pairs,
)


def test_mllib_minhash_agrees(spark):
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    ours = {
        (r.d1, r.d2)
        for r in _verified_dup_pairs(spark, SF_ORACLE).collect()
    }
    assert ours, "fixture should contain planted near-dups"

    shset = _shingle_df(spark, SF_ORACLE).filter(F.size("sh") > 0)
    cv = CountVectorizer(inputCol="sh", outputCol="features", binary=True)
    model = cv.fit(shset)
    feats = model.transform(shset)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    lsh_model = lsh.fit(feats)
    # distance threshold = 1 - jaccard
    pairs = (
        lsh_model.approxSimilarityJoin(feats, feats, 1 - JACCARD_THRESHOLD, "dist")
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("d1"),
            F.col("datasetB.doc_id").alias("d2"),
        )
    )
    mllib = {(r.d1, r.d2) for r in pairs.collect()}
    # Both are LSH-candidate-based: our pipeline verifies with EXACT
    # jaccard, so every pair we emit is truly >= threshold and MLlib's
    # exact-distance filter must agree on those candidates it generated.
    # Require substantial agreement (candidate generation is probabilistic
    # on both sides, with different hash families).
    common = ours & mllib
    assert len(common) >= 0.8 * len(ours), (len(ours), len(mllib), len(common))
