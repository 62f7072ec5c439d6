"""AQE skew handling: a join with one pathological hot key completes
with correct results (AQE splits the skewed partition; salting handles
the aggregation side — operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_processing_spark.operators.skew import salted_agg


def _skewed(spark, n=200_000, hot_frac=0.95):
    """~95% of rows share key 0; the rest spread over 1000 keys."""
    hot = int(n * hot_frac)
    return spark.range(n).select(
        F.when(F.col("id") < hot, F.lit(0))
        .otherwise((F.col("id") % 1000) + 1)
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def test_skewed_join_correct(spark):
    left = _skewed(spark)
    dim = spark.range(1001).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = left.join(dim, "k")
        total = joined.agg(
            F.count("*").alias("n"), F.sum("w").alias("sw")
        ).collect()[0]
        assert total.n == left.count()
        # hot key contributes w=0; the rest contribute k*10 each
        expected_sw = sum(
            r.k * 10 for r in left.filter(F.col("k") > 0).collect()
        )
        assert total.sw == expected_sw
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_skewed_salted_agg_correct(spark):
    df = _skewed(spark)
    plain = {
        r.k: (round(r.s, 6), r.c)
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("v").alias("c")).collect()
    }
    salted = {
        r.k: (round(r.s, 6), r.c)
        for r in salted_agg(df, ["k"], {"s": ("sum", "v"), "c": ("count", "v")}, n_salts=32).collect()
    }
    assert plain == salted
    assert plain[0][1] == 190_000  # the hot key really is hot


def test_salted_join_matches_plain_join(spark):
    from bigdata_processing_spark.operators.skew import salted_join

    left = _skewed(spark, n=50_000)
    dim = spark.range(1001).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    plain = left.join(dim, "k").agg(
        F.count("*").alias("n"), F.sum("w").alias("sw"), F.sum("v").alias("sv")
    ).collect()[0]
    salted = salted_join(left, dim, "k", n_salts=8).agg(
        F.count("*").alias("n"), F.sum("w").alias("sw"), F.sum("v").alias("sv")
    ).collect()[0]
    assert tuple(plain) == tuple(salted)


def test_lsh_bucket_cap_bounds_hot_template(spark, tmp_path):
    """A template text duplicated 300x creates one giant LSH bucket —
    the classic dedup skew key (C(300,2) ≈ 45k candidate pairs from one
    bucket). The bucket-capped pipeline must SKIP it (bounded candidate
    work), while exact dedup still accounts for the duplication — the
    division of labor the guards are designed around: exact dedup
    handles identical text, MinHash handles near-dups, and the cap
    keeps pathological buckets from going quadratic."""
    import os

    from pyspark.sql import functions as F

    from bigdata_processing_spark.queries.dedup import (
        clear_dedup_memos,
        dedup_exact_summary,
        minhash_lsh_dup_pairs,
        minhash_unguarded_dup_pairs,
    )

    hot = "the same boilerplate template text repeated across the corpus "
    rows = [(i, hot, "hotsrc") for i in range(300)] + [
        (1000 + i, f"unique document number {i} with words w{i} x{i*3} y{i*7}", "cold")
        for i in range(200)
    ]
    sf = os.path.join(str(tmp_path), "skewsf")
    spark.createDataFrame(rows, "doc_id bigint, text string, source string") \
        .write.parquet(os.path.join(sf, "documents.parquet"))

    clear_dedup_memos()
    # guards are DEFAULT-ON: the production entry point skips the 300-doc
    # bucket (> MAX_BUCKET=25) without being asked
    pruned = minhash_lsh_dup_pairs(spark, sf).count()
    assert pruned < 1000, f"bucket cap failed: {pruned} pairs from a hot template"

    # the unguarded audit baseline pays the quadratic bucket — that
    # contrast is the measured reason the guards default on
    full = minhash_unguarded_dup_pairs(spark, sf).count()
    assert full >= 300 * 299 // 2  # all template pairs verified identical

    # exact dedup still catches the duplication the cap skipped
    ex = dedup_exact_summary(spark, sf).collect()[0]
    assert ex.n_removed >= 299
    clear_dedup_memos()


def test_relative_df_cap_preserves_recall_at_scale(spark, tmp_path):
    """The r05 scale bug, pinned: document frequency scales with corpus
    size, so an ABSOLUTE df cap eventually prunes the whole vocabulary
    and candidate generation silently returns zero pairs (measured at
    10x sf0.1 before the fix). This corpus makes every bigram's df land
    between the absolute floor (40) and the relative cap
    (ceil(0.08 * 2000) = 160): the production default must still find
    the planted clone pairs; the absolute-only configuration
    (max_df_frac=0) must find nothing."""
    import os

    from bigdata_processing_spark.queries.dedup import (
        _scored_candidates,
        _verified_dup_pairs,
        clear_dedup_memos,
    )

    # 200 clone families x 10 copies; family f's text is a 6-token
    # window t_f..t_{f+5} over a 200-token ring, so every bigram is
    # shared by 5 families = 50 docs: above the 40 floor, below the
    # 160 relative cap.
    rows = []
    for fam in range(200):
        text = " ".join(f"t{(fam + j) % 200}" for j in range(6))
        for c in range(10):
            rows.append((fam * 10 + c, text, "src"))
    sf = os.path.join(str(tmp_path), "scalesf")
    spark.createDataFrame(rows, "doc_id bigint, text string, source string") \
        .write.parquet(os.path.join(sf, "documents.parquet"))

    clear_dedup_memos()
    # production default (relative cap): clone pairs are found
    assert _scored_candidates(spark, sf).count() > 0
    pairs = _verified_dup_pairs(spark, sf).count()
    assert pairs > 0, "relative DF cap lost all recall on a scaled corpus"

    # absolute-only cap: every bigram (df=50) crosses 40 -> nothing
    clear_dedup_memos()
    assert _scored_candidates(spark, sf, max_df_frac=0.0).count() == 0
    clear_dedup_memos()
