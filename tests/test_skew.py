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


def test_overcap_bucket_representatives_recover_template_family(spark, tmp_path):
    """A 50-member MUTATED-clone family (near- but not exact-dups — the
    boilerplate-template class that dominates real web corpora) lands in
    over-cap LSH buckets. Skipping those buckets whole (the pre-round-6
    behavior) silently KEPT the family: exact dedup sees no identical
    text, recall was 0. The representative pass must rescue it at
    bounded cost: ceil(B/MAX_BUCKET) hash-ordered representatives per
    over-cap bucket, members paired against representatives only, and
    connected components still merges the stars into ONE family
    cluster."""
    import os

    from pyspark.sql import functions as F

    from bigdata_processing_spark.queries.dedup import (
        _scored_candidates,
        clear_dedup_memos,
        dedup_exact_summary,
        dup_clusters,
        minhash_lsh_dup_pairs,
    )

    # 1000 background docs so the relative DF cap (ceil(0.08*1050)=84)
    # KEEPS the family's shared bigrams (df=50) — at real scale the
    # fraction term always clears a bounded-size family, so the bucket
    # cap is the only guard standing between the family and recall
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon "
            "phi chi psi omega one two three four five six")
    rows = [
        (i, f"background doc {i} tokens a{i} b{i*3} c{i*7} d{i*11}", "bg")
        for i in range(1000)
    ] + [(5000 + i, base + f" mutation{i}", "tmpl") for i in range(50)]
    sf = os.path.join(str(tmp_path), "tmplsf")
    spark.createDataFrame(rows, "doc_id bigint, text string, source string") \
        .write.parquet(os.path.join(sf, "documents.parquet"))

    clear_dedup_memos()
    # exact dedup CANNOT catch this family (every member distinct)
    assert dedup_exact_summary(spark, sf).collect()[0].n_removed == 0

    # bounded candidates: 2 representatives x 50 members (x4 bands,
    # distinct) — not the 1225 all-pairs expansion
    n_cand = _scored_candidates(spark, sf).count()
    assert 0 < n_cand < 300, f"expected bounded star candidates, got {n_cand}"

    # recall > 0 where the skip-whole behavior produced 0, and every
    # surfaced pair is family-internal and exactly verified
    pairs = minhash_lsh_dup_pairs(spark, sf)
    fam = pairs.filter((F.col("d1") >= 5000) & (F.col("d2") >= 5000)).count()
    assert fam > 0 and fam == pairs.count()

    # the representative stars connect the WHOLE family into one cluster
    cl = dup_clusters(spark, sf).filter(F.col("doc_id") >= 5000)
    got = cl.agg(
        F.count("*").alias("n"),
        F.countDistinct("cluster_id").alias("k"),
    ).collect()[0]
    assert (got.n, got.k) == (50, 1)
    clear_dedup_memos()


def test_rep_star_pairs_properties(spark):
    """Property check (hypothesis): on arbitrary bucket member lists,
    rep_star_pairs (a) emits nothing for at-or-under-cap buckets,
    (b) covers every member of an over-cap bucket with at least one
    star pair, (c) keeps every pair anchored on a representative with
    the star graph connected (CC can recover the family whole), and
    (d) is invariant under member-array permutation — the md5 ordering,
    not ingestion order, picks representatives."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdata_processing_spark.operators.skew import rep_star_pairs

    def run(ds, max_bucket):
        df = spark.createDataFrame(
            [("b", d) for d in ds], "bk string, doc_id bigint"
        )
        return {(r.d1, r.d2) for r in rep_star_pairs(df, max_bucket).collect()}

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
        st.integers(2, 12),
    )
    def check(ds, max_bucket):
        pairs = run(ds, max_bucket)
        if len(ds) <= max_bucket:
            assert pairs == set()
            return
        import math

        n_reps = math.ceil(len(ds) / max_bucket)
        # representative set = what the pairs are anchored on
        import hashlib

        reps = set(
            sorted(ds, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))[
                :n_reps
            ]
        )
        covered = {d for p in pairs for d in p}
        assert covered == set(ds) or (len(ds) == 1 and pairs == set())
        assert all(p[0] in reps or p[1] in reps for p in pairs)
        assert all(p[0] < p[1] for p in pairs)
        # star graph connects the family: union-find over the pairs
        parent = {d: d for d in ds}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        assert len({find(d) for d in ds}) == 1
        # permutation invariance
        assert run(list(reversed(ds)), max_bucket) == pairs

    check()


def test_rep_star_pairs_cap_bounds_hot_buckets(spark):
    """Round-7 scale fix: uncapped ceil(B/max_bucket) reps are QUADRATIC
    in B (a hot 16-bit simhash band value holding ~1e5 docs OOM'd an
    8 GB JVM — both via rep count and via materializing every star pair
    of a bucket inside ONE array row). Reps are now capped at
    MAX_BUCKET_REPS and (round 8) rank-selected from the FLAT band table
    — no member arrays anywhere. Small buckets (where ceil(B/25) <= 64 —
    every oracle-checked scale) are bit-identical."""
    from pyspark.sql import functions as F

    from bigdata_processing_spark.operators.skew import rep_star_pairs
    from bigdata_processing_spark.thresholds import MAX_BUCKET_REPS

    def star_pairs(n_members, max_bucket):
        band = spark.range(n_members).select(
            F.lit("bk0").alias("bk"), F.col("id").alias("doc_id")
        )
        return rep_star_pairs(band, max_bucket)

    # hot bucket: 2,000 members -> uncapped would take ceil(2000/25)=80
    # reps; capped takes 64 -> distinct pairs = 64*(B-1) - C(64,2)
    B = 2_000
    got = star_pairs(B, 25).distinct().count()
    assert got == MAX_BUCKET_REPS * (B - 1) - (MAX_BUCKET_REPS * (MAX_BUCKET_REPS - 1)) // 2
    # linear-in-B work bound: pairs <= 64*B regardless of bucket size
    assert got <= MAX_BUCKET_REPS * B

    # under the cap (ceil(100/25)=4 reps) the geometry is unchanged
    got_small = star_pairs(100, 25).distinct().count()
    assert got_small == 4 * 99 - (4 * 3) // 2


def test_rep_star_pairs_plan_is_array_free(spark):
    """Round-8 shape pin: the star path must carry NO per-bucket member
    array — representatives come from a rank-select window over the
    flat band table and join back on bk (per-row memory O(1); the
    collect_set form meant ~160 MB single rows at a 1e7-member
    boilerplate band). The physical plan therefore contains a Window
    and no object-hash aggregate (collect_list/collect_set)."""
    from pyspark.sql import functions as F

    from bigdata_processing_spark.operators.skew import rep_star_pairs

    band = spark.range(100).select(
        F.concat(F.lit("b"), F.pmod("id", F.lit(4)).cast("string")).alias("bk"),
        F.col("id").alias("doc_id"),
    )
    plan = rep_star_pairs(band, 10)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # the literal ≤ MAX_BUCKET_REPS rank filter must reach the sort as a
    # WindowGroupLimit (bounded top-k heap per bucket, not a full
    # per-bucket sort — the full sort was a measured memory regression
    # at the 100× simhash corpus)
    assert "WindowGroupLimit" in plan
    assert "collect_list" not in plan and "collect_set" not in plan
    assert "ObjectHashAggregate" not in plan
