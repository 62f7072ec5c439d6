"""KMV distinct sketch (operators/sketches.py): determinism, accuracy,
losslessness of the salted two-stage k-min, and the HLL comparison the
sketch replaced on the query surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL
from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.operators.sketches import hash01, kmv_distinct


def test_hash01_uniform_and_deterministic(spark):
    df = spark.range(0, 2000).select(hash01(F.col("id")).alias("h"))
    rows = [r.h for r in df.collect()]
    assert all(0.0 <= h < 1.0 for h in rows)
    assert len(set(rows)) == 2000  # no collisions on small domains
    # deterministic: same values on re-evaluation
    assert rows == [r.h for r in df.collect()]
    # roughly uniform: mean of U(0,1) within a loose band
    mean = sum(rows) / len(rows)
    assert 0.45 < mean < 0.55


def test_kmv_exact_below_k(spark):
    """Groups with < k distinct keys report the exact count."""
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", i % 3) for i in range(50)],
        "g string, key int",
    )
    out = {r.g: r.kmv_est for r in kmv_distinct(df, "key", ["g"], k=64).collect()}
    assert out == {"a": 7.0, "b": 3.0}


def test_kmv_estimate_accuracy(spark):
    """k=256 KMV is within ~3 standard errors (1/sqrt(k-2) ≈ 6.3%) of a
    10k-distinct truth — a deterministic fixture, so this never flakes."""
    df = spark.range(0, 10_000).select(F.lit("g").alias("g"), F.col("id").alias("key"))
    est = kmv_distinct(df, "key", ["g"], k=256).collect()[0].kmv_est
    assert abs(est - 10_000) / 10_000 < 3 / (254 ** 0.5)


def test_kmv_salting_is_lossless(spark):
    """Any n_salts gives the identical estimate: every global k-min hash
    is a k-min within its salt."""
    df = spark.range(0, 5_000).select(
        (F.col("id") % 2).cast("string").alias("g"), F.col("id").alias("key")
    )
    a = sorted((r.g, r.kmv_est) for r in kmv_distinct(df, "key", ["g"], k=64, n_salts=1).collect())
    b = sorted((r.g, r.kmv_est) for r in kmv_distinct(df, "key", ["g"], k=64, n_salts=32).collect())
    assert a == b


def test_kmv_tracks_exact_on_fixture(spark):
    """On the events fixture the estimate lands within the k=64 error
    band of the exact per-type distinct-user counts."""
    events = load_table(spark, SF_SMALL, "events")
    est = kmv_distinct(events, "user_id", ["event_type"], k=64)
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact")
    )
    for r in est.join(exact, "event_type").collect():
        assert abs(r.kmv_est - r.exact) / r.exact < 0.5, r


def test_hll_agrees_with_exact(spark):
    """approx_count_distinct (HLL++) stays on the operator surface even
    though the KMV sketch took the oracle-checked slot: rsd=0.02 should
    land within ~5x rsd of exact on the fixture."""
    events = load_table(spark, SF_SMALL, "events")
    rows = (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("hll"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.hll - r.exact) / r.exact < 0.10, r


# ---------------------------------------------------------------------------
# Bloom-bitmap join pruning
# ---------------------------------------------------------------------------

def test_bloom_prune_superset_and_exact_composition(spark):
    """The bitmap pass never drops a true match (no false negatives),
    and pruned-then-exact-join is row-identical to the plain semi-join.
    Both forms — the literal-predicate default and the join-probe
    variant — must agree row-for-row."""
    from bigdata_processing_spark.operators.sketches import (
        bloom_prune,
        bloom_prune_join,
    )

    li = load_table(spark, SF_SMALL, "lineitem")
    small = load_table(spark, SF_SMALL, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    pruned = bloom_prune(li, small, "l_orderkey", "o_orderkey")
    exact = li.join(small, li.l_orderkey == small.o_orderkey, "left_semi")
    assert pruned.columns == li.columns  # schema passes through untouched
    # superset: every exact match survives the prune
    assert exact.join(
        pruned.select("l_orderkey", "l_linenumber"),
        ["l_orderkey", "l_linenumber"], "left_anti",
    ).count() == 0
    # composition: prune + exact join == plain join
    composed = pruned.join(small, pruned.l_orderkey == small.o_orderkey, "left_semi")
    assert composed.count() == exact.count()
    # the distributed join-probe variant admits the same row set
    via_join = bloom_prune_join(li, small, "l_orderkey", "o_orderkey")
    assert via_join.count() == pruned.count()
    assert via_join.select("l_orderkey", "l_linenumber").exceptAll(
        pruned.select("l_orderkey", "l_linenumber")
    ).count() == 0
    # schema passthrough holds even when the big side LEGITIMATELY owns
    # columns named like the bitmap's (word/bword) — the probe state uses
    # collision-safe __bf_state_* names internally
    li_w = li.withColumn("word", F.lit("keep")).withColumn("bword", F.lit(7))
    probed_w = bloom_prune_join(li_w, small, "l_orderkey", "o_orderkey")
    assert probed_w.columns == li_w.columns
    assert probed_w.filter(
        (F.col("word") != "keep") | (F.col("bword") != 7)
    ).count() == 0


def test_bloom_prune_false_positive_rate(spark):
    """FPR tracks n_small/bits: non-matching rows leak through at
    roughly the single-hash Bloom rate, and more bits mean fewer leaks."""
    from bigdata_processing_spark.operators.sketches import bloom_prune

    li = load_table(spark, SF_SMALL, "lineitem")
    small = load_table(spark, SF_SMALL, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    n_small = small.count()
    exact_n = li.join(small, li.l_orderkey == small.o_orderkey, "left_semi").count()
    nonmatch = li.count() - exact_n
    for bits in (1 << 14, 1 << 17):
        leaked = bloom_prune(li, small, "l_orderkey", "o_orderkey", bits=bits).count() - exact_n
        fpr = leaked / nonmatch
        assert fpr < 3.0 * n_small / bits, (bits, fpr)
    # empty filter side prunes everything
    assert bloom_prune(li, small.limit(0), "l_orderkey", "o_orderkey").count() == 0


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

def _zipf_df(spark, n_keys=200, scale=2000):
    """Deterministic Zipf-ish frequencies: key k appears ⌈scale/k⌉ times."""
    rows = [(k,) for k in range(1, n_keys + 1) for _ in range(scale // k)]
    return spark.createDataFrame(rows, "key int")


def test_cms_never_underestimates(spark):
    """est ≥ true for every key — the CMS one-sided error guarantee."""
    from bigdata_processing_spark.operators.sketches import cms_estimates

    df = _zipf_df(spark)
    est = cms_estimates(df, "key", df.select("key").distinct(), width=64)
    exact = df.groupBy("key").agg(F.count("*").alias("exact"))
    j = est.join(exact, "key")
    assert j.filter(F.col("cms_est") < F.col("exact")).count() == 0
    # width=64 on ~15k rows: mean overestimate bounded by a few N/w
    avg_over = j.agg(F.avg(F.col("cms_est") - F.col("exact"))).collect()[0][0]
    n = df.count()
    assert 0 <= avg_over < 3 * n / 64


def test_cms_deterministic_and_width_shrinks_error(spark):
    from bigdata_processing_spark.operators.sketches import cms_estimates

    df = _zipf_df(spark, n_keys=100, scale=1000)
    probes = df.select("key").distinct()
    a = sorted(tuple(r) for r in cms_estimates(df, "key", probes, width=64).collect())
    b = sorted(tuple(r) for r in cms_estimates(df, "key", probes, width=64).collect())
    assert a == b  # md5 buckets: bit-identical across runs
    exact = {r.key: r.exact for r in df.groupBy("key").agg(F.count("*").alias("exact")).collect()}
    def total_over(width):
        rows = cms_estimates(df, "key", probes, width=width).collect()
        return sum(r.cms_est - exact[r.key] for r in rows)
    assert total_over(1024) <= total_over(64)


def test_cms_heavy_hitters_exact_output(spark):
    """Two-pass heavy hitters returns exactly GROUP BY HAVING — the
    sketch can only widen the candidate set, never narrow the answer."""
    from bigdata_processing_spark.operators.sketches import cms_heavy_hitters

    df = _zipf_df(spark)
    got = sorted(
        tuple(r) for r in cms_heavy_hitters(df, "key", min_count=50, width=64).collect()
    )
    want = sorted(
        tuple(r)
        for r in df.groupBy("key")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 50)
        .collect()
    )
    assert got == want and len(want) > 0


def test_kmv_merge_equals_direct_union_sketch(spark):
    """Merging two cohorts' k-min sets and re-cutting to k gives the
    IDENTICAL sketch (hence estimate) as sketching the union of rows
    directly — the losslessness that makes KMV mergeable."""
    from bigdata_processing_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_minset,
    )

    orders = load_table(spark, SF_SMALL, "orders")
    yr = F.year("o_orderdate")
    tagged = orders.filter(yr.isin(1995, 1996)).select(
        F.when(yr == 1995, "a").otherwise("b").alias("tag"), "o_custkey"
    )
    k = 64
    ms = kmv_minset(tagged, "o_custkey", ["tag"], k=k)
    merged = kmv_merge(ms.select(F.lit("u").alias("tag"), "h"), ["tag"], k)
    direct = kmv_minset(
        tagged.select(F.lit("u").alias("tag"), "o_custkey"), "o_custkey", ["tag"], k=k
    )
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in direct.collect()
    )
    est_m = kmv_estimate(merged, ["tag"], k).collect()[0].kmv_est
    est_d = kmv_estimate(direct, ["tag"], k).collect()[0].kmv_est
    assert est_m == est_d


def test_bottomk_sample_deterministic_and_mergeable(spark):
    """The bottom-k-by-md5 sample is (a) stable across invocations and
    partitionings, (b) mergeable: bottom-k of a union == re-cut of the
    parts' bottom-k samples — the property that lets per-shard samples
    roll up without touching raw rows."""
    from bigdata_processing_spark.operators.sketches import (
        bottomk_sample,
        hash01,
    )

    events = load_table(spark, SF_SMALL, "events")
    k = 32
    s1 = {r.event_id for r in
          bottomk_sample(events, "event_id", ["event_type"], k).collect()}
    s2 = {r.event_id for r in
          bottomk_sample(events.repartition(13), "event_id", ["event_type"], k)
          .collect()}
    assert s1 == s2  # partitioning-independent

    # mergeability: split by parity, sample each part, merge by re-cut
    parts = [
        bottomk_sample(
            events.filter(F.col("event_id") % 2 == p),
            "event_id", ["event_type"], k,
        )
        for p in (0, 1)
    ]
    merged = parts[0].unionByName(parts[1])
    recut = {r.event_id for r in
             bottomk_sample(merged, "event_id", ["event_type"], k).collect()}
    assert recut == s1
