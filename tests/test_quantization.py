"""int8 embedding quantization: reconstruction error bounds and kNN
recall vs the exact float path."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_ORACLE

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.operators.quantization import quantize


def test_quantization_bounds(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings").limit(100)
    q = quantize(emb)
    rows = q.select("embedding", "qvec", "scale").collect()
    for r in rows:
        assert all(-127 <= v <= 127 for v in r.qvec)
        # reconstruction error per element is at most scale/2
        for orig, qv in zip(r.embedding, r.qvec):
            assert abs(qv * r.scale - orig) <= r.scale / 2 + 1e-12


def test_quantized_knn_recall(spark):
    """Top-5 neighbors from the int8 path must substantially agree with
    the exact float path (int8 on 64-dim unit vectors loses little)."""
    from bigdata_processing_spark.queries.similarity import (
        knn_bruteforce,
        quantized_knn_sample,
    )

    exact = {}
    for r in knn_bruteforce(spark, SF_ORACLE).collect():
        exact.setdefault(r.qid, set()).add(r.cid)
    quant = {}
    for r in quantized_knn_sample(spark, SF_ORACLE).collect():
        quant.setdefault(r.qid, set()).add(r.cid)
    assert exact.keys() == quant.keys()
    recalls = [len(exact[q] & quant[q]) / 5 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_zero_vector_quantizes_to_zero_not_null(spark):
    """All-zero embedding: scale floors at epsilon so qvec is all zeros
    (dot = 0) rather than 0/0 -> NaN -> null, which would silently drop
    the vector from candidate sets."""
    from pyspark.sql import functions as F

    from bigdata_processing_spark.operators.quantization import quantized_dot

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    q = quantize(df)
    rows = {r.vec_id: r for r in q.collect()}
    assert rows[1].qvec == [0, 0, 0]
    assert rows[1].scale > 0
    assert rows[2].qvec == [64, -127, 32]

    a = q.filter(F.col("vec_id") == 1).select(
        F.col("qvec").alias("qa"), F.col("scale").alias("sa")
    )
    b = q.filter(F.col("vec_id") == 2).select(
        F.col("qvec").alias("qb"), F.col("scale").alias("sb")
    )
    dot = (
        a.crossJoin(b)
        .select(quantized_dot(F.col("qa"), F.col("sa"), F.col("qb"), F.col("sb")).alias("d"))
        .collect()[0].d
    )
    assert dot == 0.0


def test_pq_adc_recall_vs_exact(spark):
    """PQ-ADC (8 subspaces × 16 seeded centroids = 32× compression) must
    keep meaningful recall@5 against exact cosine — the quality gate the
    other quantizers (SQ8/int8/binary) carry, applied to PQ."""
    from bigdata_processing_spark.queries.similarity import (
        knn_bruteforce,
        pq_adc_knn,
    )

    exact = knn_bruteforce(spark, SF_ORACLE)
    pq = pq_adc_knn(spark, SF_ORACLE)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r.qid, set()).add(r.cid)
    got = {}
    for r in pq.collect():
        got.setdefault(r.qid, set()).add(r.cid)
    assert set(got) == set(truth)  # same query set
    hits = sum(len(truth[q] & got[q]) for q in truth)
    total = sum(len(truth[q]) for q in truth)
    recall = hits / total
    # seeded (non-refined) codebooks on 64-dim data: expect mid recall;
    # gate well below observed to avoid flake, well above random (~0.8%)
    assert recall >= 0.2, f"PQ-ADC recall@5 collapsed: {recall:.3f}"


def test_pq_kmeans_beats_seeded_codebooks(spark):
    """k-means-refined PQ codebooks (operators/quantization.pq_fit) must
    improve recall@5 over the seeded SQL-exact variant — the refinement
    is the point of the production path."""
    from bigdata_processing_spark.functions import vectors as V
    from bigdata_processing_spark.operators.quantization import (
        pq_adc_search,
        pq_encode,
        pq_fit,
    )
    from bigdata_processing_spark.queries.similarity import (
        knn_bruteforce,
        pq_adc_knn,
    )

    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        V.norm(F.col("embedding")).alias("nrm"),
    )
    # K=64 per subspace: 6-bit codes (~42x compression) — the measured
    # sweet spot on this fixture (K=16: 0.28, K=32: 0.44, K=64: 0.52)
    books = pq_fit(emb, vec_col="e", n_subspaces=8, k=64, n_iter=4)
    enc = pq_encode(emb, books, vec_col="e")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    refined = pq_adc_search(enc, books, q, top_k=5)

    def recall(df, truth):
        got = {}
        for r in df.collect():
            got.setdefault(r.qid, set()).add(r.cid)
        hits = sum(len(truth[k] & got.get(k, set())) for k in truth)
        return hits / sum(len(v) for v in truth.values())

    truth = {}
    for r in knn_bruteforce(spark, SF_ORACLE).collect():
        truth.setdefault(r.qid, set()).add(r.cid)

    r_seeded = recall(pq_adc_knn(spark, SF_ORACLE), truth)
    r_kmeans = recall(refined, truth)
    assert r_kmeans > r_seeded, (r_seeded, r_kmeans)
    assert r_kmeans >= 0.4


def test_adc_lut_scores_bit_identical_to_per_pair_fold(spark):
    """The per-query ADC lookup table (pq_lut_expr + pq_adc_lut_sql) is
    a pure FACTORING of the per-pair fold form (pq_adc_sql): every LUT
    entry is the identical zip_with/aggregate fold, so the scored
    values — not just the ranking — must match bit-for-bit. Pins the
    optimization so a future rewrite can't drift the oracle."""
    from bigdata_processing_spark.functions import vectors as V
    from bigdata_processing_spark.operators.quantization import (
        pq_adc_expr,
        pq_adc_lut_sql,
        pq_encode,
        pq_lut_expr,
    )
    from bigdata_processing_spark.operators.ivf import seed_centroids

    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        V.norm(F.col("embedding")).alias("nrm"),
    )
    seeds = seed_centroids(emb, 16, vec_col="e")
    books = [[c[8 * m: 8 * (m + 1)] for c in seeds] for m in range(8)]
    enc = pq_encode(emb.limit(300), books, vec_col="e").select(
        "vec_id", "nrm", *[f"k{m}" for m in range(8)]
    )
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    joined = enc.join(
        F.broadcast(q.withColumn("_adc_lut", pq_lut_expr(books))),
        F.col("vec_id") != F.col("qid"),
    )
    both = joined.select(
        "qid",
        F.col("vec_id").alias("cid"),
        pq_adc_expr(books).alias("fold"),
        F.expr(pq_adc_lut_sql(8)).alias("lut"),
    ).collect()
    assert both, "empty comparison frame"
    for r in both:
        assert r.fold == r.lut, (r.qid, r.cid, r.fold, r.lut)


def test_pruned_topk_matches_naive_window(spark):
    """operators/topk.pruned_topk must be bit-identical to
    row_number-over-window top-k — including tie groups that straddle
    the k boundary (same bucket, cid tie-break) and groups with fewer
    than k rows (threshold walk keeps everything)."""
    from pyspark.sql import Window

    from bigdata_processing_spark.operators.topk import pruned_topk

    rows = []
    # group 0: distinct scores; group 1: a 7-way tie at the boundary;
    # group 2: fewer than k rows; group 3: all rows in ONE bucket
    for c in range(50):
        rows.append((0, c, 1.0 - c * 0.013))
    for c in range(40):
        rows.append((1, c, 0.5 if c < 7 else 0.4 - c * 0.001))
    for c in range(3):
        rows.append((2, c, float(c)))
    for c in range(30):
        rows.append((3, c, 0.1234 + c * 1e-6))
    df = spark.createDataFrame(rows, "g int, cid int, s double")

    w = Window.partitionBy("g").orderBy(F.col("s").desc(), F.col("cid").asc())
    naive = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .collect()
    )
    fast = pruned_topk(df, 5, "g", "s", "cid").collect()
    key = lambda r: (r.g, r.rn)
    assert sorted(
        [(r.g, r.cid, r.s, r.rn) for r in naive]
    ) == sorted([(r.g, r.cid, r.s, r.rn) for r in fast])
    assert len(fast) == 5 + 5 + 3 + 5


def test_grouped_topk_regimes_agree(spark):
    """grouped_topk must produce identical rows in both regimes — the
    naive window below PRUNE_MIN_ROWS and the histogram prune above."""
    from bigdata_processing_spark.operators.topk import grouped_topk

    rows = [(g, c, ((g * 37 + c * 101) % 997) / 997.0)
            for g in range(4) for c in range(200)]
    df = spark.createDataFrame(rows, "g int, cid int, s double")
    naive = grouped_topk(df, 5, "g", "s", "cid", n_rows=len(rows))
    pruned = grouped_topk(df, 5, "g", "s", "cid", n_rows=10**9)
    key = lambda r: (r.g, r.rn)
    assert sorted((r.g, r.cid, r.s, r.rn) for r in naive.collect()) == \
           sorted((r.g, r.cid, r.s, r.rn) for r in pruned.collect())


def test_grouped_topk_ascending_integer_scores(spark):
    """Ascending (distance-like) mode with integer granularity
    (bucket_scale=1) — both regimes must equal the naive ascending
    window, including tie groups at the k boundary."""
    from pyspark.sql import Window

    from bigdata_processing_spark.operators.topk import (
        grouped_topk,
        pruned_topk,
    )

    rows = []
    for g in range(3):
        for c in range(100):
            rows.append((g, c, (c * 7 + g) % 23))  # repeated small ints
    df = spark.createDataFrame(rows, "g int, cid int, hamming int")
    w = Window.partitionBy("g").orderBy(
        F.col("hamming").asc(), F.col("cid").asc()
    )
    naive = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 7).collect()
    )
    fast = pruned_topk(df, 7, "g", "hamming", "cid",
                       bucket_scale=1, ascending=True).collect()
    assert sorted((r.g, r.cid, r.hamming, r.rn) for r in naive) == \
           sorted((r.g, r.cid, r.hamming, r.rn) for r in fast)
    via_regime = grouped_topk(df, 7, "g", "hamming", "cid", n_rows=10**9,
                              bucket_scale=1, ascending=True).collect()
    assert sorted((r.g, r.cid, r.hamming, r.rn) for r in via_regime) == \
           sorted((r.g, r.cid, r.hamming, r.rn) for r in naive)
