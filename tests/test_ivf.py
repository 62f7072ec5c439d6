"""IVF ANN quality gates: multi-probe recall@5 vs exact brute force, and
cell-balance sanity (the index actually prunes — no cell swallows the
corpus). Standard IVF evaluation; equality oracles don't apply because
the coarse quantizer is iterative k-means."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.functions import vectors as V
from bigdata_processing_spark.operators.ivf import build_ivf_index, ivf_search

SF = "/root/testdata/sf0.001"


def _exact_topk(emb, k=5):
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qe"),
        V.norm(F.col("embedding")).alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("ce"),
        V.norm(F.col("embedding")).alias("cn"),
    )
    cos = V.dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid").asc())
    return (
        c.join(F.broadcast(q), F.col("cid") != F.col("qid"))
        .select("qid", "cid", cos.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def test_ivf_recall_at_5(spark):
    emb = load_table(spark, SF, "embeddings")
    indexed, centroids = build_ivf_index(emb, k_cells=8, n_iter=2)
    indexed = indexed.persist()
    try:
        q = indexed.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("qid"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
        )
        approx = {
            (r.qid, r.cid) for r in ivf_search(indexed, centroids, q, 5, n_probe=3).collect()
        }
        exact = {(r.qid, r.cid) for r in _exact_topk(emb).collect()}
        n_queries = len({q for q, _ in exact})
        recall = len(approx & exact) / len(exact)
        assert n_queries > 0
        # n_probe=3 of 8 cells on clustered fixture data: strong recall
        assert recall >= 0.7, f"recall@5 = {recall:.3f}"
    finally:
        indexed.unpersist()


def test_ivf_cells_partition_the_corpus(spark):
    emb = load_table(spark, SF, "embeddings")
    indexed, centroids = build_ivf_index(emb, k_cells=8, n_iter=2)
    total = emb.count()
    sizes = {r.cell: r.n for r in indexed.groupBy("cell").agg(F.count("*").alias("n")).collect()}
    assert sum(sizes.values()) == total          # every vector lands in a cell
    assert len(centroids) >= 2                   # quantizer didn't collapse
    assert max(sizes.values()) < total           # and it actually partitions
    # multi-probe at n_probe=2 over k=8 cells must scan far less than the
    # corpus in the worst cell pairing — the pruning story at 100TB
    top2 = sum(sorted(sizes.values(), reverse=True)[:2])
    assert top2 < total


def test_ivf_disk_index_prunes_partitions(spark, tmp_path):
    from bigdata_processing_spark.operators.ivf import (
        ivf_search_on_disk, read_ivf_index, write_ivf_index,
    )

    emb = load_table(spark, SF, "embeddings")
    indexed, centroids = build_ivf_index(emb, k_cells=8, n_iter=2)
    write_ivf_index(indexed, centroids, str(tmp_path / "ivf"))
    disk, disk_cents = read_ivf_index(spark, str(tmp_path / "ivf"))
    assert [[round(x, 9) for x in c] for c in disk_cents] == [
        [round(x, 9) for x in c] for c in centroids
    ]

    q = indexed.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    on_disk = ivf_search_on_disk(disk, disk_cents, q, 5, n_probe=2)
    in_mem = ivf_search(indexed, centroids, q, 5, n_probe=2)
    assert {(r.qid, r.cid, round(r.cos_sim, 9)) for r in on_disk.collect()} == {
        (r.qid, r.cid, round(r.cos_sim, 9)) for r in in_mem.collect()
    }

    # the probed-cell predicate must reach the scan as PartitionFilters —
    # at scale this is the "read n_probe/k of the index bytes" guarantee
    plan = on_disk._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "cell" in pf.group(1), plan[:2000]


def test_ivfsq8_recall_vs_exact(spark):
    """Quantization on top of cell pruning: recall@5 stays high (int8
    error ≪ cell-pruning error at 64 dims), and the quantized scores
    track exact cosine closely on the pairs both paths rank."""
    from bigdata_processing_spark.operators.ivf import build_ivfsq8_index, ivfsq8_search

    emb = load_table(spark, SF, "embeddings")
    sq8, centroids = build_ivfsq8_index(emb, k_cells=8, n_iter=2)
    sq8 = sq8.persist()
    try:
        q = emb.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").cast("array<double>").alias("qe"),
            V.norm(F.col("embedding")).alias("qn"),
        )
        approx = {
            (r.qid, r.cid): r.cos_sim
            for r in ivfsq8_search(sq8, centroids, q, 5, n_probe=3).collect()
        }
        exact = {
            (r.qid, r.cid): r.cos_sim for r in _exact_topk(emb).collect()
        }
        recall = len(approx.keys() & exact.keys()) / len(exact)
        assert recall >= 0.65, f"recall@5 = {recall:.3f}"
        for pair in approx.keys() & exact.keys():
            assert abs(approx[pair] - exact[pair]) < 0.02, (pair, approx[pair], exact[pair])
    finally:
        sq8.unpersist()


def test_ivf_fit_on_sample_still_indexes_everything(spark):
    emb = load_table(spark, SF, "embeddings")
    indexed, centroids = build_ivf_index(emb, k_cells=4, n_iter=1, fit_fraction=0.3)
    assert indexed.count() == emb.count()
    assert len(centroids) >= 2


def test_ivf_cell_count_policy():
    """4√n clamped: trainability floor (~39 pts/centroid) for small n,
    min_cells floor, max_cells ceiling, O(√n) in between."""
    from bigdata_processing_spark.operators.ivf import ivf_cell_count

    assert ivf_cell_count(4) == 4                 # tiny corpus: n itself
    assert ivf_cell_count(50) == 1                # trainability beats min_cells floor
    assert ivf_cell_count(2_000) == 51            # n/39 trainability clamp
    assert ivf_cell_count(1_000_000) == 4_000     # 4sqrt(n) regime
    assert ivf_cell_count(1_000_000_000) == 126_491
    assert ivf_cell_count(10**12) == 1 << 18      # max_cells ceiling
    # per-cell postings stay executor-sized in the 4sqrt(n) regime
    n = 10**9
    assert 5_000 < n / ivf_cell_count(n) < 10_000


def test_allpairs_cell_count_policy():
    """Near-dup cell sizing: follows ivf_cell_count until the n/128 floor
    takes over, so within-cell all-pairs work stays LINEAR at any scale
    (cell size bounded by ~128 for large n) — replaces round 2's 64-cell
    cap that went quadratic past ~8k vectors."""
    from bigdata_processing_spark.operators.ivf import (
        allpairs_cell_count,
        ivf_cell_count,
    )

    for n in (4, 500, 2_000, 20_000):
        assert allpairs_cell_count(n) == ivf_cell_count(n)  # small-n regime
    # large n: the n/128 floor dominates -> bounded cell size
    for n in (10**6, 10**9, 10**12):
        assert allpairs_cell_count(n) == n // 128
        assert n / allpairs_cell_count(n) <= 129
    # monotone non-decreasing across the crossover (no cap plateau)
    prev = 0
    for n in (10**3, 10**4, 10**5, 262_144, 10**6, 10**7):
        cur = allpairs_cell_count(n)
        assert cur >= prev
        prev = cur


def test_ivf_incremental_append_and_drift_refit(spark, tmp_path):
    """Living-index contract: appends assign against the frozen quantizer
    and land in the partitioned postings; once appended volume crosses
    refit_threshold the quantizer rebuilds over the full corpus. Search
    must see appended vectors in both regimes."""
    from bigdata_processing_spark.operators.ivf import (
        append_to_ivf_index,
        ivf_search_on_disk,
        read_ivf_index,
        write_ivf_index,
    )

    emb = load_table(spark, SF, "embeddings")
    first = emb.filter(F.col("vec_id") % 5 != 0)   # 80%
    small = emb.filter(F.col("vec_id") % 5 == 0).filter(F.col("vec_id") % 10 != 0)  # 10%
    rest = emb.filter(F.col("vec_id") % 10 == 0)   # 10%
    path = str(tmp_path / "ivf_inc")

    indexed, centroids = build_ivf_index(first, k_cells=8, n_iter=2)
    write_ivf_index(indexed, centroids, path)

    # small append: below threshold, no refit, centroids frozen
    n1, refit1 = append_to_ivf_index(path, small, refit_threshold=0.3)
    assert n1 == small.count() and refit1 is False
    disk, cents = read_ivf_index(spark, path)
    assert disk.count() == first.count() + n1
    assert [[round(x, 9) for x in c] for c in cents] == [
        [round(x, 9) for x in c] for c in centroids
    ]
    # an appended vector must be findable (its own nearest neighbor)
    probe = disk.filter(F.col("vec_id").isin([r.vec_id for r in small.limit(3).collect()])).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    hits = ivf_search_on_disk(disk, cents, probe, top_k=1, n_probe=1)
    assert hits.count() == probe.count()  # every appended probe got a neighbor

    # drift append: push past the threshold via a low threshold → refit
    n2, refit2 = append_to_ivf_index(path, rest, refit_threshold=0.05)
    assert n2 == rest.count() and refit2 is True
    disk2, cents2 = read_ivf_index(spark, path)
    assert disk2.count() == emb.count()          # nothing lost in the rebuild
    assert len(cents2) >= 2                      # quantizer refit on full corpus


def test_append_assignment_query_matches_disk_operator(spark, tmp_path):
    """The driver-facing relational twin (queries/similarity.
    ivf_append_assignment) must agree with the REAL disk operator
    (append_to_ivf_index) on per-cell postings when both use the same
    frozen centroid list — proving the oracle row verifies the
    operator's arithmetic, not a lookalike."""
    import os

    from bigdata_processing_spark.functions import text as T
    from bigdata_processing_spark.operators.ivf import (
        append_to_ivf_index,
        seed_centroids,
        seeded_assign_best,
        write_ivf_index,
    )
    from bigdata_processing_spark.queries.similarity import (
        APPEND_K,
        APPEND_SPLIT_BASE,
        APPEND_SPLIT_MOD,
        ivf_append_assignment,
    )

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        V.norm(F.col("embedding")).alias("nrm"),
        (
            T.hash64(F.col("vec_id").cast("string"), "append") % APPEND_SPLIT_MOD
            < APPEND_SPLIT_BASE
        ).alias("is_base"),
    )
    base = emb.filter("is_base")
    new = emb.filter("NOT is_base")
    cents = seed_centroids(base, APPEND_K, vec_col="e")

    path = os.path.join(str(tmp_path), "ivf_append")
    indexed = base.select(
        "vec_id", "e", "nrm", seeded_assign_best(cents).getField("cell").alias("cell")
    )
    write_ivf_index(indexed, cents, path)

    n_appended, refit = append_to_ivf_index(
        path, new.select("vec_id", F.col("e").alias("embedding"))
    )
    assert refit is False  # 20% appended < 30% threshold

    got = {
        r.cell: r.cnt
        for r in spark.read.parquet(f"{path}/postings")
        .groupBy("cell")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    want_rows = ivf_append_assignment(spark, SF).collect()
    assert n_appended == sum(r.n_appended_vecs for r in want_rows)
    assert all(not r.refit_triggered for r in want_rows)
    want = {
        r.cell: r.n_base_vecs + r.n_appended_vecs
        for r in want_rows
        if r.n_base_vecs + r.n_appended_vecs > 0
    }
    assert got == want


def test_streaming_ingest_into_disk_ivf_index(spark, tmp_path):
    """Structured-Streaming ingest into a disk-resident IVF index: each
    micro-batch of arriving vectors is assigned against the FROZEN
    centroids via append_to_ivf_index inside foreachBatch — the
    living-ANN-index contract (streaming/dedup.py is the dedup analog).
    Two micro-batches (maxFilesPerTrigger=1 over two files) prove the
    per-batch append path; postings must equal base + both batches with
    no refit."""
    import os

    from bigdata_processing_spark.functions import text as T
    from bigdata_processing_spark.operators.ivf import (
        append_to_ivf_index,
        seed_centroids,
        seeded_assign_best,
        write_ivf_index,
    )

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        V.norm(F.col("embedding")).alias("nrm"),
        (T.hash64(F.col("vec_id").cast("string"), "stream") % 2 == 0).alias("is_base"),
    )
    base, new = emb.filter("is_base"), emb.filter("NOT is_base")
    cents = seed_centroids(base, 8, vec_col="e")
    idx_path = os.path.join(str(tmp_path), "ivf_stream")
    write_ivf_index(
        base.select(
            "vec_id", "e", "nrm",
            seeded_assign_best(cents).getField("cell").alias("cell"),
        ),
        cents,
        idx_path,
    )
    n_base = spark.read.parquet(f"{idx_path}/postings").count()

    # stage the arriving batch as TWO parquet files -> two micro-batches
    stage = os.path.join(str(tmp_path), "arrivals")
    new.select("vec_id", F.col("e").cast("array<float>").alias("embedding")) \
        .repartition(2).write.parquet(stage)

    appended_per_batch = []

    def sink(batch_df, _bid):
        n, refit = append_to_ivf_index(
            idx_path, batch_df, refit_threshold=1.0  # never refit: deterministic
        )
        appended_per_batch.append(n)
        assert not refit

    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()

    assert len(appended_per_batch) == 2
    n_new = new.count()
    assert sum(appended_per_batch) == n_new
    assert spark.read.parquet(f"{idx_path}/postings").count() == n_base + n_new


def test_seeded_assign_join_matches_literal_sql_form(spark):
    """seeded_assign_cells (broadcast-join argmin) must produce exactly
    the same cell per vector as seeded_assign_best (literal-SQL score
    array) — the bit-exactness contract that lets queries swap in the
    O(1)-plan-size form while their DuckDB oracles keep the SQL form."""
    from bigdata_processing_spark.operators.ivf import (
        seed_centroids,
        seeded_assign_best,
        seeded_assign_cells,
    )

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cents = seed_centroids(emb, 13, vec_col="e")
    lit = {
        r.vec_id: r.cell
        for r in emb.withColumn(
            "cell", seeded_assign_best(cents).getField("cell")
        ).select("vec_id", "cell").collect()
    }
    join = {r.vec_id: r.cell for r in seeded_assign_cells(emb, cents).collect()}
    assert lit == join and len(lit) == emb.count()


def test_seeded_assign_carry_equals_join_back(spark):
    """carry= passthrough (any_value over columns constant within the id
    group) must equal the pre-round-6 pattern of joining the assignment
    back onto the input — same rows, same cells, embeddings intact —
    while removing the n-row shuffle join (one per Lloyd iteration, one
    per celled-memo build)."""
    from bigdata_processing_spark.operators.ivf import (
        seed_centroids,
        seeded_assign_cells,
    )

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    cents = seed_centroids(emb, 13, vec_col="e")
    carried = seeded_assign_cells(emb, cents, carry=("label", "e"))
    assert carried.columns == ["vec_id", "label", "e", "cell"]
    joined = emb.join(seeded_assign_cells(emb, cents), "vec_id")
    a = {
        (r.vec_id, r.label, tuple(r.e), r.cell) for r in carried.collect()
    }
    b = {(r.vec_id, r.label, tuple(r.e), r.cell) for r in joined.collect()}
    assert a == b and len(a) == emb.count()
    # the carried plan must not re-join the input: exactly one scan of
    # the embeddings source feeds it (executedPlan().toString() would
    # double-count — AQE prints Final + Initial sections)
    from bigdata_processing_spark.plans.inspect import explain_str

    plan = explain_str(carried, "simple").split("== Initial Plan ==")[0]
    assert plan.count("FileScan") <= 1, plan[:1500]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_ivfpq_recall_vs_exact(spark):
    """IVF-PQ (coarse cells × PQ codes — the canonical billion-scale
    layout): multi-probe ADC recall@5 must stay useful vs exact cosine,
    and the scan must touch only probed cells."""
    from bigdata_processing_spark.operators.ivf import build_ivfpq_index, ivfpq_search

    emb = load_table(spark, SF, "embeddings")
    postings, cents, books = build_ivfpq_index(
        emb, k_cells=8, n_subspaces=8, k_codes=64, n_iter=3
    )
    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("qe"),
        V.norm(F.col("embedding")).alias("qn"),
    )
    q = base.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), "qe", "qn"
    )
    got = {}
    for r in ivfpq_search(postings, cents, books, q, top_k=5, n_probe=4).collect():
        got.setdefault(r.qid, set()).add(r.cid)
    # two-stage: ADC shortlist (top-40) -> exact rerank top-5, the
    # standard recovery for stacked quantization error
    shortlist = ivfpq_search(postings, cents, books, q, top_k=40, n_probe=4)

    # exact truth (brute force over the same vectors)
    from bigdata_processing_spark.functions import vectors as VV
    cand = base.select(
        F.col("vec_id").alias("cid"), F.col("qe").alias("ce"), F.col("qn").alias("cn")
    )
    joined = cand.join(F.broadcast(q), F.col("cid") != F.col("qid"))
    cos = VV.dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    from pyspark.sql import Window as W
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    truth = {}
    for r in (
        joined.select("qid", "cid", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter("rn <= 5")
        .collect()
    ):
        truth.setdefault(r.qid, set()).add(r.cid)

    hits = sum(len(truth[k] & got.get(k, set())) for k in truth)
    recall = hits / sum(len(v) for v in truth.values())
    # two approximations stack (cell pruning at n_probe=4/8 + PQ codes);
    # measured 0.36 at this config — gate above random, below headroom
    assert recall >= 0.25, f"IVF-PQ recall collapsed: {recall:.3f}"

    # exact rerank of the ADC shortlist recovers most of the PQ loss
    sl = shortlist.select("qid", "cid")
    ex = sl.join(cand, "cid").join(
        F.broadcast(q.select(F.col("qid").alias("qid2"), F.col("qe").alias("qe2"),
                             F.col("qn").alias("qn2"))),
        F.col("qid") == F.col("qid2"),
    )
    rcos = VV.dot(F.col("qe2"), F.col("ce")) / (F.col("qn2") * F.col("cn"))
    wr = W.partitionBy("qid").orderBy(F.col("rcos").desc(), F.col("cid").asc())
    rer = {}
    for r in (
        ex.select("qid", "cid", rcos.alias("rcos"))
        .withColumn("rn", F.row_number().over(wr))
        .filter("rn <= 5")
        .collect()
    ):
        rer.setdefault(r.qid, set()).add(r.cid)
    rhits = sum(len(truth[k] & rer.get(k, set())) for k in truth)
    rrecall = rhits / sum(len(v) for v in truth.values())
    assert rrecall >= recall, (recall, rrecall)
    assert rrecall >= 0.5, f"reranked IVF-PQ recall too low: {rrecall:.3f}"


def test_ivfpq_residual_path_runs_and_scores(spark):
    """Residual IVFADC (codes over v - centroid[cell], centroid dot
    added at probe grain): structural check that the path produces full
    top-k per query with sane scores. Recall on THIS fixture is
    measured lower than raw encoding (isotropic sphere data — see
    build_ivfpq_index docstring), so only shape/sanity is gated."""
    from bigdata_processing_spark.operators.ivf import build_ivfpq_index, ivfpq_search

    emb = load_table(spark, SF, "embeddings")
    postings, cents, books = build_ivfpq_index(
        emb, k_cells=8, n_subspaces=8, k_codes=32, n_iter=2, residual=True
    )
    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("qe"),
        V.norm(F.col("embedding")).alias("qn"),
    )
    q = base.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), "qe", "qn"
    )
    rows = ivfpq_search(postings, cents, books, q, top_k=5, n_probe=4,
                        residual=True).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.qid, []).append(r)
    assert len(per_q) == q.count()
    for qid, rs in per_q.items():
        assert len(rs) == 5
        assert all(abs(r.adc_cos) < 3 for r in rs)  # scale-sane ADC cosine


def test_ivfpq_disk_roundtrip_and_partition_pruning(spark, tmp_path):
    """write/read IVF-PQ: postings + centroids + codebooks survive the
    disk roundtrip (identical search results), and the probed-cell
    predicate reaches the scan as a PartitionFilter (directory pruning),
    as the float IVF disk index already guarantees."""
    import os
    import re

    from bigdata_processing_spark.operators.ivf import (
        build_ivfpq_index,
        ivfpq_search,
        ivfpq_search_on_disk,
        read_ivfpq_index,
        write_ivfpq_index,
    )

    emb = load_table(spark, SF, "embeddings")
    postings, cents, books = build_ivfpq_index(
        emb, k_cells=8, n_subspaces=8, k_codes=16, n_iter=2
    )
    path = os.path.join(str(tmp_path), "ivfpq")
    write_ivfpq_index(postings, cents, books, path)
    postings2, cents2, books2 = read_ivfpq_index(spark, path)
    assert cents2 == cents and books2 == books

    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("qe"),
        V.norm(F.col("embedding")).alias("qn"),
    )
    q = base.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), "qe", "qn"
    )
    mem = sorted(
        tuple(r) for r in ivfpq_search(postings, cents, books, q, n_probe=3).collect()
    )
    disk_df = ivfpq_search_on_disk(postings2, cents2, books2, q, n_probe=3)
    disk = sorted(tuple(r) for r in disk_df.collect())
    assert mem == disk and len(disk) > 0

    plan = disk_df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), "probe predicate did not prune partitions"


def test_trained_centroids_deterministic_and_duckdb_reproducible(spark):
    """trained_centroids is the celled family's round-6 quantizer: the
    fixed-iteration Lloyd refinement must (a) be run-to-run
    deterministic, (b) keep a seed centroid verbatim when its cell
    empties, and (c) produce VALUE-identical centroids to the unrolled
    DuckDB CTE chain (queries/dedup._sql_emb_assign) — the property the
    whole celled-family oracle contract rests on."""
    import duckdb

    from bigdata_processing_spark.operators.ivf import (
        allpairs_cell_count,
        trained_centroids,
    )
    from bigdata_processing_spark.queries.dedup import _sql_emb_assign

    emb = load_table(spark, SF, "embeddings")
    k = allpairs_cell_count(emb.count())  # the celled family's real k
    c1 = trained_centroids(emb, k, n_iter=2)
    c2 = trained_centroids(emb, k, n_iter=2)
    assert c1 == c2 and len(c1) == k
    # refinement moved the centroids off their seeds
    seeds = [
        list(r.c) for r in emb.orderBy("vec_id").limit(k)
        .select(F.col("embedding").cast("array<double>").alias("c")).collect()
    ]
    assert c1 != seeds

    # DuckDB runs the oracle CTE chain (its LIMIT subquery computes the
    # same allpairs_cell_count) over the same parquet
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    rows = con.execute(
        f"WITH {_sql_emb_assign(2)} SELECT cell, c FROM cents ORDER BY cell"
    ).fetchall()
    duck = [list(r[1]) for r in rows]
    assert duck == c1


def test_trained_centroids_driver_fit_matches_distributed(spark, monkeypatch):
    """The round-13 driver-side exact fit replays the distributed fold
    loop bit-for-bit: per-dim sequential accumulation (same IEEE op
    order), first-occurrence argmin (the (s, cell) struct-min
    tie-break), HALF_UP round-6 means. Pin list-equality of the two
    paths on the real fixture, and that the driver path declines
    corpora past its bound."""
    import bigdata_processing_spark.operators.ivf as ivf

    emb = load_table(spark, SF, "embeddings")
    k = ivf.allpairs_cell_count(emb.count())
    fitted = ivf.trained_centroids(emb, k, n_iter=2, exact=True)
    monkeypatch.setattr(ivf, "DRIVER_FIT_MAX_ROWS", 0)  # force distributed
    ref = ivf.trained_centroids(emb, k, n_iter=2, exact=True)
    assert fitted == ref
    # the bound declines oversized corpora (fallback, not a bad fit)
    monkeypatch.setattr(ivf, "DRIVER_FIT_MAX_ROWS", 3)
    assert ivf._exact_fit_on_driver(
        emb.select("vec_id", "embedding"), k, 2, "embedding", "vec_id"
    ) is None


def test_trained_centroids_empty_cell_keeps_seed(spark):
    """A seed that captures no members after reassignment must survive
    unchanged (the coalesce rule) — with k == n every vector is its own
    seed, ties send each vector to its own cell, and any cell that DOES
    empty falls back to its seed; the invariant is that no centroid is
    ever null/dropped and the count stays k."""
    from bigdata_processing_spark.operators.ivf import trained_centroids

    emb = load_table(spark, SF, "embeddings").limit(6)
    cents = trained_centroids(emb, 6, n_iter=1)
    assert len(cents) == 6 and all(c is not None and len(c) == 64 for c in cents)


def test_intexact_assigner_matches_ordered_fold_on_hashed_tf(spark):
    """seeded_assign_cells_intexact's correctness proof is the
    whole-valued precondition (integer arithmetic in float64 is exact in
    any summation order). Pin the conclusion on real data: the numpy
    matmul assignment equals the ordered-fold assignment row for row on
    the hashed-TF fixture, ties included."""
    from bigdata_processing_spark.functions import text as T
    from bigdata_processing_spark.operators.ivf import (
        ivf_cell_count,
        seed_centroids,
        seeded_assign_cells,
        seeded_assign_cells_intexact,
    )
    from bigdata_processing_spark.queries.nlp import HASHED_TF_DIM

    vecs = (
        load_table(spark, "/root/testdata/sf0.01", "documents")
        .select("doc_id", T.hashed_tf(F.col("text"), HASHED_TF_DIM).alias("v"))
        .persist()
    )
    n = vecs.count()
    cents = seed_centroids(vecs, ivf_cell_count(n), vec_col="v", id_col="doc_id")
    fold = {
        r.doc_id: r.cell
        for r in seeded_assign_cells(
            vecs, cents, id_col="doc_id", e_col="v"
        ).collect()
    }
    fast = {
        r.doc_id: r.cell
        for r in seeded_assign_cells_intexact(
            vecs, cents, id_col="doc_id", e_col="v"
        ).collect()
    }
    vecs.unpersist()
    assert fold == fast
    assert len(fold) == n


def test_intexact_assigner_enforces_whole_valued_precondition(spark):
    """VERDICT r10 #3: the bit-exactness proof is the whole-valued
    precondition, and nothing enforced it — a float-family caller got
    silently plausible-but-unpinned argmins. Now: float centroids raise
    at plan time; float vectors raise inside the batch; whole-valued
    inputs pass."""
    import pytest

    from bigdata_processing_spark.operators.ivf import (
        seeded_assign_cells_intexact,
    )

    whole = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 0.0])], "vec_id int, e array<double>"
    )
    # float centroids: immediate, driver-side
    with pytest.raises(ValueError, match="whole-valued"):
        seeded_assign_cells_intexact(whole, [[0.5, 1.0], [2.0, 2.0]])
    # float vectors: raised from the executor batch check
    floaty = spark.createDataFrame(
        [(0, [0.5, 2.0])], "vec_id int, e array<double>"
    )
    asg = seeded_assign_cells_intexact(floaty, [[1.0, 1.0], [4.0, 0.0]])
    with pytest.raises(Exception, match="whole-valued|integer-exactness"):
        asg.collect()
    # whole-valued passes
    ok = {
        r.vec_id: r.cell
        for r in seeded_assign_cells_intexact(
            whole, [[1.0, 1.0], [4.0, 0.0]]
        ).collect()
    }
    assert ok == {0: 0, 1: 1}


def test_intexact_assigner_null_vector_gets_null_cell(spark):
    """ADVICE r10: a null vector (hashed_tf of null text) aborted the
    whole stage from np.stack. Now it yields a NULL cell — the honest
    answer for an unfeaturizable row (documented divergence from the
    fold form, whose null score sorts first → silent cell 0) — and the
    non-null rows are unaffected."""
    from bigdata_processing_spark.operators.ivf import (
        seeded_assign_cells_intexact,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, [3.0, 0.0])],
        "vec_id int, e array<double>",
    )
    rows = {
        r.vec_id: r.cell
        for r in seeded_assign_cells_intexact(
            df, [[1.0, 1.0], [4.0, 0.0]]
        ).collect()
    }
    assert rows == {0: 0, 1: None, 2: 1}

    all_null = spark.createDataFrame(
        [(7, None)], "vec_id int, e array<double>"
    )
    rows2 = seeded_assign_cells_intexact(
        all_null, [[1.0, 1.0]]
    ).collect()
    assert len(rows2) == 1 and rows2[0].cell is None


def test_streaming_featurize_drops_null_text(spark):
    """The streaming hashed-TF front excludes null-text docs before
    assignment (they cannot be featurized; hashed_tf(null) is null and
    would otherwise ride into the assigner as a null vector)."""
    from bigdata_processing_spark.streaming.hashed_tf import _featurize

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, None), (2, "d e")], "doc_id long, text string"
    )
    out = _featurize(docs, 8).collect()
    assert sorted(r.vec_id for r in out) == [0, 2]
    assert all(r.v is not None and r.nrm is not None for r in out)


def test_auto_fit_fraction_samples_above_target(spark, monkeypatch):
    """The default fit policy (round 12): above FIT_SAMPLE_TARGET
    vectors, Lloyd trains on a deterministic hash-sample — the centroids
    must equal an explicit-fraction fit, and every vector is still
    assigned. Target monkeypatched down so a fixture corpus exercises
    the sampled branch."""
    import bigdata_processing_spark.operators.ivf as ivf_mod

    emb = load_table(spark, SF, "embeddings")
    n = emb.count()
    target = max(2, n // 3)
    monkeypatch.setattr(ivf_mod, "FIT_SAMPLE_TARGET", target)
    auto_idx, auto_cents = build_ivf_index(emb, k_cells=4, n_iter=1)
    expl_idx, expl_cents = build_ivf_index(
        emb, k_cells=4, n_iter=1, fit_fraction=min(1.0, target / n)
    )
    assert auto_cents == expl_cents
    assert auto_idx.count() == n
    # and the sampled quantizer differs from the full fit (it trained
    # on a strict subset), proving the auto branch actually sampled
    _, full_cents = build_ivf_index(emb, k_cells=4, n_iter=1,
                                    fit_fraction=1.0)
    assert auto_cents != full_cents


def test_emb_assigned_fast_regime_partitions_like_exact(spark, monkeypatch):
    """Above EMB_EXACT_ASSIGN_MAX the celled family's quantizer/assigner
    swap interpreted bit-contract folds for the Arrow matmul argmin.
    Same centroid geometry: with the threshold forced down, the fast
    assignment must cover every vector and agree with the exact
    assigner on the same centroids except ulp-level near-tie flips."""
    import bigdata_processing_spark.queries.dedup as dd
    from bigdata_processing_spark.operators.ivf import seeded_assign_cells

    dd.clear_dedup_memos()
    monkeypatch.setattr(dd, "EMB_EXACT_ASSIGN_MAX", 10)
    try:
        base, cents = dd._emb_assigned(spark, SF)
        n = base.count()
        assert n == load_table(spark, SF, "embeddings").count()
        assert base.filter(F.col("cell").isNull()).count() == 0
        exact = seeded_assign_cells(
            base.select("vec_id", "e"), cents, carry=()
        ).select("vec_id", F.col("cell").alias("xcell"))
        j = base.select("vec_id", "cell").join(exact, "vec_id")
        agree = j.filter(F.col("cell") == F.col("xcell")).count()
        assert agree >= 0.95 * n, f"only {agree}/{n} assignments agree"
    finally:
        dd.clear_dedup_memos()


def test_ivf_search_matmul_matches_exact_scorer(spark):
    """The BLAS-scored search must return the same (qid, cid) top-k
    sets and ranks as the exact-fold ivf_search at fixture scale (ulp
    flips need near-ties the fixture doesn't produce), and pass the
    same brute-force recall bar."""
    from bigdata_processing_spark.operators.ivf import ivf_search_matmul

    emb = load_table(spark, SF, "embeddings")
    indexed, centroids = build_ivf_index(emb, k_cells=8, n_iter=2)
    indexed = indexed.persist()
    try:
        q = indexed.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("qid"), F.col("e").alias("qe"),
            F.col("nrm").alias("qn"),
        )
        exact = {(r.qid, r.cid, r.rn)
                 for r in ivf_search(indexed, centroids, q, 5, n_probe=2).collect()}
        fast_rows = ivf_search_matmul(indexed, centroids, q, 5, n_probe=2).collect()
        fast = {(r.qid, r.cid, r.rn) for r in fast_rows}
        assert fast == exact and len(fast) > 0
        # scores agree to float tolerance (different summation orders)
        from bigdata_processing_spark.functions import vectors as V
        ex_by_key = {(r.qid, r.cid): r.cos_sim
                     for r in ivf_search(indexed, centroids, q, 5, n_probe=2).collect()}
        for r in fast_rows:
            assert abs(r.cos_sim - ex_by_key[(r.qid, r.cid)]) < 1e-9
    finally:
        indexed.unpersist()
