"""Streaming hashed-TF front (streaming/hashed_tf.py): the streamed
frozen-quantizer index must equal the batch celled query row-for-row
(the session-funnel-style parity gate), appends must be
replay-idempotent, and the search must read only committed batches."""

from __future__ import annotations

import os

from conftest import SF_SMALL

from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.queries.dedup import clear_dedup_memos
from bigdata_processing_spark.queries.nlp import hashed_tf_knn_celled
from bigdata_processing_spark.streaming.hashed_tf import (
    append_hashed_tf_batch,
    build_hashed_tf_index,
    committed_batches,
    hashed_tf_knn_on_index,
    run_hashed_tf_index_stream,
)


def _rows(df):
    return [
        (r.qid, r.cid, round(r.cos_sim, 9), r.rn)
        for r in df.collect()
    ]


def _full_corpus_cells(spark):
    from bigdata_processing_spark.operators.ivf import ivf_cell_count

    n = load_table(spark, SF_SMALL, "documents").count()
    return ivf_cell_count(n)


def test_streamed_index_matches_batch_celled_query(spark, tmp_path):
    """Build on the id-ordered head, stream the tail in micro-batches:
    the streamed index's kNN must equal hashed_tf_knn_celled on the
    same corpus — same frozen quantizer (cells sized for the FULL
    corpus), same assignment, same probe ranking, same cosine top-k."""
    clear_dedup_memos()
    docs = load_table(spark, SF_SMALL, "documents")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut = ids[int(len(ids) * 0.8)]
    n_cells = _full_corpus_cells(spark)
    # the build slice must contain the quantizer's seed docs (lowest
    # n_cells ids) — true for any head split with cut index > n_cells
    assert int(len(ids) * 0.8) > n_cells

    idx = os.path.join(str(tmp_path), "htf_index")
    build_hashed_tf_index(docs.filter(F.col("doc_id") < cut), idx, n_cells)

    arrivals = os.path.join(str(tmp_path), "arrivals")
    docs.filter(F.col("doc_id") >= cut).coalesce(2).write.parquet(arrivals)
    q = run_hashed_tf_index_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals),
        idx,
        checkpoint=os.path.join(str(tmp_path), "ckpt"),
    )
    q.awaitTermination()
    assert len(committed_batches(spark, idx)) >= 2  # build + >=1 append

    streamed = _rows(hashed_tf_knn_on_index(spark, idx))
    batch = _rows(hashed_tf_knn_celled(spark, SF_SMALL))
    assert streamed == batch and len(streamed) > 0
    clear_dedup_memos()


def test_append_replay_is_idempotent(spark, tmp_path):
    """Redelivering the same batch id (foreachBatch crash replay) must
    converge — postings are batch-keyed partition overwrites."""
    docs = load_table(spark, SF_SMALL, "documents")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut = ids[int(len(ids) * 0.8)]
    idx = os.path.join(str(tmp_path), "htf_index")
    build_hashed_tf_index(
        docs.filter(F.col("doc_id") < cut), idx, _full_corpus_cells(spark)
    )
    tail = docs.filter(F.col("doc_id") >= cut)
    n1 = append_hashed_tf_batch(idx, tail, batch_id=1)
    first = _rows(hashed_tf_knn_on_index(spark, idx))
    n2 = append_hashed_tf_batch(idx, tail, batch_id=1)  # replay
    second = _rows(hashed_tf_knn_on_index(spark, idx))
    assert (n1, first) == (n2, second)
    # no duplicated postings anywhere
    total = spark.read.parquet(os.path.join(idx, "postings")).count()
    assert total == docs.count()


def test_search_ignores_uncommitted_batches(spark, tmp_path):
    """A batch whose counts marker is missing (crash before the final
    write) must be invisible to the search until its replay commits."""
    import shutil

    docs = load_table(spark, SF_SMALL, "documents")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut = ids[int(len(ids) * 0.8)]
    idx = os.path.join(str(tmp_path), "htf_index")
    build_hashed_tf_index(
        docs.filter(F.col("doc_id") < cut), idx, _full_corpus_cells(spark)
    )
    base = _rows(hashed_tf_knn_on_index(spark, idx))
    append_hashed_tf_batch(idx, docs.filter(F.col("doc_id") >= cut), batch_id=1)
    shutil.rmtree(os.path.join(idx, "counts", "batch_id=1"))  # simulate crash
    assert committed_batches(spark, idx) == {0}
    assert _rows(hashed_tf_knn_on_index(spark, idx)) == base


def test_streamed_assignments_equal_batch_recompute(spark, tmp_path):
    """VERDICT r10 #7: pin the streaming front at the ASSIGNMENT level,
    not just the kNN level — the union of streamed postings
    (vec_id → cell) must be identical to a one-shot batch assignment of
    the same corpus against the same frozen centroids. Assignment
    depends only on the vector and the centroids (the intexact
    assigner's integer-exact arithmetic), so micro-batching must not
    move a single doc."""
    from bigdata_processing_spark.operators.ivf import (
        seeded_assign_cells_intexact,
    )
    from bigdata_processing_spark.queries.nlp import HASHED_TF_DIM
    from bigdata_processing_spark.streaming.hashed_tf import (
        _featurize,
        _read_centroids,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut = ids[int(len(ids) * 0.8)]
    n_cells = _full_corpus_cells(spark)
    idx = os.path.join(str(tmp_path), "htf_index")
    build_hashed_tf_index(docs.filter(F.col("doc_id") < cut), idx, n_cells)

    arrivals = os.path.join(str(tmp_path), "arrivals")
    docs.filter(F.col("doc_id") >= cut).repartition(3).write.parquet(arrivals)
    q = run_hashed_tf_index_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals),
        idx,
        checkpoint=os.path.join(str(tmp_path), "ckpt"),
    )
    q.awaitTermination()
    assert len(committed_batches(spark, idx)) >= 3  # build + >=2 appends

    streamed = {
        (r.vec_id, r.cell)
        for r in spark.read.parquet(os.path.join(idx, "postings"))
        .select("vec_id", "cell")
        .collect()
    }
    cents = _read_centroids(spark, idx)
    # materialize the featurized frame before assigning (the hashed_tf
    # docstring's persist discipline, same as the build path): without
    # it the UDF's argument is the full inline md5-fold tree, and a
    # codegen fallback in a long-lived suite JVM leaves the PythonUDF
    # inside an InterpretedUnsafeProjection -> INTERNAL_ERROR
    vecs = _featurize(docs, HASHED_TF_DIM).persist()
    vecs.count()
    batch = {
        (r.vec_id, r.cell)
        for r in seeded_assign_cells_intexact(
            vecs, cents, id_col="vec_id", e_col="v",
        ).collect()
    }
    vecs.unpersist()
    assert streamed == batch
    assert len(streamed) == docs.count()
