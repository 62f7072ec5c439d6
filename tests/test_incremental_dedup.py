"""Incremental batch dedup (operators/incremental_dedup.py): the disk
index must reproduce the registered relational twin row-for-row, appends
must make earlier batches visible to later probes, the drift refit must
re-prune the vocabulary, and the swap windows must heal."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conftest import SF_SMALL

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.operators.incremental_dedup import (
    append_to_minhash_index,
    build_minhash_index,
    incremental_dup_pairs,
)
from bigdata_processing_spark.queries.dedup import (
    clear_dedup_memos,
    incremental_dedup_pairs,
)


def test_disk_probe_matches_relational_twin(spark, tmp_path):
    """Index the 3/4 split, probe the 1/4 batch: the disk pipeline and
    the registered twin query must agree on every (d1, d2, jaccard)."""
    docs = load_table(spark, SF_SMALL, "documents")
    idx = os.path.join(str(tmp_path), "mh_index")
    n = build_minhash_index(docs.filter(F.col("doc_id") % 4 != 0), idx)
    assert n == docs.filter(F.col("doc_id") % 4 != 0).count()

    got = {
        (r.d1, r.d2, round(r.jaccard, 9))
        for r in incremental_dup_pairs(
            docs.filter(F.col("doc_id") % 4 == 0), idx
        ).collect()
    }
    clear_dedup_memos()
    want = {
        (r.d1, r.d2, round(r.jaccard, 9))
        for r in incremental_dedup_pairs(spark, SF_SMALL).collect()
    }
    assert got == want
    assert want, "fixture should surface batch-involving near-dups"
    clear_dedup_memos()


def _mini_corpus(spark, texts_by_id):
    return spark.createDataFrame(
        [(i, t, "src") for i, t in texts_by_id.items()],
        "doc_id bigint, text string, source string",
    )


def test_append_makes_batch_visible_to_later_probes(spark, tmp_path):
    """A doc appended in batch B must pair with a near-identical doc
    arriving later in batch C — the cross-batch state is the point."""
    base = {
        i: f"wholly unrelated document number {i} tokens t{i} u{i*3} v{i*7}"
        for i in range(20)
    }
    b_doc = {100: "the quick brown fox jumps over the lazy dog tonight"}
    c_doc = {200: "the quick brown fox jumps over the lazy dog tonight"}
    idx = os.path.join(str(tmp_path), "mh_index")
    build_minhash_index(_mini_corpus(spark, base), idx)

    # C before B is appended: no partner indexed yet
    before = incremental_dup_pairs(_mini_corpus(spark, c_doc), idx).collect()
    assert [(r.d1, r.d2) for r in before] == []

    n, refit = append_to_minhash_index(idx, _mini_corpus(spark, b_doc))
    assert (n, refit) == (1, False)
    after = incremental_dup_pairs(_mini_corpus(spark, c_doc), idx).collect()
    assert [(r.d1, r.d2, r.jaccard) for r in after] == [(100, 200, 1.0)]


def test_refit_reprunes_vocabulary(spark, tmp_path):
    """Appending more than refit_threshold of the corpus rebuilds the
    index with a fresh DF prune; meta resets and the index still
    answers probes."""
    base = {i: f"distinct base doc {i} alpha{i} beta{i*3}" for i in range(10)}
    big = {100 + i: f"distinct new doc {i} gamma{i} delta{i*5}" for i in range(15)}
    idx = os.path.join(str(tmp_path), "mh_index")
    build_minhash_index(_mini_corpus(spark, base), idx)
    n, refit = append_to_minhash_index(
        idx, _mini_corpus(spark, big), refit_threshold=0.5
    )
    assert (n, refit) == (15, True)
    meta = spark.read.parquet(os.path.join(idx, "meta")).collect()[0]
    assert meta.n_docs == 25 and meta.n_since_fit == 0
    probe = {300: "distinct new doc 3 gamma3 delta15"}  # clone of id 103
    got = incremental_dup_pairs(_mini_corpus(spark, probe), idx).collect()
    assert [(r.d1, r.d2, r.jaccard) for r in got] == [(103, 300, 1.0)]


def test_append_crash_window_heals(spark, tmp_path):
    """A crash between rename(bucket_sizes→old) and rename(tmp→live)
    leaves the sizes parked; the next append heals and the cap still
    sees correct combined counts."""
    import shutil

    base = {i: f"crash test doc {i} w{i} x{i*2} y{i*3}" for i in range(8)}
    idx = os.path.join(str(tmp_path), "mh_index")
    build_minhash_index(_mini_corpus(spark, base), idx)
    bsz = os.path.join(idx, "bucket_sizes")
    os.rename(bsz, bsz + ".old")  # simulate the crash window
    shutil.copytree(bsz + ".old", bsz + ".rebuild")  # orphaned scratch
    n, refit = append_to_minhash_index(
        idx, _mini_corpus(spark, {500: "crash test doc 3 w3 x6 y9"})
    )
    assert n == 1 and not refit
    assert os.path.isdir(bsz)
    assert not os.path.isdir(bsz + ".old") and not os.path.isdir(bsz + ".rebuild")
    # the healed index still finds the planted clone of doc 3
    got = incremental_dup_pairs(
        _mini_corpus(spark, {600: "crash test doc 3 w3 x6 y9"}), idx
    ).collect()
    assert (3, 600) in {(r.d1, r.d2) for r in got}
    assert (500, 600) in {(r.d1, r.d2) for r in got}  # appended batch visible
