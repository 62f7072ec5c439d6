"""Incremental curation (pipelines/curation.curate_append): the append
path must equal a full recompute over the same corpus (balance off — the
global stage the append path intentionally does not support), survive
replays idempotently, and touch O(batch) docs rather than the corpus."""

from __future__ import annotations

import os

from conftest import SF_SMALL

from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table, table_path
from bigdata_processing_spark.pipelines.curation import (
    curate_append,
    curate_corpus,
    curate_corpus_with_state,
    read_curated,
)
from bigdata_processing_spark.queries.dedup import clear_dedup_memos


def _split_dirs(spark, tmp_path, frac: float = 0.9):
    """(base_sf, full_sf, batch_df): the fixture documents split by id
    ORDER — the append contract requires batch ids above indexed ids,
    exactly the shape of a real ingest tail."""
    docs = load_table(spark, SF_SMALL, "documents")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut = ids[int(len(ids) * frac)]
    base_sf = os.path.join(str(tmp_path), "base_sf")
    full_sf = os.path.join(str(tmp_path), "full_sf")
    os.makedirs(base_sf, exist_ok=True)
    os.makedirs(full_sf, exist_ok=True)
    docs.filter(F.col("doc_id") < cut).write.parquet(
        table_path(base_sf, "documents")
    )
    docs.write.parquet(table_path(full_sf, "documents"))
    return base_sf, full_sf, docs.filter(F.col("doc_id") >= cut)


def test_append_equals_full_recompute(spark, tmp_path):
    clear_dedup_memos()
    base_sf, full_sf, batch = _split_dirs(spark, tmp_path)
    out = os.path.join(str(tmp_path), "curated")
    curate_corpus_with_state(spark, base_sf, out, balance_sources=False)
    sts = curate_append(spark, out, batch)
    assert [s.stage for s in sts] == [
        "exact_dedup", "near_dedup", "quality_filter", "decontamination",
        "emit",
    ]

    out_full = os.path.join(str(tmp_path), "curated_full")
    clear_dedup_memos()  # labels memoized per sf_dir — full run is fresh
    curate_corpus(spark, full_sf, out_full, balance_sources=False)

    incr = {r.doc_id for r in read_curated(spark, out).select("doc_id").collect()}
    full = {
        r.doc_id
        for r in spark.read.parquet(out_full).select("doc_id").collect()
    }
    assert incr == full and len(incr) > 0
    clear_dedup_memos()


def test_append_replay_is_idempotent(spark, tmp_path):
    """Re-running the same batch (foreachBatch redelivery / crash retry)
    must converge to the identical curated set — every write is an
    overwrite of the batch's own directories."""
    clear_dedup_memos()
    base_sf, _full_sf, batch = _split_dirs(spark, tmp_path)
    out = os.path.join(str(tmp_path), "curated")
    curate_corpus_with_state(spark, base_sf, out, balance_sources=False)
    s1 = curate_append(spark, out, batch, batch_id=1)
    first = {r.doc_id for r in read_curated(spark, out).select("doc_id").collect()}
    s2 = curate_append(spark, out, batch, batch_id=1)  # replay
    second = {r.doc_id for r in read_curated(spark, out).select("doc_id").collect()}
    assert first == second
    assert [(x.stage, x.docs_in, x.docs_out) for x in s1] == [
        (x.stage, x.docs_in, x.docs_out) for x in s2
    ]
    clear_dedup_memos()


def test_append_rejects_out_of_order_ids(spark, tmp_path):
    """Batch ids at or below the indexed max violate the append
    contract (an id reappearing is an upsert, and keep-min semantics
    would silently invert) — refused loudly, not absorbed."""
    import pytest

    clear_dedup_memos()
    base_sf, _full_sf, _batch = _split_dirs(spark, tmp_path)
    out = os.path.join(str(tmp_path), "curated")
    curate_corpus_with_state(spark, base_sf, out, balance_sources=False)
    low = load_table(spark, base_sf, "documents").limit(3)
    with pytest.raises(ValueError, match="append batch ids"):
        curate_append(spark, out, low)
    clear_dedup_memos()


def test_streaming_append_front_matches_full_recompute(spark, tmp_path):
    """The streaming front (streaming/curation.run_curation_append_stream)
    must land the same curated set as the batch recompute and record a
    per-batch stage funnel: foreachBatch -> curate_append, exactly-once
    by the same overwrite-own-partition idempotence as the dedup bridge."""
    from bigdata_processing_spark.streaming.curation import (
        read_append_funnel,
        run_curation_append_stream,
    )

    clear_dedup_memos()
    base_sf, full_sf, batch = _split_dirs(spark, tmp_path)
    out = os.path.join(str(tmp_path), "curated")
    curate_corpus_with_state(spark, base_sf, out, balance_sources=False)

    arrivals = os.path.join(str(tmp_path), "arrivals")
    batch.coalesce(1).write.parquet(arrivals)
    stream = spark.readStream.schema(batch.schema).parquet(arrivals)
    q = run_curation_append_stream(
        stream, out, checkpoint=os.path.join(str(tmp_path), "ckpt")
    )
    q.awaitTermination()

    out_full = os.path.join(str(tmp_path), "curated_full")
    clear_dedup_memos()
    curate_corpus(spark, full_sf, out_full, balance_sources=False)
    incr = {r.doc_id for r in read_curated(spark, out).select("doc_id").collect()}
    full = {
        r.doc_id for r in spark.read.parquet(out_full).select("doc_id").collect()
    }
    assert incr == full and len(incr) > 0

    funnel = read_append_funnel(spark, out).collect()
    assert [r.stage for r in funnel] == [
        "exact_dedup", "near_dedup", "quality_filter", "decontamination", "emit"
    ]
    assert funnel[0].batch_id == 1 and funnel[0].docs_in == batch.count()
    clear_dedup_memos()


def test_streaming_append_crash_replay_converges(spark, tmp_path):
    """Force a mid-batch crash in the curation streaming bridge: batch 2
    dies after writing stale partials (survivors dir, fp-store batch,
    stage log) but BEFORE the MinHash counts partition — the completion
    marker — and before the checkpoint commits. Restarting the stream
    replays batch 2 over the stale partials; every write is an
    overwrite of the batch's own directories, so the crashed run must
    converge to the byte-level result of a run that never crashed."""
    import shutil

    from bigdata_processing_spark.operators.incremental_dedup import (
        committed_batches,
    )
    from bigdata_processing_spark.pipelines.curation import (
        _appends_path,
        _state_path,
        _write_fp_batch,
    )
    from bigdata_processing_spark.streaming.curation import (
        read_append_funnel,
        run_curation_append_stream,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    c1, c2 = ids[int(len(ids) * 0.8)], ids[int(len(ids) * 0.9)]
    base_sf = os.path.join(str(tmp_path), "base_sf")
    os.makedirs(base_sf, exist_ok=True)
    docs.filter(F.col("doc_id") < c1).write.parquet(
        table_path(base_sf, "documents")
    )
    w0 = docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2))
    w1 = docs.filter(F.col("doc_id") >= c2)

    def run(root, crash: bool):
        clear_dedup_memos()
        out = os.path.join(root, "curated")
        stage = os.path.join(root, "arrivals")
        ckpt = os.path.join(root, "ckpt")
        curate_corpus_with_state(spark, base_sf, out, balance_sources=False)
        w0.coalesce(1).write.parquet(os.path.join(stage, "w0"))
        q = run_curation_append_stream(
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(stage),
            out, checkpoint=ckpt,
        )
        q.awaitTermination()
        state = _state_path(out)
        assert committed_batches(spark, f"{state}/mh") == {0, 1}

        w1.coalesce(1).write.parquet(os.path.join(stage, "w1"))
        if crash:
            # stale partials from a half-finished batch-2 attempt: raw
            # (uncurated!) survivors, a fp-store partition for half the
            # batch, a stage log with wrong counts — everything EXCEPT
            # the mh counts partition that marks completion
            half = w1.limit(w1.count() // 2)
            half.write.mode("overwrite").parquet(
                f"{_appends_path(out)}/batch_id=2"
            )
            _write_fp_batch(state, 2, half)
            spark.createDataFrame(
                [("exact_dedup", 0, 1, 1)],
                "stage string, stage_idx int, docs_in long, docs_out long",
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{state}/stage_log/batch_id=2"
            )
            assert committed_batches(spark, f"{state}/mh") == {0, 1}

        q = run_curation_append_stream(
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(stage),
            out, checkpoint=ckpt,
        )
        q.awaitTermination()
        assert committed_batches(spark, f"{state}/mh") == {0, 1, 2}
        surv = {
            r.doc_id for r in read_curated(spark, out).select("doc_id").collect()
        }
        funnel = [
            (r.batch_id, r.stage, r.docs_in, r.docs_out)
            for r in read_append_funnel(spark, out).collect()
        ]
        clear_dedup_memos()
        return surv, funnel

    crashed = run(os.path.join(str(tmp_path), "crashed"), crash=True)
    clean = run(os.path.join(str(tmp_path), "clean"), crash=False)
    assert crashed == clean


def test_multi_append_past_refit_keeps_committed_batches(spark, tmp_path):
    """The round-7 high-severity advisory: the mh index refit
    (refit_threshold crossed inside append_to_minhash_index) consolidates
    every prior batch into mh batch 0, erasing the counts/batch_id=N
    markers read_curated USED to treat as the commit record — committed
    batch-1 survivors then silently vanished. Curation now owns its
    commit markers ({state}/committed/batch_id=N), so survivors must be
    stable across a refit, and the next inferred batch id must not
    collide with live append directories."""
    from bigdata_processing_spark.operators.incremental_dedup import (
        committed_batches,
    )
    from bigdata_processing_spark.pipelines.curation import (
        _state_path,
        committed_curation_batches,
    )

    clear_dedup_memos()
    docs = load_table(spark, SF_SMALL, "documents")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    c1, c2 = ids[int(len(ids) * 0.3)], ids[int(len(ids) * 0.7)]
    base_sf = os.path.join(str(tmp_path), "base_sf")
    os.makedirs(base_sf, exist_ok=True)
    docs.filter(F.col("doc_id") < c1).write.parquet(table_path(base_sf, "documents"))
    b1 = docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2))
    b2 = docs.filter(F.col("doc_id") >= c2)

    out = os.path.join(str(tmp_path), "curated")
    curate_corpus_with_state(spark, base_sf, out, balance_sources=False)
    curate_append(spark, out, b1)  # batch 1, committed
    after_b1 = {
        r.doc_id for r in read_curated(spark, out).select("doc_id").collect()
    }
    b1_survivors = {r.doc_id for r in b1.select("doc_id").collect()} & after_b1
    assert b1_survivors, "fixture must commit some batch-1 docs"

    # batch 2 crosses the refit threshold: committed corpus is now 70%
    # of docs vs n_fit=30% -> drift 0.57 > 0.5, so the index refit fires
    # and consolidates mh batches {0,1} into a fresh batch 0
    curate_append(spark, out, b2)
    mh = committed_batches(spark, f"{_state_path(out)}/mh")
    assert 1 not in mh, "test must actually exercise the refit consolidation"

    final = {r.doc_id for r in read_curated(spark, out).select("doc_id").collect()}
    assert b1_survivors <= final, "refit erased committed batch-1 survivors"
    assert committed_curation_batches(spark, out) == {0, 1, 2}
    # survivors of BOTH appends are present and the base corpus too
    assert after_b1 <= final | {r.doc_id for r in b2.select("doc_id").collect()}
    clear_dedup_memos()


def test_fp_bucket_modulus_is_store_state(spark, tmp_path):
    """The fingerprint store's bucket modulus is persisted state
    (fpmeta, round 7 — the √n policy floored at the legacy 64): appends
    must read the STORE's modulus, and the curated result must be
    invariant to it (a mismatch would mis-prune and silently keep
    exact dups)."""
    from bigdata_processing_spark.pipelines.curation import (
        _fp_bucket_count,
        _state_path,
        _write_fp_batch,
    )
    from bigdata_processing_spark.sources.writers import literal_df

    clear_dedup_memos()
    base_sf, _full_sf, batch = _split_dirs(spark, tmp_path)
    outs = {}
    for name, n_fb in (("default", None), ("wide", 256)):
        out = os.path.join(str(tmp_path), f"curated_{name}")
        curate_corpus_with_state(spark, base_sf, out, balance_sources=False)
        if n_fb is not None:
            state = _state_path(out)
            literal_df(spark, [(n_fb,)], "n_fbuckets bigint").coalesce(1)\
                .write.mode("overwrite").parquet(f"{state}/fpmeta")
            docs = load_table(spark, base_sf, "documents")
            _write_fp_batch(state, 0, docs, n_fbuckets=n_fb)
            assert _fp_bucket_count(spark, out) == 256
        else:
            assert _fp_bucket_count(spark, out) == 64  # floor at this scale
        curate_append(spark, out, batch)
        outs[name] = {
            r.doc_id for r in read_curated(spark, out).select("doc_id").collect()
        }
        clear_dedup_memos()
    assert outs["default"] == outs["wide"] and outs["default"]


def test_shard_curated_covers_base_plus_appends(spark, tmp_path):
    from bigdata_processing_spark.pipelines.curation import shard_curated

    clear_dedup_memos()
    base_sf, _full_sf, batch = _split_dirs(spark, tmp_path)
    out = os.path.join(str(tmp_path), "curated")
    curate_corpus_with_state(spark, base_sf, out, balance_sources=False)
    curate_append(spark, out, batch)

    shard_dir = os.path.join(str(tmp_path), "shards")
    ledger = shard_curated(spark, out, shard_dir)
    curated_ids = {
        r.doc_id for r in read_curated(spark, out).select("doc_id").collect()
    }
    # ledger accounts for every curated doc (base AND appended)
    assert sum(r["n_docs"] for r in ledger.collect()) == len(curated_ids)
    on_disk = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(shard_dir, "data"))
        .select("doc_id").collect()
    }
    assert on_disk == curated_ids
    # re-sharding after the append is deterministic (replay-idempotent)
    shard_dir2 = os.path.join(str(tmp_path), "shards2")
    shard_curated(spark, out, shard_dir2)
    a = spark.read.parquet(os.path.join(shard_dir, "data")).select(
        "doc_id", "shard").collect()
    b = spark.read.parquet(os.path.join(shard_dir2, "data")).select(
        "doc_id", "shard").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    clear_dedup_memos()


def test_upgrade_path_backfills_committed_markers(spark, tmp_path):
    """Round-8 advisory (high): the FIRST curation-owned marker write on
    a pre-round-7 state dir (no {state}/committed) must backfill markers
    for every batch the mh-counts fallback vouched for — otherwise
    committed_curation_batches stops consulting the fallback and every
    previously committed append batch silently vanishes from
    read_curated, reintroducing the exact data loss the markers fixed."""
    import shutil

    from bigdata_processing_spark.pipelines.curation import (
        _state_path,
        committed_curation_batches,
    )

    clear_dedup_memos()
    docs = load_table(spark, SF_SMALL, "documents")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    c1, c2 = ids[int(len(ids) * 0.8)], ids[int(len(ids) * 0.9)]
    base_sf = os.path.join(str(tmp_path), "base_sf")
    os.makedirs(base_sf, exist_ok=True)
    docs.filter(F.col("doc_id") < c1).write.parquet(table_path(base_sf, "documents"))
    b1 = docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2))
    b2 = docs.filter(F.col("doc_id") >= c2)

    out = os.path.join(str(tmp_path), "curated")
    curate_corpus_with_state(spark, base_sf, out, balance_sources=False)
    curate_append(spark, out, b1)  # batch 1, committed under markers
    after_b1 = {
        r.doc_id for r in read_curated(spark, out).select("doc_id").collect()
    }
    b1_survivors = {r.doc_id for r in b1.select("doc_id").collect()} & after_b1
    assert b1_survivors, "fixture must commit some batch-1 docs"

    # simulate the documented upgrade path: a pre-round-7 state dir has
    # NO curation-owned marker directory — the fallback (mh counts) is
    # the only commit record for batches 0 and 1
    shutil.rmtree(f"{_state_path(out)}/committed")
    assert committed_curation_batches(spark, out) == {0, 1}

    curate_append(spark, out, b2)  # first marker write post-upgrade
    assert committed_curation_batches(spark, out) == {0, 1, 2}
    final = {r.doc_id for r in read_curated(spark, out).select("doc_id").collect()}
    assert b1_survivors <= final, (
        "first post-upgrade append stranded pre-existing committed batches"
    )
    clear_dedup_memos()


def test_marker_backfill_is_crash_atomic(spark, tmp_path, monkeypatch):
    """Round-10 fix (r8 advisory, medium): the pre-round-7 marker
    backfill must be all-or-nothing. The old code wrote markers straight
    into the live {state}/committed dir — its FIRST write disabled the
    mh-counts fallback, so a crash mid-backfill permanently stranded
    every not-yet-backfilled batch. Now the set is staged and renamed in
    one step: a crash leaves the fallback authoritative and a replay
    completes the upgrade."""
    import shutil

    import bigdata_processing_spark.pipelines.curation as C
    from bigdata_processing_spark.pipelines.curation import (
        _mark_batch_committed,
        _state_path,
        committed_curation_batches,
    )

    clear_dedup_memos()
    base_sf, _full, batch = _split_dirs(spark, tmp_path)
    out = os.path.join(str(tmp_path), "curated")
    curate_corpus_with_state(spark, base_sf, out, balance_sources=False)
    curate_append(spark, out, batch)  # batch 1, committed under markers
    assert committed_curation_batches(spark, out) == {0, 1}

    # simulate the pre-round-7 upgrade: no curation-owned marker dir
    shutil.rmtree(f"{_state_path(out)}/committed")
    assert committed_curation_batches(spark, out) == {0, 1}  # fallback

    # crash injection: the backfill's SECOND marker write dies (one
    # marker already staged — the old code would have written it into
    # the live dir, killing the fallback with batch 1 still unmarked)
    real = C.write_batch_marker
    calls = {"n": 0}

    def dying(spark_, path, bid, n=1, table="counts"):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("injected crash mid-backfill")
        real(spark_, path, bid, n, table=table)

    monkeypatch.setattr(C, "write_batch_marker", dying)
    try:
        _mark_batch_committed(spark, out, 2)
    except RuntimeError:
        pass
    monkeypatch.setattr(C, "write_batch_marker", real)

    # the crash must NOT have disabled the fallback or lost a batch
    assert committed_curation_batches(spark, out) == {0, 1}, (
        "crash mid-backfill stranded pre-upgrade batches"
    )
    # replay completes the upgrade: all markers live, fallback retired
    _mark_batch_committed(spark, out, 2)
    assert os.path.exists(f"{_state_path(out)}/committed")
    assert not os.path.exists(f"{_state_path(out)}/committed.backfilling")
    assert committed_curation_batches(spark, out) == {0, 1, 2}
    clear_dedup_memos()
