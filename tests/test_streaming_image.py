"""Incremental/streaming image near-dup (streaming/image_dedup.py):
the probe must find cross-batch near-identical images without
rescanning indexed pixels, the streamed pair union must equal the
batch operator on an under-cap corpus, and replays must converge."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdata_processing_spark.operators.multimodal import (
    encode_bmp,
    image_dhash,
    image_neardup_pairs_from_hashes,
)
from bigdata_processing_spark.streaming.image_dedup import (
    append_image_batch,
    build_image_index,
    committed_batches,
    incremental_image_dup_pairs,
    run_image_dedup_stream,
)
from bigdata_processing_spark.thresholds import IMAGE_HAMMING_MAX, MAX_BUCKET


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(p), "image/bmp") for i, p in rows],
        "img_id bigint, payload binary, media_type string",
    )


def _pairs(df):
    return {(r.d1, r.d2, r.hamming) for r in df.collect()}


def test_probe_finds_cross_batch_near_identicals(spark, tmp_path):
    """An indexed image's brightness-shifted copy arriving later must
    pair with it; unrelated arrivals must not."""
    idx = os.path.join(str(tmp_path), "img_index")
    base = [(i, encode_bmp(40 + 2 * i)) for i in range(20)]  # distinct imgs
    build_image_index(_media(spark, base), idx)

    batch = [(100, encode_bmp(88, shift=8)),  # copy of... nothing indexed
             (101, encode_bmp(44, shift=8)),  # near-copy of img_id 2 (ham 3)
             (102, encode_bmp(999))]          # unrelated content
    got = _pairs(incremental_image_dup_pairs(_media(spark, batch), idx))
    assert (2, 101) in {(d1, d2) for d1, d2, _ in got}
    assert all(d1 in (2, 101) or d2 in (100, 101, 102) for d1, d2, _ in got)
    # the pure-indexed pair space is NOT re-emitted (batch-involving only)
    assert all(d2 >= 100 for _d1, d2, _h in got)


def test_streamed_union_matches_batch_operator(spark, tmp_path):
    """On an under-cap corpus the streamed pair union (build pairs +
    per-batch probe pairs) equals the batch operator over the full
    image set exactly — combined-size caps reduce to the batch
    operator's caps when nothing crosses MAX_BUCKET."""
    idx = os.path.join(str(tmp_path), "img_index")
    pairs_dir = os.path.join(str(tmp_path), "pairs")

    base = [(i, encode_bmp(40 + 2 * i)) for i in range(12)]
    w0 = [(100, encode_bmp(44, shift=8)), (101, encode_bmp(77))]
    w1 = [(200, encode_bmp(44, shift=8)), (201, encode_bmp(48, shift=8))]

    build_image_index(_media(spark, base), idx)
    # build-internal pairs recorded as batch 0 (the batch operator over
    # the base slice)
    image_neardup_pairs_from_hashes(
        image_dhash(_media(spark, base)), IMAGE_HAMMING_MAX, MAX_BUCKET
    ).write.mode("overwrite").parquet(f"{pairs_dir}/batch_id=0")

    stage = os.path.join(str(tmp_path), "arrivals")
    _media(spark, w0).coalesce(1).write.parquet(os.path.join(stage, "w0"))
    _media(spark, w1).coalesce(1).write.parquet(os.path.join(stage, "w1"))
    q = run_image_dedup_stream(
        spark.readStream.schema("img_id bigint, payload binary, media_type string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stage),
        idx, pairs_dir,
        checkpoint=os.path.join(str(tmp_path), "ckpt"),
    )
    q.awaitTermination()
    assert committed_batches(spark, idx) == {0, 1, 2}

    streamed = _pairs(
        spark.read.option("basePath", pairs_dir).parquet(pairs_dir)
        .select("d1", "d2", "hamming")
    )
    batch_all = _pairs(
        image_neardup_pairs_from_hashes(
            image_dhash(_media(spark, base + w0 + w1)),
            IMAGE_HAMMING_MAX, MAX_BUCKET,
        )
    )
    assert streamed == batch_all and len(batch_all) > 0
    # the cross-batch copies were actually found
    found = {(d1, d2) for d1, d2, _ in streamed}
    assert (2, 100) in found or (100, 200) in found  # 44-copies family


def test_probe_replay_converges(spark, tmp_path):
    """Replaying a batch after its append (exclude_batch_id) computes
    the identical pair set, and re-appending overwrites in place."""
    idx = os.path.join(str(tmp_path), "img_index")
    base = [(i, encode_bmp(40 + 2 * i)) for i in range(10)]
    build_image_index(_media(spark, base), idx)
    batch = _media(spark, [(100, encode_bmp(44, shift=8))])

    before = _pairs(incremental_image_dup_pairs(batch, idx, exclude_batch_id=1))
    append_image_batch(idx, batch, batch_id=1)
    after = _pairs(incremental_image_dup_pairs(batch, idx, exclude_batch_id=1))
    assert before == after and len(after) > 0
    n1 = append_image_batch(idx, batch, batch_id=1)  # replay
    assert n1 == 1
    total = spark.read.parquet(os.path.join(idx, "hashes")).count()
    assert total == 11  # no duplicated postings


def test_overcap_clique_probe_uses_stars(spark, tmp_path):
    """A batch arriving into an over-cap identical-image family must
    still pair (representative stars over the COMBINED membership) —
    the image sibling of the text probe's round-6 blindness fix."""
    idx = os.path.join(str(tmp_path), "img_index")
    base = [(i, encode_bmp(40)) for i in range(30)]  # one 30-clique
    build_image_index(_media(spark, base), idx)
    got = _pairs(incremental_image_dup_pairs(
        _media(spark, [(100, encode_bmp(40))]), idx, max_bucket=5
    ))
    assert got, "over-cap family probe must not be blind"
    assert all(h == 0 for _1, _2, h in got)
    assert any(d2 == 100 or d1 == 100 for d1, d2, _ in got)


def test_disk_probe_matches_relational_twin(spark, tmp_path):
    """Index the fixture originals, probe the planted re-encoded
    copies: the disk pipeline and the registered twin query must agree
    on every (d1, d2, hamming)."""
    from conftest import SF_SMALL

    from bigdata_processing_spark.catalog import load_table
    from bigdata_processing_spark.operators.multimodal import (
        attach_encoded_images_with_variants,
    )
    from bigdata_processing_spark.queries.multimodal import (
        incremental_image_dedup_pairs,
    )
    from bigdata_processing_spark.thresholds import IMAGE_VARIANT_SHIFT

    docs = load_table(spark, SF_SMALL, "documents").filter(
        (F.col("doc_id") < 120) & (F.col("doc_id") % 2 == 0)
    )
    media = attach_encoded_images_with_variants(docs, shift=IMAGE_VARIANT_SHIFT)
    idx = os.path.join(str(tmp_path), "img_index")
    build_image_index(media.filter(F.col("img_id") < 100000), idx)
    got = _pairs(incremental_image_dup_pairs(
        media.filter(F.col("img_id") >= 100000), idx
    ))
    want = _pairs(incremental_image_dedup_pairs(spark, SF_SMALL))
    assert got == want and len(want) > 0


def test_monotonicity_violation_fails_loudly(spark, tmp_path):
    """A batch carrying an img_id <= an indexed rep id breaks the
    first-seen-rep contract (d1 > d2 star edges, divergent clique rep);
    round 12 ENFORCES it — both the append and the probe raise instead
    of silently emitting a divergent edge set (ADVICE r11)."""
    import pytest

    idx = os.path.join(str(tmp_path), "img_index")
    base = [(i, encode_bmp(40 + 2 * i)) for i in range(5)]
    build_image_index(_media(spark, base), idx)
    bad = _media(spark, [(2, encode_bmp(44, shift=8))])
    with pytest.raises(ValueError, match="first-seen-rep"):
        append_image_batch(idx, bad, batch_id=1)
    with pytest.raises(ValueError, match="first-seen-rep"):
        incremental_image_dup_pairs(bad, idx)
    # nothing was committed by the failed append
    assert committed_batches(spark, idx) == {0}
    # a conforming batch still appends fine afterwards
    ok = _media(spark, [(100, encode_bmp(44, shift=8))])
    assert append_image_batch(idx, ok, batch_id=1) == 1
