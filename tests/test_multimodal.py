"""Multimodal binary-column plumbing: schema contract, Arrow batch path,
deterministic stub decode, real feature extraction, frame sampling."""

from __future__ import annotations

import math

import pytest

from conftest import SF_SMALL

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_media,
    decode_media,
    extract_features,
    sample_frames,
)


def _docs(spark):
    return load_table(spark, SF_SMALL, "documents").limit(30)


def test_media_schema_contract(spark):
    media = attach_media(_docs(spark))
    assert dict(media.dtypes) == {
        "doc_id": "bigint",
        "payload": "binary",
        "media_type": "string",
        "declared_w": "int",
        "declared_h": "int",
    }


def test_decode_stub_deterministic(spark):
    media = attach_media(_docs(spark))
    a = {r.doc_id: (r.n_bytes, r.checksum) for r in decode_media(media).collect()}
    b = {r.doc_id: (r.n_bytes, r.checksum) for r in decode_media(media).collect()}
    assert a == b and len(a) == 30
    # checksum really is the byte sum of the utf-8 payload
    docs = {r.doc_id: r.text for r in _docs(spark).collect()}
    for doc_id, (n_bytes, checksum) in a.items():
        raw = docs[doc_id].encode("utf-8")
        assert n_bytes == len(raw)
        assert checksum == sum(raw)


def test_decode_real_path_is_stubbed(spark):
    media = attach_media(_docs(spark))
    with pytest.raises(Exception) as exc_info:
        decode_media(media, decode_stub=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_feature_extraction_l1_normalized(spark):
    feats = extract_features(attach_media(_docs(spark))).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r.feature) == FEATURE_DIM
        assert math.isclose(sum(r.feature), 1.0, rel_tol=1e-9)
        assert all(v >= 0 for v in r.feature)


def test_frame_sampling(spark):
    media = attach_media(_docs(spark))
    frames = sample_frames(media, frame_size=64, stride=256)
    rows = frames.collect()
    assert all(r.frame_len <= 64 for r in rows)
    # only video payloads produce frames
    kinds = {r.doc_id % 3 for r in rows}
    assert kinds <= {2}
