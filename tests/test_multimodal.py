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


def test_decode_real_path_needs_codec_for_compressed_formats(spark):
    # attach_media fakes png/mp4 payloads from text bytes — the real
    # decoder has no codec for those and must say so, not guess
    media = attach_media(_docs(spark))
    with pytest.raises(Exception) as exc_info:
        decode_media(media, decode_stub=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_bmp_codec_roundtrip_pure():
    from bigdata_processing_spark.operators.multimodal import (
        _bmp_dims,
        decode_bmp,
        encode_bmp,
    )

    for seed in (0, 2, 48, 254):
        b = encode_bmp(seed)
        assert b[:2] == b"BM"
        w, h, csum = decode_bmp(b)
        assert (w, h) == _bmp_dims(seed)
        assert csum == sum((seed * 7 + k * 13) % 256 for k in range(w * h * 3))
        # file size: headers + padded rows
        assert len(b) == 54 + ((w * 3 + 3) & ~3) * h


def test_wav_codec_roundtrip_pure():
    from bigdata_processing_spark.operators.multimodal import (
        WAV_RATE,
        _wav_n_samples,
        decode_wav,
        encode_wav,
    )

    for seed in (1, 3, 255, 1001):
        b = encode_wav(seed)
        assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
        n, rate, csum = decode_wav(b)
        assert n == _wav_n_samples(seed)
        assert rate == WAV_RATE
        assert csum == sum(
            (seed * 31 + k * 17) % 65536 - 32768 for k in range(n)
        )


def test_real_codec_decode_end_to_end(spark):
    """decode_stub=False works end-to-end for BMP and WAV payloads:
    mapInPandas encode stage → mapInPandas parse stage, values matching
    the pure-Python decoders on the driver."""
    from bigdata_processing_spark.operators.multimodal import (
        attach_encoded_media,
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    docs = _docs(spark)
    decoded = {
        r.doc_id: r
        for r in decode_media(
            attach_encoded_media(docs), decode_stub=False
        ).collect()
    }
    for did in [r.doc_id for r in docs.select("doc_id").collect()]:
        r = decoded[did]
        if did % 2 == 0:
            w, h, csum = decode_bmp(encode_bmp(did))
            assert (r.media_type, r.width, r.height, r.checksum) == (
                "image/bmp", w, h, csum)
        else:
            n, _rate, csum = decode_wav(encode_wav(did))
            assert (r.media_type, r.width, r.height, r.checksum) == (
                "audio/wav", n, 1, csum)


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


def test_audio_features_single_sample_clip(spark):
    """A structurally valid WAV with ONE sample has no adjacent pairs:
    zcr must be the defined 0.0 (the max_frame_rms short-clip
    convention), not a 0/0 NaN."""
    import struct

    from bigdata_processing_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        WAV_RATE,
        audio_frame_features,
    )

    data = struct.pack("<h", -12345)
    fmt = struct.pack("<HHIIHH", 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body

    media = spark.createDataFrame(
        [(1, bytearray(wav), "audio/wav", 0, 0)], MEDIA_SCHEMA
    )
    [r] = audio_frame_features(media).collect()
    assert (r.n_samples, r.zcr, r.peak) == (1, 0.0, 12345)
    assert math.isclose(r.rms, 12345.0)
    assert r.max_frame_rms == 0.0  # shorter than one frame


# ---------------------------------------------------------------------------
# Perceptual image near-dup (round 7): planted near-identical images must
# pair up, unrelated images must not, and over-cap identical cliques go
# through the representative-star path.
# ---------------------------------------------------------------------------
def _media_df(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(p), "image/bmp") for i, p in rows],
        "img_id bigint, payload binary, media_type string",
    )


def test_image_neardup_planted_near_identicals(spark):
    """A brightness-shifted copy (all bytes +shift mod 256 — dHash bits
    flip only at wrap positions) must pair with its original within the
    default Hamming budget; a structurally different image must not."""
    from bigdata_processing_spark.operators.multimodal import (
        encode_bmp,
        image_dhash,
        image_neardup_pairs_from_hashes,
    )
    from bigdata_processing_spark.thresholds import (
        IMAGE_HAMMING_MAX,
        MAX_BUCKET,
    )

    # seed 88: the shifted copy lands at Hamming 2 (wrap positions only)
    # — within budget; other seeds' copies legitimately drift past it
    rows = [
        (1, encode_bmp(88)),            # original
        (2, encode_bmp(88, shift=8)),   # planted near-identical copy
        (3, encode_bmp(41)),            # different content, same-ish size
        (4, encode_bmp(77)),            # unrelated
    ]
    pairs = {
        (r.d1, r.d2): r.hamming
        for r in image_neardup_pairs_from_hashes(
            image_dhash(_media_df(spark, rows)),
            hamming_max=IMAGE_HAMMING_MAX, max_bucket=MAX_BUCKET,
        ).collect()
    }
    assert (1, 2) in pairs, "planted near-identical copy not recovered"
    assert pairs[(1, 2)] <= IMAGE_HAMMING_MAX
    assert (1, 3) not in pairs and (1, 4) not in pairs


def test_image_neardup_overcap_clique_uses_star_pairs(spark):
    """An identical-image clique larger than MAX_BUCKET (re-crawl dups)
    must still come back fully connected — via representative stars, at
    O(B·B/max_bucket) pairs instead of B²."""
    import math

    from bigdata_processing_spark.operators.multimodal import (
        encode_bmp,
        image_dhash,
        image_neardup_pairs_from_hashes,
    )

    b_sz = 12  # clique size, > max_bucket below
    rows = [(i, encode_bmp(40)) for i in range(b_sz)]
    pairs = image_neardup_pairs_from_hashes(
        image_dhash(_media_df(spark, rows)), hamming_max=0, max_bucket=5
    ).collect()
    got = {(r.d1, r.d2) for r in pairs}
    # star-bounded: <= n_reps * B pairs, strictly under the B^2/2 clique
    n_reps = math.ceil(b_sz / 5)
    assert 0 < len(got) <= n_reps * b_sz < b_sz * (b_sz - 1) // 2 + 1
    # the stars connect the whole clique into ONE component
    parent = {i: i for i in range(b_sz)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for d1, d2 in got:
        parent[find(d1)] = find(d2)
    assert len({find(i) for i in range(b_sz)}) == 1


def test_image_dhash_brightness_invariance_without_wrap(spark):
    """dHash compares ADJACENT luma values, so a +shift that never wraps
    any byte leaves the hash bit-identical. encode with a seed whose
    bytes stay low, shift modestly: distance must be exactly 0."""
    import numpy as np

    from bigdata_processing_spark.operators.multimodal import (
        decode_bmp_pixels,
        image_dhash,
    )

    # build a custom BMP whose pixel bytes are all < 200 so +40 can't wrap
    import struct

    w, h = 9, 8
    row_size = (w * 3 + 3) & ~3
    off = 54
    fh = struct.pack("<2sIHHI", b"BM", off + row_size * h, 0, 0, off)
    ih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_size * h,
                     2835, 2835, 0, 0)
    k = np.arange(h * w * 3, dtype=np.int64).reshape(h, w * 3)
    base = ((k * 13) % 200).astype(np.uint8)
    pad = np.zeros((h, row_size - w * 3), dtype=np.uint8)
    img0 = fh + ih + np.hstack([base, pad]).tobytes()
    img1 = fh + ih + np.hstack([base + 40, pad]).tobytes()
    assert decode_bmp_pixels(img1).max() < 256

    hs = {
        r.img_id: (r.b0, r.b1, r.b2, r.b3)
        for r in image_dhash(_media_df(spark, [(0, img0), (1, img1)])).collect()
    }
    assert hs[0] == hs[1]


def test_image_neardup_null_bands_dropped(spark):
    """Rows with NULL band values must be DROPPED before the
    signature-collapse window (ADVICE r11): a null-band cohort would
    otherwise collapse into ONE "signature" clique and unrelated images
    would be declared exact duplicates with hamming 0 — the pre-collapse
    operator dropped such pairs at the hamming filter instead."""
    from bigdata_processing_spark.operators.multimodal import (
        image_neardup_pairs_from_hashes,
    )

    hashes = spark.createDataFrame(
        [(1, 10, 20, 30, 40),
         (2, None, None, None, None),
         (3, None, None, None, None),
         (4, 10, 20, 30, 40)],
        "img_id bigint, b0 int, b1 int, b2 int, b3 int",
    )
    got = {
        (r.d1, r.d2, r.hamming)
        for r in image_neardup_pairs_from_hashes(
            hashes, hamming_max=3, max_bucket=50
        ).collect()
    }
    assert got == {(1, 4, 0)}
