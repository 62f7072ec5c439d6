"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``.

North-star extension (SURVEY.md §2.12 scope: "multimodal columns" per
BASELINE.json). The container has no image/audio codecs, so the DECODE
step is stubbed (deterministic fake behind ``decode_stub=True``; the
real-codec path raises NotImplementedError) — but everything Spark-side
is real and tested: the schema contract, the Arrow batch shape, the
partition-preserving mapInPandas plumbing, and a fully real
byte-histogram feature extractor.

Scale notes: binary payloads ride in the same columnar batches as any
other column; mapInPandas streams Arrow batches (no per-row pickling —
the reference's boundary #3, SURVEY.md §3.1, does not exist here);
feature extraction is embarrassingly parallel with no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Schema contract for a multimodal table: opaque payload + typed metadata.
MEDIA_SCHEMA = (
    "doc_id bigint, payload binary, media_type string, "
    "declared_w int, declared_h int"
)

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, "
    "n_bytes int, checksum bigint"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = f"doc_id bigint, feature array<double>"


def attach_media(docs: DataFrame) -> DataFrame:
    """Build a multimodal table from ``documents``: the utf-8 bytes of
    ``text`` stand in for an encoded media payload, with deterministic
    declared metadata. (Fixture adapter — a real pipeline reads payloads
    from parquet/object storage the same way.)"""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        (F.col("doc_id") % 64 + 1).cast("int").alias("declared_w"),
        (F.col("doc_id") % 48 + 1).cast("int").alias("declared_h"),
    )


# ---------------------------------------------------------------------------
# Real codecs (no external libs): BMP (24bpp uncompressed) and WAV
# (PCM16 mono) are header+raw formats a few dozen lines of struct
# packing away — so the decode_stub=False slot works END-TO-END for
# these two media types without PIL/ffmpeg. Compressed formats
# (PNG/JPEG/mp4) still raise NotImplementedError (genuinely env-blocked).
#
# Payload content is deterministic in a seed (pixel byte k of image
# `s`: (s*7 + k*13) % 256; sample k of clip `s`: (s*31 + k*17) % 65536
# - 32768), so an ANSI-SQL oracle reproduces every decoded stat by
# arithmetic alone — the driver can hash-verify a real encode→decode
# roundtrip.
# ---------------------------------------------------------------------------
def _bmp_dims(seed: int) -> tuple[int, int]:
    return seed % 16 + 1, seed % 12 + 1


def _wav_n_samples(seed: int) -> int:
    return seed % 256 + 16


WAV_RATE = 8000


def encode_bmp(seed: int, shift: int = 0) -> bytes:
    """A valid 24bpp .bmp: BITMAPFILEHEADER + BITMAPINFOHEADER + raw
    bottom-up pixel rows padded to 4-byte boundaries. ``shift`` adds a
    constant to every pixel byte (mod 256) — the deterministic
    "re-encoded copy" knob the image near-dup fixture plants."""
    import struct

    import numpy as np

    w, h = _bmp_dims(seed)
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    off = 14 + 40
    fh = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    ih = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    k = np.arange(h * w * 3, dtype=np.int64).reshape(h, w * 3)
    px = ((seed * 7 + k * 13 + shift) % 256).astype(np.uint8)
    pad = np.zeros((h, row_size - w * 3), dtype=np.uint8)
    return fh + ih + np.hstack([px, pad]).tobytes()


def decode_bmp(b: bytes) -> tuple[int, int, int]:
    """Parse (width, height, pixel_checksum) from a 24bpp BMP. The
    checksum sums PIXEL bytes only (row padding excluded)."""
    import struct

    import numpy as np

    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    if bpp != 24:
        raise NotImplementedError(f"only 24bpp BMP supported, got {bpp}")
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(b, dtype=np.uint8, count=row_size * abs(h), offset=off)
    px = rows.reshape(abs(h), row_size)[:, : w * 3]
    return w, abs(h), int(px.astype(np.int64).sum())


def encode_wav(seed: int) -> bytes:
    """A valid RIFF/WAVE file: fmt chunk (PCM16 mono @8kHz) + data
    chunk of deterministic samples."""
    import struct

    import numpy as np

    n = _wav_n_samples(seed)
    k = np.arange(n, dtype=np.int64)
    samples = ((seed * 31 + k * 17) % 65536 - 32768).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(b: bytes) -> tuple[int, int, int]:
    """Parse (n_samples, sample_rate, sample_checksum) from a PCM16 WAV
    by walking RIFF chunks (fmt may precede or follow other chunks)."""
    import struct

    import numpy as np

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(b):
        cid, sz = b[pos:pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
        if cid == b"fmt ":
            fmt_code, _ch, rate = struct.unpack_from("<HHI", b, pos + 8)
            bits = struct.unpack_from("<H", b, pos + 22)[0]
            if fmt_code != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV supported")
        elif cid == b"data":
            samples = np.frombuffer(b, dtype="<i2", count=sz // 2,
                                    offset=pos + 8)
        pos += 8 + sz + (sz & 1)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt or data chunk")
    return len(samples), rate, int(samples.astype(np.int64).sum())


def attach_encoded_media(docs: DataFrame) -> DataFrame:
    """Real-codec fixture adapter: even doc_ids become genuine BMP
    images, odd doc_ids genuine WAV clips (payloads are valid files any
    external tool could open). Runs in Arrow-batched mapInPandas like
    every other payload stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            seeds = pdf["doc_id"].astype("int64")
            payloads = [
                encode_bmp(int(s)) if s % 2 == 0 else encode_wav(int(s))
                for s in seeds
            ]
            types = ["image/bmp" if s % 2 == 0 else "audio/wav" for s in seeds]
            out = pd.DataFrame(
                {"doc_id": seeds, "payload": payloads, "media_type": types}
            )
            out["declared_w"] = [
                _bmp_dims(int(s))[0] if s % 2 == 0 else 0 for s in seeds
            ]
            out["declared_h"] = [
                _bmp_dims(int(s))[1] if s % 2 == 0 else 0 for s in seeds
            ]
            yield out

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_SCHEMA)


def decode_media(media: DataFrame, *, decode_stub: bool = True) -> DataFrame:
    """Decode payloads → dimensions/checksum via mapInPandas.

    ``decode_stub=True`` runs a deterministic fake decoder (dims derived
    from payload length, checksum = sum of bytes) so the full pipeline is
    testable without codecs. ``decode_stub=False`` decodes for REAL:
    BMP payloads → (width, height, pixel checksum), WAV payloads →
    (n_samples as width, 1 as height, sample checksum); compressed
    formats (PNG/JPEG/mp4) raise NotImplementedError — those genuinely
    need codec libs not present in this environment.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                rows = []
                for did, mt, payload in zip(
                    pdf["doc_id"], pdf["media_type"], pdf["payload"]
                ):
                    b = bytes(payload) if payload is not None else b""
                    if b[:2] == b"BM":
                        w, h, csum = decode_bmp(b)
                    elif b[:4] == b"RIFF":
                        n, _rate, csum = decode_wav(b)
                        w, h = n, 1
                    else:
                        raise NotImplementedError(
                            f"no codec for media_type={mt!r} in this "
                            "environment (BMP/WAV are the lib-free formats)"
                        )
                    rows.append((did, mt, w, h, len(b), csum))
                yield pd.DataFrame(
                    rows,
                    columns=["doc_id", "media_type", "width", "height",
                             "n_bytes", "checksum"],
                )
                continue
            payloads = pdf["payload"]
            n = payloads.str.len().fillna(0).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    # fake decode: dims deterministic in payload length
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "n_bytes": n,
                    "checksum": payloads.map(
                        lambda b: int(sum(b)) if b is not None else 0
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Real (non-stub) feature extractor: L1-normalized 16-bin byte
    histogram per payload — the shape of any embedding-over-media stage
    (decode → tensor → pooled vector), with a deterministic kernel."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            feats = []
            for b in pdf["payload"]:
                if b is None or len(b) == 0:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype("float64")
                feats.append((hist / hist.sum()).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, frame_size: int = 64, stride: int = 256) -> DataFrame:
    """Frame sampling for 'video' payloads: every ``stride``-th window of
    ``frame_size`` bytes becomes one frame row (posexplode of JVM-side
    byte slicing — no Python in this path)."""
    video = media.filter(F.col("media_type") == "video/mp4")
    n_frames = F.greatest(
        F.floor(F.length("payload") / stride).cast("int"), F.lit(1)
    )
    idx = F.sequence(F.lit(0), n_frames - 1)
    frames = F.transform(
        idx, lambda i: F.substring(F.col("payload"), i * stride + 1, frame_size)
    )
    return video.select(
        "doc_id", F.posexplode(frames).alias("frame_idx", "frame_bytes")
    ).withColumn("frame_len", F.length("frame_bytes"))


# ---------------------------------------------------------------------------
# Real audio DSP over the genuine WAV payloads (no stub, no external
# libs): decode PCM16 samples and compute the classic clip descriptors —
# RMS energy, zero-crossing rate, peak amplitude, and max frame energy
# over fixed windows. Deterministic payloads make every float
# SQL-reproducible, so the whole decode→DSP path is oracle-checkable.
# ---------------------------------------------------------------------------
AUDIO_FRAME = 64  # samples per analysis frame (8 ms @ 8 kHz)
AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, n_samples bigint, rms double, zcr double, "
    "peak bigint, max_frame_rms double"
)


def decode_wav_samples(b: bytes):
    """The PCM16 sample vector of a WAV payload as an int64 numpy array
    (same RIFF chunk walk as :func:`decode_wav`)."""
    import struct

    import numpy as np

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    off = 12
    while off + 8 <= len(b):
        cid = b[off:off + 4]
        (clen,) = struct.unpack_from("<I", b, off + 4)
        if cid == b"data":
            return np.frombuffer(
                b, dtype="<i2", count=clen // 2, offset=off + 8
            ).astype(np.int64)
        off += 8 + clen + (clen & 1)
    raise ValueError("WAV missing data chunk")


def audio_frame_features(media: DataFrame, frame: int = AUDIO_FRAME) -> DataFrame:
    """Per-clip audio descriptors from REAL decode (audio/wav payloads
    only): sample count, RMS (√(Σs²/n)), zero-crossing rate (strict
    sign flips / (n-1); zeros break runs conservatively — the integer
    comparison both engines decide identically), peak |amplitude|, and
    the loudest ``frame``-sample window's RMS (0.0 for clips shorter
    than one frame). Arrow-batched mapInPandas; the int64 square sums
    are exact, so Spark and the SQL twin agree to float round-off."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = decode_wav_samples(bytes(payload))
                n = len(s)
                rms = round(float(np.sqrt((s * s).sum() / n)), 6)
                # n > 1 guard: a structurally valid single-sample WAV has
                # no adjacent pairs — define zcr as 0.0 (the same
                # short-input convention as max_frame_rms) instead of 0/0
                zcr = (
                    round(float((s[1:] * s[:-1] < 0).sum() / (n - 1)), 6)
                    if n > 1
                    else 0.0
                )
                peak = int(np.abs(s).max())
                f = n // frame
                if f > 0:
                    fr = s[: f * frame].reshape(f, frame)
                    mfr = round(
                        float(np.sqrt((fr * fr).sum(axis=1) / frame).max()), 6
                    )
                else:
                    mfr = 0.0
                rows.append((did, n, rms, zcr, peak, mfr))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "rms", "zcr", "peak",
                         "max_frame_rms"],
            )

    return media.filter(F.col("media_type") == "audio/wav").mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
    )


# ---------------------------------------------------------------------------
# Real image statistics over the genuine BMP payloads — the image
# sibling of audio_frame_features: decode pixel bytes and compute
# brightness and horizontal-gradient descriptors, all integer-exact.
# ---------------------------------------------------------------------------
IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, n_px_bytes bigint, "
    "mean_byte double, max_byte bigint, grad_energy bigint"
)


def decode_bmp_pixels(b: bytes):
    """The un-padded pixel byte matrix (h × w·3 uint8 → int64 numpy)
    of a 24bpp BMP — same header walk as :func:`decode_bmp`."""
    import struct

    import numpy as np

    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(b, dtype=np.uint8, count=row_size * abs(h), offset=off)
    return rows.reshape(abs(h), row_size)[:, : w * 3].astype(np.int64)


# ---------------------------------------------------------------------------
# Perceptual image near-dup: dHash over decoded BMP pixels + Hamming
# band-buckets — the image column's entry into the dedup family
# (VERDICT r6 next-round #2). The kernel is pure integer arithmetic
# (channel-sum luma, 9×8 nearest-neighbor grid, adjacent-column
# comparisons), so the DuckDB twin recomputes every band bit-for-bit
# from the closed-form fixture payloads, like image_feature_stats.
#
# Geometry: 64 bits packed as 4×16-bit BANDS. The bands double as the
# LSH keys (pigeonhole: ≤3 flipped bits leave ≥1 of 4 bands intact, so
# candidate recall at IMAGE_HAMMING_MAX=3 is exactly 1.0 — unlike
# MinHash banding, no probabilistic miss). Band buckets get the same
# MAX_BUCKET + representative-star treatment as LSH buckets: identical-
# image cliques (distance 0 — re-crawls) would otherwise expand
# quadratically.
# ---------------------------------------------------------------------------
IMAGE_DHASH_SCHEMA = "img_id bigint, b0 int, b1 int, b2 int, b3 int"
DHASH_GRID_W = 8   # bits per row (9 sampled columns)
DHASH_GRID_H = 8


def attach_encoded_images_with_variants(docs: DataFrame, shift: int) -> DataFrame:
    """Fixture adapter for the image near-dup family: every even doc_id
    becomes TWO genuine BMPs — the original (img_id = doc_id) and a
    re-encoded copy with all pixel bytes shifted by ``shift`` mod 256
    (img_id = doc_id + 100000), the classic brightness-tweaked re-crawl.
    dHash compares ADJACENT luma values, so the copy's bits differ only
    where the +shift wraps past 255 — a small, content-dependent Hamming
    distance, exactly the near-miss class the operator exists for."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for s in pdf["doc_id"].astype("int64"):
                rows.append((int(s), encode_bmp(int(s)), "image/bmp"))
                rows.append(
                    (int(s) + 100000, encode_bmp(int(s), shift=shift), "image/bmp")
                )
            yield pd.DataFrame(rows, columns=["img_id", "payload", "media_type"])

    return docs.select("doc_id").mapInPandas(
        batches, schema="img_id bigint, payload binary, media_type string"
    )


def image_dhash(media: DataFrame) -> DataFrame:
    """64-bit dHash per BMP payload, packed as 4×16-bit bands.

    Kernel (vectorized numpy per Arrow batch): luma = sum of the 3
    channel bytes per pixel; sample a 9×8 nearest-neighbor grid
    (gx = x·w//9, gy = y·h//8 — integer division, so both engines pick
    identical pixels); bit(y,x) = luma[gy(y)][gx(x+1)] > luma[gy(y)][gx(x)];
    band b = Σ_{i<16} bit(16b+i)·2^i."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for iid, payload in zip(pdf["img_id"], pdf["payload"]):
                px = decode_bmp_pixels(bytes(payload))  # h × w·3
                h, w3 = px.shape
                w = w3 // 3
                luma = px.reshape(h, w, 3).sum(axis=2)
                gx = [x * w // (DHASH_GRID_W + 1) for x in range(DHASH_GRID_W + 1)]
                gy = [y * h // DHASH_GRID_H for y in range(DHASH_GRID_H)]
                sampled = luma[np.ix_(gy, gx)]  # 8 × 9
                bits = (sampled[:, 1:] > sampled[:, :-1]).astype(np.int64).reshape(-1)
                weights = (1 << np.arange(16, dtype=np.int64))
                bands = (bits.reshape(4, 16) * weights).sum(axis=1)
                rows.append((int(iid), *(int(b) for b in bands)))
            yield pd.DataFrame(rows, columns=["img_id", "b0", "b1", "b2", "b3"])

    return media.filter(F.col("media_type") == "image/bmp").mapInPandas(
        batches, schema=IMAGE_DHASH_SCHEMA
    )


def image_neardup_pairs_from_hashes(
    hashes: DataFrame, hamming_max: int, max_bucket: int
) -> DataFrame:
    """(d1, d2, hamming) for image pairs within ``hamming_max`` of each
    other, from a ``(img_id, b0..b3)`` dHash frame.

    Scale shape (round 11 — the sf100 probe's finding): identical
    signatures are collapsed FIRST (one narrow window over the 4 band
    ints, min-id member is the clique's representative), banding / caps
    / stars / popcount verification run over DISTINCT signatures only,
    and the output is the CONNECTIVITY-PRESERVING edge set: member ↔
    clique-rep stars (hamming 0) plus one verified rep ↔ rep edge per
    signature pair. Exact-duplicate mass is 30-80% of a web-scale crawl
    (and 99% of the 100x clone probe corpus, where the pre-collapse
    operator generated 89M star candidates and spilled 28 GB to emit a
    star-capped SUBSET that could leave members pairless); collapsed,
    it verifies ~25k signature pairs, no member is ever pairless, and
    buckets crowd only with DISTINCT near-miss signatures — which also
    lifts the r10 density sweep's residual loss.

    Under-cap (distinct-sig) buckets expand in-bucket pairs, over-cap
    buckets emit member×representative stars
    (operators/skew.rep_star_pairs — the identical geometry and
    md5-ordered selection as the MinHash family). Verification joins
    candidates back to the NARROW signature table (4 ints/sig) and
    computes the exact popcount distance. No pixel bytes ever shuffle."""
    from bigdata_processing_spark.operators.skew import rep_star_pairs
    from pyspark.sql import Window

    # NULL bands would collapse every null-band row into ONE "signature"
    # clique and declare unrelated images exact duplicates (the
    # pre-collapse code dropped null-band pairs at the hamming filter
    # instead). No current producer emits nulls, but this is a public
    # operator over arbitrary (img_id, b0..b3) frames — drop them here,
    # mirrored in the SQL twin (queries/multimodal._sql_hamming_pairs_tail).
    sigw = Window.partitionBy("b0", "b1", "b2", "b3")
    nonnull = hashes.filter(
        F.col("b0").isNotNull() & F.col("b1").isNotNull()
        & F.col("b2").isNotNull() & F.col("b3").isNotNull()
    )
    # localCheckpoint, not persist (round 12, guide §2.4/§5): the
    # collapsed frame is re-embedded in SIX downstream branches (ds ×4
    # via the band legs, intra, and the verify legs), and with the full
    # signature subtree (64 bit-sum aggs + band projections) behind it,
    # every AQE stage re-optimization re-walked that tree — the r12
    # stage probe measured 55 stages and 9.2 s for one sf0.1 simhash run
    # with the data itself computing in 0.5 s. Truncating lineage here
    # (same blocks the persist already paid for) plus the single-pass
    # band explode below cut it to 2.7 s, output bit-identical. Blocks
    # are freed by the ContextCleaner when the result frame is dropped
    # (same discipline as operators/graph.py's star rounds); on a
    # multi-executor cluster this trades executor-loss recovery of ONE
    # narrow frame (5 ints/row) for plan-size control — the documented
    # localCheckpoint trade.
    m = nonnull.withColumn("sig_id", F.min("img_id").over(sigw)).localCheckpoint(
        eager=True
    )
    n_imgs = m.count()
    # distinct signatures, keyed by their min-id representative member
    ds = m.filter(F.col("img_id") == F.col("sig_id")).drop("sig_id")
    # ONE pass over ds: explode the 4 band keys per row instead of a
    # 4-leg unionByName (which planned 4 separate reads of the frame and
    # 128-partition union stages — same rows, same keys, 4× the tasks)
    bandl = ds.select(
        "img_id",
        F.explode(F.array(*[
            F.concat_ws("_", F.lit(b), F.col(f"b{b}").cast("string"))
            for b in range(4)
        ])).alias("bk"),
    )
    # member-array groupBy GATED to under-cap buckets (size agg first,
    # arrays ≤ max_bucket elements); stars take the flat band table —
    # rank-selected reps, O(1) per-row memory (round 8, no hot-bucket
    # array rows)
    bsz0 = bandl.groupBy("bk").agg(F.count("*").alias("__n"))
    under_bk = bsz0.filter(
        (F.col("__n") > 1) & (F.col("__n") <= max_bucket)
    ).select("bk")
    members = bandl.join(under_bk, "bk").groupBy("bk").agg(
        F.array_sort(F.collect_set("img_id")).alias("ds")
    )
    pair_arr = F.flatten(
        F.transform(
            "ds",
            lambda x, i: F.transform(
                F.slice("ds", i + 2, F.greatest(F.size("ds") - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("d1"), y.alias("d2")),
            ),
        )
    )
    under = (
        members.filter(F.size("ds") > 1)
        .select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.d1").alias("d1"), F.col("p.d2").alias("d2"))
    )
    cand = under.unionByName(
        rep_star_pairs(bandl, max_bucket, id_col="img_id", sizes=bsz0)
    ).distinct()

    a = ds.select(F.col("img_id").alias("d1"),
                  *[F.col(f"b{i}").alias(f"x{i}") for i in range(4)])
    b2 = ds.select(F.col("img_id").alias("d2"),
                   *[F.col(f"b{i}").alias(f"y{i}") for i in range(4)])
    # Regime switch with a CONSERVATIVE in-JVM estimate: the verify join
    # broadcasts BOTH sides, and a broadcast hash relation costs far
    # more than the 40 raw bytes/row (row objects + the hash map +
    # duplication across the build) — the 64 B/row first cut OOM'd an
    # 8 GB single JVM at 500k hashes (measured, round 7). 2 KB/row keeps
    # the pair of broadcasts comfortably inside the same 512 MB budget
    # the dedup family uses (≈ 130k hashes); beyond that both legs take
    # explicit merge joins keyed by id — narrow-table shuffles.
    if n_imgs * 2048 * 2 <= 512 << 20:
        a, b2 = F.broadcast(a), F.broadcast(b2)
    else:
        a, b2 = a.hint("merge"), b2.hint("merge")
    hamming = None
    for i in range(4):
        term = F.bit_count(F.col(f"x{i}").bitwiseXOR(F.col(f"y{i}")))
        hamming = term if hamming is None else hamming + term
    # verified DISTINCT-signature pairs: candidate-bounded
    rp = (
        cand.join(a, "d1").join(b2, "d2")
        .select("d1", "d2", hamming.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= hamming_max)
    )
    # Connectivity-preserving expansion: within a clique, member ↔
    # clique-representative stars (B−1 edges of hamming 0 — the rep is
    # the min id, so d1 < d2 holds); across cliques, the ONE verified
    # rep ↔ rep edge per signature pair. Every emitted edge is a true
    # near-dup pair, and the connected components equal the FULL
    # true-pair graph's (any true pair (x∈A, y∈B) rides
    # x–rep(A)–rep(B)–y), so downstream clustering is exact while the
    # output stays linear in corpus + signature pairs. A 100-clone
    # clique of a 40-doc exact family is 4,000 members = 7,998,000 true
    # pairs; the star set is 3,999 edges with identical components —
    # the sf100 probe measured 389M true pairs on the clone corpus,
    # which no pair materialization should ever emit.
    intra = m.filter(F.col("img_id") != F.col("sig_id")).select(
        F.col("sig_id").alias("d1"),
        F.col("img_id").alias("d2"),
        F.lit(0).cast("bigint").alias("hamming"),
    )
    return intra.unionByName(rp)


def image_pixel_features(media: DataFrame) -> DataFrame:
    """Per-image descriptors from REAL decode (image/bmp payloads only):
    dimensions, mean/max pixel byte, and horizontal gradient energy
    (Σ|p[x+1 px] − p[x]| within rows, per channel) — the
    brightness/edge screens an image curation pipeline runs before
    anything learned. Integer sums are exact, so the SQL twin re-derives
    every value from the closed-form payload arithmetic."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_bmp_pixels(bytes(payload))
                h, w3 = px.shape
                grad = int(np.abs(px[:, 3:] - px[:, :-3]).sum())
                rows.append((
                    did, w3 // 3, h, h * w3,
                    round(float(px.mean()), 6), int(px.max()), grad,
                ))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_px_bytes",
                         "mean_byte", "max_byte", "grad_energy"],
            )

    return media.filter(F.col("media_type") == "image/bmp").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )
