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


def decode_media(media: DataFrame, *, decode_stub: bool = True) -> DataFrame:
    """Decode payloads → dimensions/checksum via mapInPandas.

    ``decode_stub=True`` runs a deterministic fake decoder (dims derived
    from payload length, checksum = sum of bytes) so the full pipeline is
    testable without codecs. ``decode_stub=False`` is the real-codec slot:
    NotImplementedError until PIL/ffmpeg-class libs are provisioned.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires image/audio codecs not "
                    "present in this environment"
                )
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
