"""Multimodal-column queries (operators/multimodal.py pipelines).

``multimodal_decode_stats`` and ``multimodal_feature_sample`` run
through Arrow-batched mapInPandas — genuinely non-SQL-expressible, so
they carry no oracle (the driver records the weaker rows-only check, as
the contract allows). ``multimodal_frame_stats`` stays JVM-side and IS
oracle-checked via byte-length arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.operators.multimodal import (
    attach_media,
    decode_media,
    extract_features,
    sample_frames,
)
from bigdata_processing_spark.queries import register


@register("multimodal_decode_stats")  # no oracle: mapInPandas decode path
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_media(attach_media(docs), decode_stub=True)
    return (
        decoded.groupBy("media_type")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("checksum").alias("total_checksum"),
            F.avg("width").alias("avg_width"),
            F.avg("height").alias("avg_height"),
        )
        .orderBy("media_type")
    )


@register("multimodal_feature_sample")  # no oracle: pandas feature kernel
def multimodal_feature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    feats = extract_features(attach_media(docs))
    return feats.select(
        "doc_id",
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 6).alias("l1_mass"),
        F.size("feature").alias("dim"),
    ).orderBy("doc_id")


@register(
    "multimodal_frame_stats",
    oracle="""
        WITH v AS (
            SELECT doc_id, length(text) AS nb
            FROM documents WHERE doc_id % 3 = 2
        ), f AS (
            SELECT doc_id, nb,
                   unnest(range(0, greatest(floor(nb / 256.0)::INT, 1))) AS frame_idx
            FROM v
        )
        SELECT doc_id, frame_idx::INT AS frame_idx,
               least(64, greatest(nb - frame_idx * 256, 0))::INT AS frame_len
        FROM f
        ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling stays JVM-side (substring over binary), so it is
    exactly SQL-expressible — the text payload is ASCII, so byte offsets
    equal char offsets in the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_media(docs), frame_size=64, stride=256)
    return frames.select("doc_id", "frame_idx", "frame_len").orderBy("doc_id", "frame_idx")
