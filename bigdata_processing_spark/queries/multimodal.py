"""Multimodal-column queries (operators/multimodal.py pipelines).

``multimodal_decode_stats`` and ``multimodal_feature_sample`` run
through Arrow-batched mapInPandas on the Spark side — the real
production plumbing — while their *stub* kernels are deterministic
byte arithmetic, so each carries a DuckDB oracle that recomputes the
kernel in SQL (the payload is the ASCII text's utf-8 bytes, so
``ord(char) == byte``). When a real codec replaces the stub the oracle
is dropped and the query reverts to the rows-only contract.
``multimodal_frame_stats`` stays JVM-side and is likewise
oracle-checked via byte-length arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_processing_spark import thresholds as _TH
from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.operators.multimodal import (
    attach_media,
    decode_media,
    extract_features,
    sample_frames,
)
from bigdata_processing_spark.queries import register


@register(
    "multimodal_decode_stats",
    oracle="""
        WITH m AS (
            SELECT doc_id,
                   CASE doc_id % 3
                       WHEN 0 THEN 'image/png'
                       WHEN 1 THEN 'audio/wav'
                       ELSE 'video/mp4'
                   END AS media_type,
                   length(text) AS n,
                   coalesce(list_aggregate(
                       list_transform(range(1, length(text) + 1),
                                      i -> ord(substr(text, i, 1))), 'sum'), 0) AS checksum
            FROM documents
        )
        SELECT media_type,
               count(*) AS n_media,
               CAST(sum(n) AS BIGINT) AS total_bytes,
               CAST(sum(checksum) AS BIGINT) AS total_checksum,
               avg(n % 640 + 1) AS avg_width,
               avg(n % 480 + 1) AS avg_height
        FROM m
        GROUP BY media_type
        ORDER BY media_type
    """,
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-and-summarize over the mapInPandas decode path. The Spark
    side runs the full Arrow-batched pipeline (attach → decode →
    aggregate); the oracle recomputes the deterministic stub kernel
    (dims from byte length, checksum = byte sum) in SQL."""
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


@register(
    "multimodal_feature_sample",
    oracle="""
        WITH b AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, length(text) + 1),
                                         i -> ord(substr(text, i, 1)) // 16)) AS bin
            FROM documents WHERE doc_id < 10 AND length(text) > 0
        ),
        c AS (SELECT doc_id, bin, count(*) AS n FROM b GROUP BY doc_id, bin),
        t AS (SELECT doc_id, sum(n) AS total FROM c GROUP BY doc_id)
        SELECT doc_id,
               CAST(16 AS BIGINT) AS dim,
               CAST(bin AS BIGINT) AS top_bin,
               n::DOUBLE / total::DOUBLE AS top_share
        FROM (
            SELECT c.doc_id, c.bin, c.n, t.total,
                   row_number() OVER (PARTITION BY c.doc_id
                                      ORDER BY c.n DESC, c.bin ASC) AS rn
            FROM c JOIN t ON c.doc_id = t.doc_id
        )
        WHERE rn = 1
        ORDER BY doc_id
    """,
)
def multimodal_feature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the Arrow-batched pandas kernel
    (16-bin high-nibble byte histogram, L1-normalized), summarized to the
    dominant bin and its share. The oracle recomputes the histogram from
    raw bytes in SQL, checking the kernel's actual values — the argmax is
    discrete (ties → lowest bin, matching ``array_position``'s
    first-match) and the share division is the same two exact integers
    in both engines."""
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 10) & (F.length("text") > 0)
    )
    feats = extract_features(attach_media(docs))
    return (
        feats.select(
            "doc_id",
            F.size("feature").cast("long").alias("dim"),
            (F.expr("array_position(feature, array_max(feature))") - 1)
            .cast("long")
            .alias("top_bin"),
            F.array_max("feature").alias("top_share"),
        )
        .orderBy("doc_id")
    )


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


@register(
    "multimodal_real_codec",
    oracle="""
        WITH ks AS (SELECT range AS k FROM range(1024)),
        m AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'image/bmp'
                        ELSE 'audio/wav' END AS media_type,
                   doc_id % 16 + 1 AS w,
                   doc_id % 12 + 1 AS h,
                   doc_id % 256 + 16 AS ns
            FROM documents WHERE doc_id < 120
        ),
        img AS (
            SELECT m.doc_id, m.media_type,
                   CAST(m.w AS BIGINT) AS width, CAST(m.h AS BIGINT) AS height,
                   CAST(54 + (((m.w * 3 + 3) // 4) * 4) * m.h AS BIGINT) AS n_bytes,
                   CAST(sum((m.doc_id * 7 + ks.k * 13) % 256) AS BIGINT) AS checksum
            FROM m JOIN ks ON ks.k < m.w * m.h * 3
            WHERE m.media_type = 'image/bmp'
            GROUP BY m.doc_id, m.media_type, m.w, m.h
        ),
        aud AS (
            SELECT m.doc_id, m.media_type,
                   CAST(m.ns AS BIGINT) AS width, CAST(1 AS BIGINT) AS height,
                   CAST(44 + 2 * m.ns AS BIGINT) AS n_bytes,
                   CAST(sum((m.doc_id * 31 + ks.k * 17) % 65536 - 32768) AS BIGINT) AS checksum
            FROM m JOIN ks ON ks.k < m.ns
            WHERE m.media_type = 'audio/wav'
            GROUP BY m.doc_id, m.media_type, m.ns
        )
        SELECT * FROM img UNION ALL SELECT * FROM aud
        ORDER BY doc_id
    """,
)
def multimodal_real_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL (non-stub) codec roundtrip: encode genuine BMP/WAV files in
    one mapInPandas stage, parse them back with the lib-free decoders in
    another (``decode_stub=False``). Payload content is deterministic in
    doc_id, so the oracle reproduces every decoded stat — dimensions,
    file size, pixel/sample checksum — by SQL arithmetic alone, making
    the full byte-level encode→decode path driver-hash-verifiable."""
    from bigdata_processing_spark.operators.multimodal import attach_encoded_media

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    decoded = decode_media(attach_encoded_media(docs), decode_stub=False)
    return decoded.select(
        "doc_id",
        "media_type",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "checksum",
    ).orderBy("doc_id")


@register(
    "audio_feature_stats",
    oracle="""
        WITH m AS (
            SELECT doc_id, doc_id % 256 + 16 AS ns
            FROM documents WHERE doc_id % 2 = 1 AND doc_id < 120
        ),
        ks AS (SELECT range AS k FROM range(272)),
        samp AS (
            SELECT m.doc_id, ks.k,
                   ((m.doc_id * 31 + ks.k * 17) % 65536 - 32768) AS s,
                   m.ns
            FROM m JOIN ks ON ks.k < m.ns
        ),
        lagd AS (
            SELECT doc_id, k, s, ns,
                   lag(s) OVER (PARTITION BY doc_id ORDER BY k) AS sp
            FROM samp
        ),
        clip AS (
            SELECT doc_id,
                   CAST(max(ns) AS BIGINT) AS n_samples,
                   round(sqrt(sum(s * s)::DOUBLE / max(ns)), 6) AS rms,
                   round(sum(CASE WHEN sp IS NOT NULL AND s * sp < 0
                                  THEN 1 ELSE 0 END)::DOUBLE / (max(ns) - 1), 6)
                       AS zcr,
                   CAST(max(abs(s)) AS BIGINT) AS peak
            FROM lagd GROUP BY doc_id
        ),
        fr AS (
            SELECT doc_id, k // 64 AS fidx,
                   sqrt(sum(s * s)::DOUBLE / 64) AS frms
            FROM samp WHERE k < (ns // 64) * 64
            GROUP BY doc_id, k // 64
        ),
        fmax AS (
            SELECT doc_id, round(max(frms), 6) AS max_frame_rms
            FROM fr GROUP BY doc_id
        )
        SELECT c.doc_id AS doc_id, n_samples, rms, zcr, peak,
               coalesce(f.max_frame_rms, 0.0) AS max_frame_rms
        FROM clip c LEFT JOIN fmax f ON c.doc_id = f.doc_id
        ORDER BY doc_id
    """,
)
def audio_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio DSP over genuine WAV files: encode (valid RIFF/PCM16),
    decode the sample vectors back, and compute RMS energy,
    zero-crossing rate, peak amplitude, and loudest-64-sample-frame RMS
    per clip — the feature-extraction stage of an audio data pipeline,
    lib-free and end-to-end. Payload samples are closed-form in doc_id,
    so the oracle re-derives every float by SQL arithmetic alone (the
    int64 square sums are exact in both engines; floats agree to
    round-off)."""
    from bigdata_processing_spark.operators.multimodal import (
        attach_encoded_media,
        audio_frame_features,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 120) & (F.col("doc_id") % 2 == 1)
    )
    feats = audio_frame_features(attach_encoded_media(docs))
    return feats.orderBy("doc_id")


@register(
    "image_feature_stats",
    oracle="""
        WITH m AS (
            SELECT doc_id, doc_id % 16 + 1 AS w, doc_id % 12 + 1 AS h
            FROM documents WHERE doc_id % 2 = 0 AND doc_id < 120
        ),
        ks AS (SELECT range AS k FROM range(576)),
        px AS (
            SELECT m.doc_id, ks.k, (m.doc_id * 7 + ks.k * 13) % 256 AS p,
                   m.w, m.h
            FROM m JOIN ks ON ks.k < m.w * m.h * 3
        ),
        clip AS (
            SELECT doc_id,
                   CAST(max(w) AS BIGINT) AS width,
                   CAST(max(h) AS BIGINT) AS height,
                   count(*) AS n_px_bytes,
                   round(avg(p), 6) AS mean_byte,
                   CAST(max(p) AS BIGINT) AS max_byte
            FROM px GROUP BY doc_id
        ),
        grad AS (
            SELECT doc_id,
                   CAST(sum(abs(((doc_id * 7 + (k + 3) * 13) % 256) - p))
                        AS BIGINT) AS grad_energy
            FROM px
            WHERE (k % (w * 3)) < w * 3 - 3
            GROUP BY doc_id
        )
        SELECT c.doc_id AS doc_id, width, height, n_px_bytes, mean_byte,
               max_byte, coalesce(g.grad_energy, 0) AS grad_energy
        FROM clip c LEFT JOIN grad g ON c.doc_id = g.doc_id
        ORDER BY doc_id
    """,
)
def image_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image statistics over genuine BMP files: encode, decode the
    un-padded pixel matrix back, and compute brightness (mean/max byte)
    and horizontal gradient energy per image — the pre-learned screens
    of an image curation pipeline, lib-free end-to-end, every value
    re-derived by the oracle from the closed-form pixel arithmetic."""
    from bigdata_processing_spark.operators.multimodal import (
        attach_encoded_media,
        image_pixel_features,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 120) & (F.col("doc_id") % 2 == 0)
    )
    return image_pixel_features(attach_encoded_media(docs)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Perceptual image near-dup (round 7): dHash over REAL decoded BMPs +
# Hamming band-buckets — the dedup family extended to image columns.
# The corpus is every even-doc_id fixture image PLUS a planted
# re-encoded copy (all pixel bytes + IMAGE_VARIANT_SHIFT mod 256,
# img_id = doc_id + 100000). The oracle recomputes the whole pipeline —
# luma, 9×8 nearest-neighbor grid, 64 dHash bits, 4×16-bit bands,
# capped band buckets with representative stars, popcount verify —
# from the closed-form pixel arithmetic, bit-for-bit.
# ---------------------------------------------------------------------------
def _sql_gray(ch: int) -> str:
    return f"(seed*7 + 13*(3*(gy*w + gx) + {ch}) + shift) % 256"


def _sql_img_bands(shift: int) -> str:
    return (
        f"""
        imgs AS (
            SELECT doc_id AS img_id, doc_id AS seed, 0 AS shift
            FROM documents WHERE doc_id % 2 = 0 AND doc_id < 120
            UNION ALL
            SELECT doc_id + 100000, doc_id, {shift}
            FROM documents WHERE doc_id % 2 = 0 AND doc_id < 120
        ),
        idims AS (
            SELECT img_id, seed, shift,
                   seed % 16 + 1 AS w, seed % 12 + 1 AS h
            FROM imgs
        ),
        ipts AS (
            SELECT d.img_id, d.seed, d.shift, d.w, d.h,
                   xs.range AS x, ys.range AS y,
                   (xs.range * d.w) // 9 AS gx, (ys.range * d.h) // 8 AS gy
            FROM idims d, range(9) xs, range(8) ys
        ),
        gval AS (
            SELECT img_id, x, y,
                   ({_sql_gray(0)} + {_sql_gray(1)} + {_sql_gray(2)}) AS g
            FROM ipts
        ),
        ibits AS (
            SELECT a.img_id, (a.y * 8 + a.x) AS j,
                   CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
            FROM gval a
            JOIN gval b ON a.img_id = b.img_id AND a.y = b.y AND b.x = a.x + 1
            WHERE a.x < 8
        ),
        ibands AS (
            SELECT img_id, """
    + ", ".join(
        f"CAST(sum(CASE WHEN j // 16 = {b} THEN bit * (1 << (j % 16)) "
        f"ELSE 0 END) AS INTEGER) AS b{b}"
        for b in range(4)
    )
    + """
            FROM ibits GROUP BY img_id
        )
"""
    )


def _sql_hamming_pairs_tail(hamming_max: int, max_bucket: int,
                            batch_pred: str = "") -> str:
    """CTE chain + final SELECT for Hamming band-pair mining over an
    ``ibands(img_id, b0..b3)`` CTE the CALLER defines — shared by the
    image dHash twins and the 64-bit SimHash twin (same 4×16-bit band
    geometry, same capped buckets + representative stars, same popcount
    verify). Round 11: identical signatures collapse to their min-id
    representative BEFORE banding, and the output is the
    connectivity-preserving edge set — member ↔ clique-rep stars
    (hamming 0) plus one verified rep ↔ rep edge per signature pair —
    the exact twin of the Spark operator's collapse
    (operators/multimodal.image_neardup_pairs_from_hashes).
    ``batch_pred`` filters the output rows (plain d1/d2)."""
    bandl = "\n            UNION ALL\n".join(
        f"            SELECT img_id, concat('{b}_', b{b}) AS bk FROM idsig"
        for b in range(4)
    )
    ham = " + ".join(f"bit_count(xor(x.b{i}, y.b{i}))" for i in range(4))
    return f""",
        isig AS (
            SELECT img_id, b0, b1, b2, b3,
                   min(img_id) OVER (PARTITION BY b0, b1, b2, b3) AS sig_id
            FROM ibands
            WHERE b0 IS NOT NULL AND b1 IS NOT NULL
              AND b2 IS NOT NULL AND b3 IS NOT NULL
        ),
        idsig AS (
            SELECT img_id, b0, b1, b2, b3 FROM isig WHERE img_id = sig_id
        ),
        ibandl AS (
{bandl}
        ),
        ibsz AS (SELECT bk, count(*) AS n FROM ibandl GROUP BY bk),
        ireps AS (
            SELECT bk, img_id FROM (
                SELECT a.bk, a.img_id, z.n,
                       row_number() OVER (
                           PARTITION BY a.bk
                           ORDER BY md5(CAST(a.img_id AS VARCHAR)), a.img_id
                       ) AS rn
                FROM ibandl a JOIN ibsz z ON a.bk = z.bk
                WHERE z.n > {max_bucket}
            ) WHERE rn <= least(CAST(ceil(n / CAST({max_bucket} AS DOUBLE)) AS BIGINT), {_TH.MAX_BUCKET_REPS})
        ),
        icand AS (
            SELECT DISTINCT d1, d2 FROM (
                SELECT a.img_id AS d1, b.img_id AS d2
                FROM ibandl a
                JOIN ibandl b ON a.bk = b.bk AND a.img_id < b.img_id
                JOIN ibsz ON a.bk = ibsz.bk
                WHERE ibsz.n <= {max_bucket}
                UNION ALL
                SELECT least(r.img_id, m.img_id) AS d1,
                       greatest(r.img_id, m.img_id) AS d2
                FROM ireps r
                JOIN ibandl m ON r.bk = m.bk AND r.img_id <> m.img_id
            )
        ),
        irp AS (
            SELECT c.d1, c.d2, ({ham})::BIGINT AS hamming
            FROM icand c
            JOIN idsig x ON c.d1 = x.img_id
            JOIN idsig y ON c.d2 = y.img_id
            WHERE {ham} <= {hamming_max}
        ),
        iallp AS (
            SELECT sig_id AS d1, img_id AS d2, CAST(0 AS BIGINT) AS hamming
            FROM isig WHERE img_id <> sig_id
            UNION ALL
            SELECT d1, d2, hamming FROM irp
        )
        SELECT d1, d2, hamming FROM iallp
        WHERE TRUE {batch_pred}
        ORDER BY d1, d2
    """


def _sql_image_neardup(shift: int, hamming_max: int, max_bucket: int,
                       batch_only: bool = False) -> str:
    batch_pred = (
        "AND (d1 >= 100000 OR d2 >= 100000)" if batch_only else ""
    )
    return (
        f"\n        WITH {_sql_img_bands(shift)}"
        + _sql_hamming_pairs_tail(hamming_max, max_bucket, batch_pred)
    )


@register(
    "image_neardup_pairs",
    oracle=_sql_image_neardup(
        _TH.IMAGE_VARIANT_SHIFT, _TH.IMAGE_HAMMING_MAX, _TH.MAX_BUCKET
    ),
)
def image_neardup_pairs(
    spark: SparkSession, sf_dir: str,
    hamming_max: int | None = None,
    max_bucket: int | None = None,
    variant_shift: int | None = None,
) -> DataFrame:
    """Image near-dup pairs (d1, d2, hamming) over the fixture images +
    their planted re-encoded copies: REAL BMP encode → decode → dHash →
    band-bucket LSH (capped, representative stars over hot buckets) →
    exact popcount verification. The hash table is 4 ints per image, so
    verification never shuffles pixel data; candidate recall at the
    default threshold is exactly 1.0 by pigeonhole (thresholds.py)."""
    from bigdata_processing_spark.operators.multimodal import (
        attach_encoded_images_with_variants,
        image_dhash,
        image_neardup_pairs_from_hashes,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 120) & (F.col("doc_id") % 2 == 0)
    )
    media = attach_encoded_images_with_variants(
        docs, shift=variant_shift if variant_shift is not None
        else _TH.IMAGE_VARIANT_SHIFT,
    )
    return image_neardup_pairs_from_hashes(
        image_dhash(media),
        hamming_max=hamming_max if hamming_max is not None
        else _TH.IMAGE_HAMMING_MAX,
        max_bucket=max_bucket if max_bucket is not None else _TH.MAX_BUCKET,
    ).orderBy("d1", "d2")


# ---------------------------------------------------------------------------
# Incremental image dedup, relational twin: the exact math of the disk
# probe (streaming/image_dedup.incremental_image_dup_pairs) with the
# originals as the INDEXED corpus and the planted re-encoded copies as
# the arriving batch. The probe's combined old+new bucket caps and
# combined-membership representative stars equal the batch operator's
# full-corpus caps/stars, so the incremental pair set is exactly the
# batch pair set restricted to batch-involving pairs — which is what
# this query (and its oracle) computes. tests/test_streaming_image.py
# pins the disk probe to this query row-for-row.
# ---------------------------------------------------------------------------
@register(
    "incremental_image_dedup_pairs",
    oracle=_sql_image_neardup(
        _TH.IMAGE_VARIANT_SHIFT, _TH.IMAGE_HAMMING_MAX, _TH.MAX_BUCKET,
        batch_only=True,
    ),
)
def incremental_image_dedup_pairs(
    spark: SparkSession, sf_dir: str,
    hamming_max: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Image near-dup pairs a batch arrival (the re-encoded copies,
    img_id ≥ 100000) surfaces against an index frozen on the originals
    — new×old AND new×new, never re-hashing indexed pixels in the disk
    operator this query twins."""
    from bigdata_processing_spark.operators.multimodal import (
        attach_encoded_images_with_variants,
        image_dhash,
        image_neardup_pairs_from_hashes,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 120) & (F.col("doc_id") % 2 == 0)
    )
    media = attach_encoded_images_with_variants(
        docs, shift=_TH.IMAGE_VARIANT_SHIFT
    )
    pairs = image_neardup_pairs_from_hashes(
        image_dhash(media),
        hamming_max=hamming_max if hamming_max is not None
        else _TH.IMAGE_HAMMING_MAX,
        max_bucket=max_bucket if max_bucket is not None else _TH.MAX_BUCKET,
    )
    return pairs.filter(
        (F.col("d1") >= 100000) | (F.col("d2") >= 100000)
    ).orderBy("d1", "d2")
