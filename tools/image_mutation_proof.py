#!/usr/bin/env python
"""Mutated-image near-dup proof (r8/r9 verdict carry-over: "no
mutated-image variant of the 100k BMP proof").

The 100k image_scale_proof exercises the IDENTICAL-hash regime (hot
dims-class buckets, rep-star caps); pairs at Hamming 1-3 between
NON-identical hashes were only exercised at fixture scale. This proof
plants exactly that class with EXACT truth:

- every base image's 64-bit dHash is PRESCRIBED (the 9 sampled luma
  columns of each of the 8 sampled rows are overwritten so the
  adjacent-luma comparisons spell an md5-derived pseudo-random hash) —
  hashes are unique per base, so no identical-hash cliques and no
  rep-star sampling loss muddies the truth;
- per 10-image decade, ids 10m+7/8/9 are the SAME pixels as base 10m
  with 1/2/3 prescribed dHash bits flipped (distinct rows of the x=7
  comparison column, each feeding exactly one bit) — the planted truth
  is all 6 intra-decade pairs at Hamming {1,2,3,1,2,1}.

The banded pipeline (4x16-bit bands, pigeonhole-complete at
IMAGE_HAMMING_MAX=3) must then surface the truth set with recall 1.0
and precision 1.0 (any extra pair would be a cross-decade 64-bit
near-collision). Measures wall/shuffle/spill per stage.

Run: ``python tools/image_mutation_proof.py [N]`` (default 100_000).
JSON lines; numbers land in BASELINE.md ("mutated-image proof").
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_processing_spark.session import get_spark  # noqa: E402
from tools.sf1_dedup_proof import shuffle_spill_mb  # noqa: E402

# one flipped dHash bit per variant level, all in the x=7 comparison
# column (bit index y*8+7): pixel gx[8] of sampled row y feeds ONLY
# bit (y,7), so flips are independent
FLIP_ROWS = {7: [0], 8: [0, 1], 9: [0, 1, 2]}


def prescribed_hash(base_id: int) -> int:
    """Deterministic pseudo-random 64-bit dHash for a base image."""
    return int.from_bytes(
        hashlib.md5(f"imghash|{base_id}".encode()).digest()[:8], "big"
    )


def truth_hash(img_id: int) -> int:
    """The dHash this proof writes into image ``img_id``."""
    d = img_id % 10
    base = img_id - d if d >= 7 else img_id
    h = prescribed_hash(base)
    for y in FLIP_ROWS.get(d, []):
        h ^= 1 << (y * 8 + 7)
    return h


def write_hash_into_bmp(payload: bytes, bits64: int) -> bytes:
    """Overwrite the 9x8 sampled luma grid of a 24bpp BMP so its dHash
    equals ``bits64`` exactly (bit (y,x) = 1 iff luma rises from sampled
    column x to x+1; we write a popcount-prefix staircase per row)."""
    import struct

    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    row_size = (w * 3 + 3) & ~3
    buf = bytearray(payload)
    gx = [x * w // 9 for x in range(9)]
    gy = [y * h // 8 for y in range(8)]
    for y in range(8):
        level = 100
        row_off = off + gy[y] * row_size
        for x in range(9):
            if x > 0:
                bit = (bits64 >> (y * 8 + (x - 1))) & 1
                level += 1 if bit else 0
                if not bit:
                    level -= 1 if level > 0 else 0  # strictly non-rising
            p = row_off + gx[x] * 3
            buf[p] = buf[p + 1] = buf[p + 2] = level
    return bytes(buf)


def synth(spark, n: int):
    from typing import Iterator

    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bigdata_processing_spark.operators.multimodal import encode_bmp

        for pdf in it:
            rows = []
            for i in pdf["id"].astype("int64"):
                i = int(i)
                d = i % 10
                base = i - d if d >= 7 else i
                # seed 8+48·base pins every image to the 9x9 dims
                # class: the 9 sampled columns/8 rows are then DISTINCT
                # pixels (the fixture generator's 1..16 x 1..12 dims
                # would alias grid points and break hash prescription)
                payload = write_hash_into_bmp(
                    encode_bmp(8 + 48 * base), truth_hash(i)
                )
                rows.append((i, payload, "image/bmp"))
            yield pd.DataFrame(rows, columns=["img_id", "payload", "media_type"])

    return spark.range(0, n, 1, 32).mapInPandas(
        batches, schema="img_id bigint, payload binary, media_type string"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("image-mutation-proof")
    spark.sparkContext.setLogLevel("ERROR")

    from bigdata_processing_spark.operators.multimodal import (
        image_dhash,
        image_neardup_pairs_from_hashes,
    )
    from bigdata_processing_spark.thresholds import (
        IMAGE_HAMMING_MAX,
        MAX_BUCKET,
    )

    media = synth(spark, n)

    # stage 1: hash
    sw0, sp0 = shuffle_spill_mb(spark.sparkContext)
    t0 = time.monotonic()
    hashes = image_dhash(media).persist()
    n_hashed = hashes.count()
    t_hash = round(time.monotonic() - t0, 2)

    # self-check: the written grids spell the prescribed hashes
    probe = {r.img_id: (r.b0, r.b1, r.b2, r.b3)
             for r in hashes.filter(F.col("img_id") < 20).collect()}
    for i, bands in probe.items():
        want = truth_hash(i)
        got = sum(b << (16 * k) for k, b in enumerate(bands))
        assert got == want, (i, hex(got), hex(want))

    # stage 2: banded Hamming pairs
    t0 = time.monotonic()
    pairs = image_neardup_pairs_from_hashes(
        hashes, IMAGE_HAMMING_MAX, MAX_BUCKET
    ).persist()
    n_pairs = pairs.count()
    t_pairs = round(time.monotonic() - t0, 2)
    sw1, sp1 = shuffle_spill_mb(spark.sparkContext)

    # truth: all intra-decade pairs, Hamming {base-v: k, v-v: |k-l|}
    truth = []
    for m in range(0, n - 9, 10):
        ids = [m, m + 7, m + 8, m + 9]
        ks = {m: 0, m + 7: 1, m + 8: 2, m + 9: 3}
        for a in range(4):
            for b in range(a + 1, 4):
                truth.append(
                    (ids[a], ids[b], abs(ks[ids[b]] - ks[ids[a]]))
                )
    tdf = spark.createDataFrame(truth, "d1 bigint, d2 bigint, want_h int")
    joined = tdf.join(pairs, ["d1", "d2"], "left").persist()
    by_h = {
        int(r.want_h): (int(r.n), int(r.found))
        for r in joined.groupBy("want_h").agg(
            F.count("*").alias("n"),
            F.count("hamming").alias("found"),
        ).collect()
    }
    n_truth = len(truth)
    n_found = sum(f for _, f in by_h.values())
    # emitted distances must MATCH the planted ones exactly
    mismatch = joined.filter(
        F.col("hamming").isNotNull() & (F.col("hamming") != F.col("want_h"))
    ).count()

    print(json.dumps({
        "n_images": n, "hashed": n_hashed,
        "sec_hash": t_hash, "sec_pairs": t_pairs,
        "emitted_pairs": n_pairs, "truth_pairs": n_truth,
        "recall": round(n_found / n_truth, 6),
        "precision": round(n_found / n_pairs, 6) if n_pairs else None,
        "hamming_mismatches": mismatch,
        "per_hamming": {str(h): {"truth": t, "found": f}
                        for h, (t, f) in sorted(by_h.items())},
        "shuffle_mb": round(sw1 - sw0, 1),
        "spill_mb": round(sp1 - sp0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
