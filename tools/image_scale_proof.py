#!/usr/bin/env python
"""Image near-dup at scale (VERDICT r7 next-round #3).

The text dedup family has 100× proofs; the image family was
fixture-bound (60 images + planted copies). This generates ``N``
(default 100k) REAL synthetic BMPs — seeded content via
operators/multimodal.encode_bmp, every 10th image a shifted re-encode
of its predecessor (the near-miss class dHash exists for) — builds the
band-postings index over the first 90%, and runs the incremental probe
with the trailing 10% as the arriving batch.

Scale shape this exercises: the BMP generator's pixel pattern
(seed·7 + k·13) cancels the seed in ADJACENT-luma comparisons, so a
dim-class worth of images (~192 classes over 100k) shares ONE dHash —
the corpus is wall-to-wall identical-hash families, every band bucket
far over cap. That is precisely the boilerplate-band regime the
combined caps + rank-selected representative stars must keep linear:
uncapped, one 500-member bucket is 125k pairs and a class is quadratic.

Run: ``python tools/image_scale_proof.py [N]``. JSON lines; numbers
land in BASELINE.md ("image near-dup at scale").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_processing_spark.session import get_spark  # noqa: E402
from tools.sf1_dedup_proof import shuffle_spill_mb  # noqa: E402


def synth_media(spark, lo: int, hi: int):
    """(img_id, payload, media_type) for ids in [lo, hi): real BMPs;
    ids ≡ 9 (mod 10) re-encode their predecessor's content with a +8
    pixel shift (a planted near-miss copy)."""
    from typing import Iterator

    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bigdata_processing_spark.operators.multimodal import encode_bmp

        for pdf in it:
            ids = pdf["id"].astype("int64")
            payloads = [
                encode_bmp(int(i) - 1, shift=8)
                if i % 10 == 9
                else encode_bmp(int(i))
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "img_id": ids,
                    "payload": payloads,
                    "media_type": ["image/bmp"] * len(ids),
                }
            )

    return (
        spark.range(lo, hi, 1, 32)
        .mapInPandas(batches, schema="img_id bigint, payload binary, media_type string")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("image-scale-proof")
    spark.sparkContext.setLogLevel("ERROR")

    from bigdata_processing_spark.streaming.image_dedup import (
        append_image_batch,
        build_image_index,
        incremental_image_dup_pairs,
    )

    idx = f"/tmp/image_scale_proof_{n}/index"
    shutil.rmtree(os.path.dirname(idx), ignore_errors=True)
    os.makedirs(os.path.dirname(idx), exist_ok=True)
    cut = n * 9 // 10

    sw0, sp0 = shuffle_spill_mb(spark.sparkContext)
    t0 = time.monotonic()
    n_idx = build_image_index(synth_media(spark, 0, cut), idx)
    build_wall = round(time.monotonic() - t0, 2)
    sw1, sp1 = shuffle_spill_mb(spark.sparkContext)
    print(json.dumps({"indexed": n_idx, "build_wall_sec": build_wall,
                      "build_shuffle_mb": round(sw1 - sw0, 1),
                      "build_spill_mb": round(sp1 - sp0, 1)}))

    batch = synth_media(spark, cut, n)
    sw0, sp0 = shuffle_spill_mb(spark.sparkContext)
    t0 = time.monotonic()
    pairs = incremental_image_dup_pairs(batch, idx)
    n_pairs = pairs.count()
    probe_wall = round(time.monotonic() - t0, 2)
    sw1, sp1 = shuffle_spill_mb(spark.sparkContext)
    by_side = pairs.agg(
        F.sum((F.col("d1") >= cut).cast("int")).alias("new_new"),
        F.sum(((F.col("d1") < cut) & (F.col("d2") >= cut)).cast("int")).alias(
            "cross"
        ),
        F.max("hamming").alias("max_hamming"),
    ).collect()[0]
    print(json.dumps({
        "probe_batch": n - cut, "probe_pairs": int(n_pairs),
        "probe_wall_sec": probe_wall,
        "cross_pairs": int(by_side.cross or 0),
        "new_new_pairs": int(by_side.new_new or 0),
        "max_hamming": int(by_side.max_hamming or 0),
        "probe_shuffle_mb": round(sw1 - sw0, 1),
        "probe_spill_mb": round(sp1 - sp0, 1),
    }))

    # fold the batch in, then a 1k micro-probe against the grown index
    t0 = time.monotonic()
    append_image_batch(idx, batch, batch_id=1)
    append_wall = round(time.monotonic() - t0, 2)
    micro = synth_media(spark, n, n + 1_000)
    sw0, sp0 = shuffle_spill_mb(spark.sparkContext)
    t0 = time.monotonic()
    n_micro = incremental_image_dup_pairs(micro, idx).count()
    micro_wall = round(time.monotonic() - t0, 2)
    sw1, sp1 = shuffle_spill_mb(spark.sparkContext)
    print(json.dumps({
        "append_wall_sec": append_wall,
        "micro_probe_batch": 1_000, "micro_probe_pairs": int(n_micro),
        "micro_probe_wall_sec": micro_wall,
        "micro_shuffle_mb": round(sw1 - sw0, 1),
        "micro_spill_mb": round(sp1 - sp0, 1),
    }))


if __name__ == "__main__":
    main()
