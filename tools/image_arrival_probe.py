#!/usr/bin/env python
"""Per-arrival cost of the reps-only incremental image index vs index
size (VERDICT r11 #7).

Round 11 moved the image store to new-signature-reps-only postings with
the claim: "an arrival matching an INDEXED signature costs one output
edge and zero band work — the dominant arrival class of a crawl
ingest". This measures exactly that class: build indexes of
geometrically growing DISTINCT-signature counts, then probe a
fixed-size batch of arrivals whose signatures are all already indexed,
and record the wall per arrival. Flat-in-N is the pass.

The index-side costs under test are the signature-match join + the
(skipped) band work, not BMP decode — so hashes are synthesized
directly (4×16-bit bands from xxhash64) and the probe enters through
``incremental_image_dup_pairs_from_hashes``. A smaller novel-signature
batch rides along as the contrast row (those DO probe the band
postings).

Run: ``python tools/image_arrival_probe.py [sizes,csv] [batch]``.
Prints a BASELINE.md-ready table.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_processing_spark.session import get_spark  # noqa: E402

REPEATS = 3


def _synth_hashes(spark, lo: int, n: int, salt: int):
    """n synthetic dHash rows with ids [lo, lo+n) — 4 independent
    16-bit bands per image, distinct signatures w.h.p."""
    df = spark.range(lo, lo + n).select(F.col("id").alias("img_id"))
    for b in range(4):
        df = df.withColumn(
            f"b{b}",
            F.pmod(
                F.xxhash64(F.col("img_id"), F.lit(salt), F.lit(b)),
                F.lit(65536),
            ).cast("int"),
        )
    return df


def main() -> None:
    sizes = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1 else [10_000, 40_000, 160_000]
    )
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    spark = get_spark("image-arrival-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from bigdata_processing_spark.streaming.image_dedup import (
        _write_image_batch,
        incremental_image_dup_pairs_from_hashes,
    )

    rows = []
    for n in sizes:
        path = f"/tmp/img_arrival_probe_{n}"
        shutil.rmtree(path, ignore_errors=True)
        base = _synth_hashes(spark, 0, n, salt=7)
        t0 = time.monotonic()
        _write_image_batch(path, 0, base)
        build_s = time.monotonic() - t0

        # the measured class: arrivals whose signature is INDEXED —
        # copy band values from a spread of existing reps, new ids
        stride = max(1, n // batch_n)
        indexed_arrivals = _synth_hashes(
            spark, 0, n, salt=7
        ).filter(F.col("img_id") % stride == 0).limit(batch_n).select(
            (F.col("img_id") + 2 * n).alias("img_id"),
            "b0", "b1", "b2", "b3",
        ).persist()
        indexed_arrivals.count()

        # contrast: novel signatures (different salt ⇒ distinct bands)
        novel_arrivals = _synth_hashes(
            spark, 4 * n, batch_n, salt=991
        ).persist()
        novel_arrivals.count()

        def probe(batch):
            walls, edges = [], 0
            for _ in range(REPEATS):
                t0 = time.monotonic()
                edges = incremental_image_dup_pairs_from_hashes(
                    batch, path
                ).count()
                walls.append(time.monotonic() - t0)
            return min(walls), edges

        sec_hit, edges_hit = probe(indexed_arrivals)
        sec_new, edges_new = probe(novel_arrivals)
        got = indexed_arrivals.count()
        rows.append({
            "index_sigs": n,
            "build_s": round(build_s, 2),
            "batch": got,
            "sec_indexed_sig_batch": round(sec_hit, 3),
            "ms_per_arrival": round(1000 * sec_hit / got, 2),
            "edges_indexed": edges_hit,
            "sec_novel_sig_batch": round(sec_new, 3),
            "edges_novel": edges_new,
        })
        indexed_arrivals.unpersist()
        novel_arrivals.unpersist()
        print(rows[-1], flush=True)

    print("\n| index sigs | build_s | batch | indexed-sig batch s "
          "| ms/arrival | edges | novel-sig batch s |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['index_sigs']} | {r['build_s']} | {r['batch']} "
              f"| {r['sec_indexed_sig_batch']} | {r['ms_per_arrival']} "
              f"| {r['edges_indexed']} | {r['sec_novel_sig_batch']} |")


if __name__ == "__main__":
    main()
