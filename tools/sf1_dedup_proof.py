#!/usr/bin/env python
"""sf1-equivalent dedup-family scale proof (VERDICT r4 item 5).

Builds a 10x id-shifted clone of the sf0.1 documents table (= sf1 doc
volume; every original doc gains 9 EXACT near-dup copies, so dup
structure explodes by construction) and runs the GUARDED pair pipeline
end-to-end — candidate generation, verification, connected components,
survivor selection — recording candidate/pair counts, CC rounds, peak
shuffle, and wall time per stage. The numbers land in BASELINE.md's
"sf1 dedup-family scale proof" table.

Run: ``python tools/sf1_dedup_proof.py [N] [sf_dir]`` (default 10, sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_processing_spark.catalog import TABLES, load_table, table_path  # noqa: E402
from bigdata_processing_spark.session import get_spark  # noqa: E402


def build_docs_scaled(spark, sf_dir: str, n: int, out_dir: str) -> str:
    """10x documents via id-shifted clones; every other table symlinked
    unscaled (the dedup family only reads documents)."""
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = table_path(sf_dir, t)
        if not os.path.exists(src):
            continue
        dst = table_path(out_dir, t)
        if t != "documents":
            if not os.path.exists(dst):
                os.symlink(src, dst)
            continue
        if os.path.exists(dst):
            import shutil

            shutil.rmtree(dst)
        df = load_table(spark, sf_dir, t)
        span = df.agg(F.max("doc_id")).collect()[0][0] + 1
        out = df
        for k in range(1, n):
            out = out.unionByName(df.withColumn("doc_id", F.col("doc_id") + F.lit(k * span)))
        out.write.parquet(dst)
    return out_dir


def shuffle_spill_mb(sc) -> tuple[float, float]:
    try:
        store = sc._jsc.sc().statusStore()
        args = [sc._jvm.java.util.ArrayList()] + [
            getattr(store, f"stageList$default${i}")() for i in range(2, 6)
        ]
        stages = store.stageList(*args)
        sw = sp = 0
        for s in (stages.apply(i) for i in range(stages.size())):
            sw += s.shuffleWriteBytes()
            sp += s.memoryBytesSpilled() + s.diskBytesSpilled()
        return sw / 1e6, sp / 1e6
    except Exception:
        return -1.0, -1.0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("sf1-dedup-proof")
    spark.sparkContext.setLogLevel("ERROR")

    scaled = build_docs_scaled(
        spark, sf_dir, n, f"/tmp/sf1_dedup_proof_{n}x"
    )

    from bigdata_processing_spark.operators.graph import connected_components
    from bigdata_processing_spark.queries.dedup import (
        _scored_candidates,
        _verified_dup_pairs,
        clear_dedup_memos,
        dedup_survivors,
    )

    clear_dedup_memos()
    report: dict = {"n": n, "sf_dir": sf_dir}
    report["docs"] = load_table(spark, scaled, "documents").count()

    sw0, sp0 = shuffle_spill_mb(spark.sparkContext)

    # Round 7: the production pipeline is TWO-STAGE (signature-estimate
    # prefilter before the exact-jaccard join), so the pipeline stage
    # below covers candidate generation + prefilter + exact verify in
    # one pass — running the prefilter-free _scored_candidates first
    # (the pre-r7 stage split) would pay the full 36.6M-intersection
    # verify this change exists to avoid. exact_verify_volume counts
    # the pairs that actually reached the exact intersection.
    from bigdata_processing_spark.thresholds import (
        JACCARD_THRESHOLD,
        est_agree_min,
    )

    t0 = time.monotonic()
    pairs = _verified_dup_pairs(spark, scaled)
    report["verified_pairs"] = pairs.count()
    report["sec_verify"] = round(time.monotonic() - t0, 2)
    # memo hit: the prefiltered scored-candidates frame is already
    # materialized by the pipeline above, so this count is free
    sc = _scored_candidates(
        spark, scaled, est_agree_min=est_agree_min(JACCARD_THRESHOLD)
    )
    report["exact_verify_volume"] = sc.count()

    t0 = time.monotonic()
    labels, rounds = connected_components(
        pairs.select("d1", "d2"), src="d1", dst="d2"
    )
    report["cc_rounds"] = rounds
    report["clustered_docs"] = labels.count()
    report["sec_cc"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    surv = dedup_survivors(spark, scaled).collect()
    report["kept"] = sum(r.kept for r in surv)
    report["removed"] = sum(r.removed for r in surv)
    report["sec_survivors"] = round(time.monotonic() - t0, 2)

    sw1, sp1 = shuffle_spill_mb(spark.sparkContext)
    report["shuffle_write_mb"] = round(sw1 - sw0, 1)
    report["spill_mb"] = round(sp1 - sp0, 1)
    clear_dedup_memos()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
