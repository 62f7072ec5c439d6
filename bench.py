#!/usr/bin/env python
"""BENCH harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE COMPACT JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {<slowest 5>: sec}, "median_sec": ..., "n_queries": ...,
     "shuffle_write_mb_total": ..., "spill_mb_total": ..., "sf": 0.1,
     "detail": "BENCH_DETAIL.json"}

The full per-query timing/shuffle/spill map goes to BENCH_DETAIL.json
next to this script — the stdout line must stay small enough for the
round driver's tail capture (a 97-query inline map overflowed it).

Each query executes through a `noop` sink so the full physical plan runs
(scan → shuffle → agg) without driver-side row transfer inflating the
measurement. A short warm-up query first absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_processing_spark.queries import bench_queries  # noqa: E402
from bigdata_processing_spark.session import get_spark  # noqa: E402


def _stage_snapshot(sc) -> dict[int, tuple[int, int]]:
    """{stageId: (shuffle_write_bytes, spilled_bytes)} from the app status
    store — the listener-backed store the UI/REST API reads, available
    with the UI disabled. Per-query metrics come from diffing snapshots
    (stage IDs are monotonically increasing). Defensive: any py4j/API
    drift degrades to 'no metrics', never a bench failure."""
    try:
        store = sc._jsc.sc().statusStore()
        args = [sc._jvm.java.util.ArrayList()] + [
            getattr(store, f"stageList$default${i}")() for i in range(2, 6)
        ]
        stages = store.stageList(*args)
        return {
            s.stageId(): (
                s.shuffleWriteBytes(),
                s.memoryBytesSpilled() + s.diskBytesSpilled(),
            )
            for s in (stages.apply(i) for i in range(stages.size()))
        }
    except Exception:
        return {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = bench_queries()
    # CANONICAL (name-sorted) timing order, round 10: bench_queries()
    # follows DRIVER_PRIORITY, so every driver rotation used to shift
    # which query sat first — and the first slots pay residual JVM/JIT
    # warm-up the deep slots never see (measured: tfidf_top_terms
    # 0.55s mid-suite under the r9 order, 1.35s at slot 1 under the
    # r10 rotation, with the A/B'd query byte-identical). Sorting makes
    # per-query walls comparable across rounds regardless of rotation.
    queries = {n: queries[n] for n in sorted(queries)}

    # warm-up LAP (round 11): a single warm-up query was not enough —
    # JIT tiering, GC sizing, and the Python-worker pool keep ramping
    # through the first ~dozen executions, so the alphabetically-first
    # sub-second queries absorbed the residual tax (measured:
    # approx_distinct_users 2.53s cold → 1.19s after ONE warm-up query
    # → ~0.5s deep in the suite; the r10 driver run pushed it over the
    # regression gate on load alone). Run the first 12 canonical-order
    # queries once UNTIMED — the exact queries that sit in the early
    # timed slots — so every timed number starts from the same warm JVM.
    for fn in list(queries.values())[:12]:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # min of 2 runs per query: a single pass attributes the previous
    # query's GC/worker-pool churn to whoever runs next (measured 10x
    # inflation on the query after a pandas-UDF-heavy one)
    timings: dict[str, float] = {}
    shuffle_mb: dict[str, float] = {}
    spill_mb: dict[str, float] = {}
    for name, fn in queries.items():
        best = float("inf")
        for run in range(2):
            if run == 1:
                before = _stage_snapshot(spark.sparkContext)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        # metrics from the warm (second) run's new stages only
        after = _stage_snapshot(spark.sparkContext)
        new = [v for k, v in after.items() if k not in before]
        shuffle_mb[name] = round(sum(v[0] for v in new) / 1e6, 3)
        spill_mb[name] = round(sum(v[1] for v in new) / 1e6, 3)

    # Cold re-timing of the memoized dedup family: the shared-pipeline
    # numbers above attribute the common MinHash subtree to whichever
    # family member ran first (execution-order-dependent), so each is
    # re-run with the session memos cleared — the number a standalone
    # invocation would pay, and the one the regression gate reads.
    from bigdata_processing_spark.queries.dedup import MEMO_FAMILY, clear_dedup_memos

    timings_cold: dict[str, float] = {}
    for name in MEMO_FAMILY:
        fn = queries.get(name)
        if fn is None:
            continue
        best = float("inf")
        for _ in range(2):
            clear_dedup_memos()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings_cold[name] = round(best, 3)
    clear_dedup_memos()

    total = round(sum(timings.values()), 3)
    ordered = sorted(timings.values())
    median = round(ordered[len(ordered) // 2], 3) if ordered else 0.0
    slowest5 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])

    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump({
            "queries": timings,
            "queries_cold": timings_cold,
            "shuffle_write_mb": shuffle_mb,
            "spill_mb": spill_mb,
            "sf": sf,
        }, f, indent=1, sort_keys=True)

    print(json.dumps({
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": slowest5,
        "median_sec": median,
        "n_queries": len(timings),
        "cold_dedup_family_sec": round(sum(timings_cold.values()), 3),
        "shuffle_write_mb_total": round(sum(shuffle_mb.values()), 3),
        "spill_mb_total": round(sum(spill_mb.values()), 3),
        "sf": sf,
        "detail": "BENCH_DETAIL.json",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
