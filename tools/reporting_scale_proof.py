#!/usr/bin/env python
"""Big-regime proof for the round-9 broadcast guards (VERDICT r8 #1).

Runs `doc_novelty_bands` and `winnowing_dup_passages` — two of the
reporting-grain queries whose corpus-growing join sides were moved onto
the `_bcast_if_small` regime switch — over the 100× clone corpus
(500k docs, ~1.2 GB estimated in-memory, past the 512 MB broadcast
cap), asserts the BIG regime actually planned (SortMergeJoin on the
guarded join, zero BroadcastHashJoin of the corpus-grown table), and
reports wall / shuffle / spill. The numbers land in BASELINE.md's
round-9 table.

Run: ``python tools/reporting_scale_proof.py [N] [sf_dir]``
(default 100, sf0.1). One JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_processing_spark.session import get_spark  # noqa: E402
from tools.sf1_dedup_proof import build_docs_scaled, shuffle_spill_mb  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("reporting-scale-proof")
    spark.sparkContext.setLogLevel("ERROR")

    from bigdata_processing_spark.queries import dedup as D

    scaled = build_docs_scaled(spark, sf_dir, n, f"/tmp/sf1_dedup_proof_{n}x")
    D.clear_dedup_memos()
    assert not D._fits_broadcast(scaled), (
        "proof corpus unexpectedly fits the broadcast cap — nothing to prove"
    )

    for name, fn in (
        ("doc_novelty_bands", D.doc_novelty_bands),
        ("winnowing_dup_passages", D.winnowing_dup_passages),
    ):
        D.clear_dedup_memos()
        df = fn(spark, scaled)
        plan = df._jdf.queryExecution().executedPlan().toString()
        regime_ok = "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan
        sw0, sp0 = shuffle_spill_mb(spark.sparkContext)
        t0 = time.monotonic()
        rows = df.count()
        wall = round(time.monotonic() - t0, 2)
        sw1, sp1 = shuffle_spill_mb(spark.sparkContext)
        print(json.dumps({
            "query": name, "n": n, "rows": rows, "wall_sec": wall,
            "big_regime_plan": regime_ok,
            "shuffle_mb": round(sw1 - sw0, 1), "spill_mb": round(sp1 - sp0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
