#!/usr/bin/env python
"""Per-query bench regression gate.

Compares the latest BENCH_DETAIL.json (written by bench.py) against the
committed per-query snapshot BENCH_BASELINE.json and flags queries whose
wall time moved more than THRESHOLD x in either direction — the check
BASELINE.md's delta tables were assembled by hand from until now.

Usage:
    python tools/bench_regress.py            # report regressions
    python tools/bench_regress.py --update   # accept current as baseline

Exit code 1 when any query regresses past THRESHOLD (new/removed queries
are reported but never fail the gate — additions are expected between
rounds). Two noise guards, both calibrated against back-to-back bench
runs on a quiet host (5 of 120 queries moved >1.5x purely from JIT/GC
variance, with absolute deltas up to ~0.4s): queries under MIN_SEC in
both runs are skipped, and a flag additionally requires the absolute
delta to exceed MIN_DELTA.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(ROOT, "BENCH_DETAIL.json")
BASE = os.path.join(ROOT, "BENCH_BASELINE.json")

THRESHOLD = 1.5
MIN_SEC = 0.5
MIN_DELTA = 0.75


def main() -> int:
    detail = json.load(open(DETAIL))
    # gate on the cold (memo-cleared) timings where bench recorded them:
    # the shared-pipeline numbers attribute the dedup family's common
    # subtree to whichever query ran first, so they move with execution
    # order, not with code changes (VERDICT r03 watch item #3)
    cur = dict(detail["queries"])
    cur.update(detail.get("queries_cold", {}))
    if "--update" in sys.argv:
        json.dump(cur, open(BASE, "w"), indent=1, sort_keys=True)
        print(f"baseline updated: {len(cur)} queries -> {BASE}")
        return 0
    if not os.path.exists(BASE):
        # a missing baseline must FAIL, not silently self-baseline —
        # otherwise deleting the file makes the gate vacuously pass
        print(f"ERROR: baseline {BASE} missing; run with --update to create it")
        return 1
    base = json.load(open(BASE))

    added = sorted(set(cur) - set(base))
    removed = sorted(set(base) - set(cur))
    slower, faster = [], []
    for name in sorted(set(cur) & set(base)):
        c, b = cur[name], base[name]
        if c < MIN_SEC and b < MIN_SEC:
            continue
        ratio = c / max(b, 1e-9)
        if ratio > THRESHOLD and c - b > MIN_DELTA:
            slower.append((name, b, c, ratio))
        elif ratio < 1 / THRESHOLD and b - c > MIN_DELTA:
            faster.append((name, b, c, ratio))

    for name, b, c, r in slower:
        print(f"REGRESSED {name}: {b:.2f}s -> {c:.2f}s ({r:.2f}x)")
    for name, b, c, r in faster:
        print(f"improved  {name}: {b:.2f}s -> {c:.2f}s ({r:.2f}x)")
    if added:
        print(f"new queries (not gated): {', '.join(added)}")
    if removed:
        print(f"removed queries: {', '.join(removed)}")
    if not (slower or faster or added or removed):
        print("no per-query movement past threshold")
    return 1 if slower else 0


if __name__ == "__main__":
    raise SystemExit(main())
