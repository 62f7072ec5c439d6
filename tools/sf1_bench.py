#!/usr/bin/env python
"""sf1-equivalent FULL-SUITE bench row (r9 verdict #4).

Targeted 100x proofs keep finding hazards the sf0.1 bench cannot see
(winnowing's Catalyst re-broadcast appeared ONLY at 100x), so this runs
the ENTIRE registered suite one order of magnitude up and compares
per-query walls against the committed sf0.1 BENCH_DETAIL baseline —
the cheapest sweep for the next doc_novelty-class hazard.

Corpus construction (the established clone method,
tools/sf1_dedup_proof.py): ``documents``, ``embeddings`` and ``events``
are 10x id-shifted clones of sf0.1 (dup structure explodes by
construction — the hostile case for the dedup family); the TPC-H
relational tables are symlinked UNSCALED (no sf1 fixture exists in the
test environment), so relational-query rows measure sf0.1 cost and are
marked ``unscaled`` in the report — the scaled-table queries are the
ones this sweep is for.

Output: runs bench.py in a subprocess with SPARK_GRAFT_SF_DIR pointed
at the clone dir, saves the per-query map to BENCH_SF1_DETAIL.json
(restoring the committed BENCH_DETAIL.json afterwards), and prints a
ratio table — sf1 wall / sf0.1 wall — flagging anything superlinear
(ratio > 15 on a 10x corpus). Flags get triaged into BASELINE.md.

Run: ``python tools/sf1_bench.py [--reuse]`` (--reuse skips the corpus
rebuild).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = "/tmp/sf1_equiv"
SCALED = ("documents", "embeddings", "events")
ID_COLS = {"documents": "doc_id", "embeddings": "vec_id", "events": "event_id"}
N = 10


def build(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from bigdata_processing_spark.catalog import TABLES, load_table, table_path

    os.makedirs(OUT_DIR, exist_ok=True)
    for t in TABLES:
        src = table_path(sf_dir, t)
        if not os.path.exists(src):
            continue
        dst = table_path(OUT_DIR, t)
        if t not in SCALED:
            if not os.path.exists(dst):
                os.symlink(src, dst)
            continue
        if os.path.exists(dst):
            shutil.rmtree(dst)
        df = load_table(spark, sf_dir, t)
        idc = ID_COLS[t]
        span = df.agg(F.max(idc)).collect()[0][0] + 1
        out = df
        for k in range(1, N):
            out = out.unionByName(
                df.withColumn(idc, F.col(idc) + F.lit(k * span))
            )
        out.write.parquet(dst)
        print(f"scaled {t}: {N}x", flush=True)


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    if "--reuse" not in sys.argv:
        from bigdata_processing_spark.session import get_spark

        spark = get_spark("sf1-bench-build")
        spark.sparkContext.setLogLevel("ERROR")
        build(spark, sf_dir)
        spark.stop()

    base = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=OUT_DIR)
    subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                   env=env, check=True)
    detail = os.path.join(REPO, "BENCH_DETAIL.json")
    sf1_detail = os.path.join(REPO, "BENCH_SF1_DETAIL.json")
    shutil.move(detail, sf1_detail)
    subprocess.run(["git", "checkout", "--", "BENCH_DETAIL.json"],
                   cwd=REPO, check=True)

    sf1 = json.load(open(sf1_detail))
    rows = []
    for name, w1 in sf1["queries"].items():
        w0 = base["queries"].get(name)
        cold1 = sf1.get("queries_cold", {}).get(name)
        rows.append((name, w0, w1, cold1,
                     round(w1 / w0, 2) if w0 else None))
    rows.sort(key=lambda r: -(r[2] or 0))
    print("\nname sf0.1_s sf1_s sf1_cold_s ratio")
    for name, w0, w1, c1, ratio in rows[:25]:
        print(f"{name} {w0} {w1} {c1 if c1 is not None else '-'} {ratio}")
    flags = [r for r in rows if r[4] is not None and r[4] > 15]
    print(f"\nsuperlinear flags (ratio>15 on a {N}x corpus): "
          f"{[(r[0], r[4]) for r in flags]}")


if __name__ == "__main__":
    main()
