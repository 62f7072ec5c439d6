#!/usr/bin/env python
"""Round-12 isolation probe: split a query's wall into PLANNING vs
EXECUTION, and (for named targets) time sub-pipeline stages through the
noop sink, per guide §1 (measure first; isolate with noop).

Usage:
    python tools/r12_isolate.py q1 q2 ...      # plan/exec split per query
    python tools/r12_isolate.py --floor        # fixed-overhead floor probe
    python tools/r12_isolate.py --simhash      # simhash sub-stage probe

Numbers print as JSON lines; nothing here feeds the bench artifacts —
it is a working tool for the optimization round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_processing_spark.queries import bench_queries  # noqa: E402
from bigdata_processing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def warmup(spark, queries, n=8) -> None:
    for fn in list(queries.values())[:n]:
        noop(fn(spark, SF_DIR))


def probe_query(spark, name, fn, runs=3) -> dict:
    best_plan, best_exec, best_total = (float("inf"),) * 3
    for _ in range(runs):
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        # force full analysis+optimization+physical planning only
        df._jdf.queryExecution().executedPlan()
        t1 = time.perf_counter()
        noop(df)
        t2 = time.perf_counter()
        best_plan = min(best_plan, t1 - t0)
        best_exec = min(best_exec, t2 - t1)
        best_total = min(best_total, t2 - t0)
    return {
        "query": name,
        "plan_s": round(best_plan, 3),
        "exec_s": round(best_exec, 3),
        "total_s": round(best_total, 3),
    }


def floor_probe(spark) -> None:
    """Fixed overhead of one bench slot: a trivial 1-row query, and a
    bare parquet scan, through the same noop sink."""
    from bigdata_processing_spark.catalog import load_table

    one = spark.range(1)
    for _ in range(3):
        noop(one)
    t0 = time.perf_counter(); noop(one); t1 = time.perf_counter()
    print(json.dumps({"probe": "range1_noop", "s": round(t1 - t0, 4)}))
    docs = load_table(spark, SF_DIR, "documents")
    for _ in range(2):
        noop(docs)
    t0 = time.perf_counter(); noop(docs); t1 = time.perf_counter()
    print(json.dumps({"probe": "documents_scan_noop", "s": round(t1 - t0, 4)}))
    li = load_table(spark, SF_DIR, "lineitem")
    for _ in range(2):
        noop(li)
    t0 = time.perf_counter(); noop(li); t1 = time.perf_counter()
    print(json.dumps({"probe": "lineitem_scan_noop", "s": round(t1 - t0, 4)}))


def simhash_stages(spark) -> None:
    """Sub-stage walls for simhash_neardup_pairs: token hash frame,
    64-bit-sum aggregate, band projection, then the full query."""
    from pyspark.sql import functions as F

    from bigdata_processing_spark.catalog import load_table
    from bigdata_processing_spark.functions import text as T
    from bigdata_processing_spark.queries.dedup import _SIM64

    docs = load_table(spark, SF_DIR, "documents")
    tokex = docs.select(
        "doc_id", F.explode(F.array_distinct(T.tokens(F.col("text")))).alias("tok")
    ).filter(F.col("tok") != "")
    m = F.md5(F.concat(F.lit("0|"), F.col("tok")))
    th = tokex.select(
        "doc_id",
        F.conv(F.substring(m, 1, 8), 16, 10).cast("bigint").alias("h_lo"),
        F.conv(F.substring(m, 9, 8), 16, 10).cast("bigint").alias("h_hi"),
    )
    bit_aggs = [
        F.sum(
            F.when(
                F.shiftright(F.col("h_lo" if j < 32 else "h_hi"), j % 32)
                .bitwiseAND(F.lit(1)) == 1, 1,
            ).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(_SIM64)
    ]
    sbits = th.groupBy("doc_id").agg(*bit_aggs)
    band_cols = []
    for b in range(4):
        v = None
        for i in range(16):
            term = (
                F.when(F.col(f"s{16 * b + i}") > 0, F.lit(1)).otherwise(F.lit(0))
                * F.lit(1 << i)
            )
            v = term if v is None else v + term
        band_cols.append(v.cast("int").alias(f"b{b}"))
    hashes = sbits.select(F.col("doc_id").alias("img_id"), *band_cols)

    stages = {
        "tokex": tokex,
        "th(md5+conv)": th,
        "sbits(64-agg)": sbits,
        "hashes(bands)": hashes,
    }
    for label, df in stages.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            noop(df)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"stage": label, "s": round(best, 3)}))


def main() -> None:
    spark = get_spark("r12-isolate")
    spark.sparkContext.setLogLevel("ERROR")
    queries = bench_queries()
    warmup(spark, queries)

    args = sys.argv[1:]
    if "--all" in args:
        out = {}
        for name, fn in sorted(queries.items()):
            spark.sparkContext.setJobDescription(f"r12 isolate: {name}")
            r = probe_query(spark, name, fn, runs=2)
            out[name] = {"plan_s": r["plan_s"], "exec_s": r["exec_s"],
                         "total_s": r["total_s"]}
            spark.sparkContext.setJobDescription(None)
        with open("/tmp/r12_plan_exec_split.json", "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        tot_p = sum(v["plan_s"] for v in out.values())
        tot_e = sum(v["exec_s"] for v in out.values())
        print(json.dumps({"n": len(out), "plan_s_total": round(tot_p, 1),
                          "exec_s_total": round(tot_e, 1)}))
        spark.stop()
        return
    if "--floor" in args:
        floor_probe(spark)
        args = [a for a in args if a != "--floor"]
    if "--simhash" in args:
        simhash_stages(spark)
        args = [a for a in args if a != "--simhash"]
    for name in args:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"r12 isolate: {name}")
        print(json.dumps(probe_query(spark, name, fn)))
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
