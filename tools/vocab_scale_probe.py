#!/usr/bin/env python
"""vocab_coverage_curve at a 1M-type vocabulary (VERDICT r7 #8).

The salted two-stage rank's PLAN shape is asserted (test_plans: local
top-k per salt below the single-partition exchange), but the survivor
bound — ≤ n_salts·kmax rows ever reach the one-task window — deserved a
measured row at a vocabulary where it matters. This builds a synthetic
corpus with >1M distinct token types (each doc carries unique types
plus a shared zipf-ish head so the top-k is non-trivial), runs the
registered query, and reports wall + the survivor-row count the
single-partition window actually saw.

Run: ``python tools/vocab_scale_probe.py [n_docs] [types_per_doc]``
(defaults 100_000 × 12 → 1.2M types). JSON lines; lands in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bigdata_processing_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    per_doc = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark("vocab-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from bigdata_processing_spark.functions import text as T
    from bigdata_processing_spark.queries.nlp import (
        VOCAB_CURVE_KS,
        vocab_coverage_curve,
    )

    out = f"/tmp/vocab_scale_{n_docs}x{per_doc}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    # doc i: per_doc unique types (tok{i*per_doc+j}) + a zipf-ish head
    # (head{i % 8} appears ~n/8 times each — the realistic top-k mass)
    uniq = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("tok"), (F.col("id") * per_doc + j).cast("string"))
            for j in range(per_doc)
        ],
    )
    head = F.concat(F.lit("head"), F.pmod(F.col("id"), F.lit(8)).cast("string"))
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", head, uniq).alias("text"),
        F.lit("synth").alias("source"),
    )
    docs.write.parquet(f"{out}/documents.parquet")

    t0 = time.monotonic()
    rows = vocab_coverage_curve(spark, out).collect()
    wall = round(time.monotonic() - t0, 2)

    # the survivor count the one-task window saw (same expressions as
    # the query's stage 1; n_salts/kmax mirror queries/nlp.py)
    kmax, n_salts = max(VOCAB_CURVE_KS), 32
    cnt = (
        spark.read.parquet(f"{out}/documents.parquet")
        .select(F.explode(F.filter(T.tokens(F.col("text")), lambda t: t != "")).alias("t"))
        .groupBy("t").agg(F.count("*").alias("c"))
    )
    wloc = Window.partitionBy("salt").orderBy(F.col("c").desc(), F.col("t").asc())
    n_surv = (
        cnt.withColumn("salt", F.pmod(F.hash("t"), F.lit(n_salts)))
        .withColumn("lrk", F.row_number().over(wloc))
        .filter(F.col("lrk") <= kmax)
        .count()
    )
    n_types = cnt.count()
    print(json.dumps({
        "n_docs": n_docs, "vocab_types": int(n_types),
        "query_wall_sec": wall,
        "survivor_rows": int(n_surv),
        "survivor_bound": n_salts * kmax,
        "curve": {str(r.k): round(r.coverage, 6) for r in rows},
    }))
    assert n_surv <= n_salts * kmax


if __name__ == "__main__":
    main()
