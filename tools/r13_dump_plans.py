#!/usr/bin/env python
"""Dump ``explain('formatted')`` for named queries into plans/r13/.

Usage: python tools/r13_dump_plans.py SUFFIX query [query ...]
   (SUFFIX is e.g. 'before' or 'after'; files land at
    plans/r13/<query>_<SUFFIX>.txt, sf0.1 inputs)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_processing_spark.queries import bench_queries  # noqa: E402
from bigdata_processing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r13")


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("r13-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = bench_queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
