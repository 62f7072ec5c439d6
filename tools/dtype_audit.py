#!/usr/bin/env python
"""Strict dtype parity audit between Spark queries and DuckDB oracles.

The driver's CORRECTNESS value-hash is dtype-sensitive: a DuckDB
``HUGEINT`` (int128, pandas ``object``) hashes differently from a Spark
``BIGINT`` (pandas ``int64``) even when every value is equal — round 1
lost 4 rows to exactly this. This audit converts BOTH sides of every
registered oracle query to pandas at a small scale factor and reports any
per-column dtype divergence so casts can be added before the driver sees
them.

Usage:  python tools/dtype_audit.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bigdata_processing_spark.queries import all_oracles, all_queries  # noqa: E402
from bigdata_processing_spark.session import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:]

    spark = get_spark("dtype-audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = all_queries(), all_oracles()
    bad = 0
    for name, fn in queries.items():
        if name not in oracles:
            continue
        if only and not any(s in name for s in only):
            continue
        try:
            s_pdf = fn(spark, sf_dir).toPandas()
            o_pdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            continue
        s_types = {c.lower(): str(d) for c, d in zip(s_pdf.columns, s_pdf.dtypes)}
        o_types = {c.lower(): str(d) for c, d in zip(o_pdf.columns, o_pdf.dtypes)}
        if set(s_types) != set(o_types):
            bad += 1
            print(f"COLS {name}: spark={sorted(s_types)} oracle={sorted(o_types)}")
            continue
        diffs = {c: (s_types[c], o_types[c]) for c in s_types
                 if s_types[c] != o_types[c]}
        if diffs:
            bad += 1
            print(f"DTYPE {name}: " + ", ".join(
                f"{c}: spark={s} oracle={o}" for c, (s, o) in sorted(diffs.items())))
    print(f"\n{bad} queries with dtype/column problems "
          f"(of {len([n for n in queries if n in oracles])} oracle-checked)")
    spark.stop()


if __name__ == "__main__":
    main()
