"""Local replica of the driver's DuckDB-oracle correctness check.

For each registered query: run the Spark DataFrame and the DuckDB oracle
on the same sf dir, then compare row count, column names, and values
(order-insensitive, doubles with relative tolerance) — the same contract
the driver's CORRECTNESS_r{N}.json records.
"""

from __future__ import annotations

import math

import duckdb

REL_TOL = 1e-6


def run_oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    try:
        for t in ("region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _key(v):
    """Sort/compare key: quantize floats so order-insensitive matching is
    tolerant, like the driver's value hash."""
    if v is None:
        return ("\x00none",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", round(v, 6) if abs(v) < 1 else round(v, -int(math.floor(math.log10(abs(v)))) + 8))
    if isinstance(v, int):
        return ("f", float(v))
    return (type(v).__name__, str(v))


def _val_eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=REL_TOL, abs_tol=1e-9)
    return str(a) == str(b)


def compare(spark_df, sf_dir: str, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    o_cols, o_rows = run_oracle(sf_dir, sql)
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in o_cols):
        problems.append(f"column mismatch: spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")
        return problems

    # align columns by (lowercased) name, sort rows by quantized key
    s_idx = [s_cols.index(next(c2 for c2 in s_cols if c2.lower() == c.lower()))
             for c in o_cols]
    s_aligned = sorted(
        (tuple(r[i] for i in s_idx) for r in s_rows),
        key=lambda r: tuple(_key(v) for v in r),
    )
    o_sorted = sorted(o_rows, key=lambda r: tuple(_key(v) for v in r))
    bad = 0
    for sr, orow in zip(s_aligned, o_sorted):
        for c, sv, ov in zip(o_cols, sr, orow):
            if not _val_eq(sv, ov):
                if bad < 3:
                    problems.append(f"value mismatch col={c}: spark={sv!r} oracle={ov!r}")
                bad += 1
    if bad:
        problems.append(f"{bad} mismatched values total")
    return problems
