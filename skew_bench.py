"""Measured skew-join delta: unsalted vs salted vs AQE skew-split.

VERDICT r1 asked for a measured number, not a design claim: a hot key
(95% of the fact side) under a sort-merge join lands on ONE reducer;
operators/skew.salted_join scatters it over n_salts reducers at the
price of replicating the small side. AQE's skew-join split is the
built-in rescue for plain sort-merge joins — measured here as the
third leg so the BASELINE.md row records when explicit salting is and
is not worth it.

Method: synthetic fact table (default 10M rows, 95% on key 0, rest
uniform over 10k keys) joined to a 10k-row dim, broadcast disabled so
the join is genuinely shuffled. Each leg runs the same count+sum over
the join. Run: ``python skew_bench.py [n_rows]``; prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from bigdata_processing_spark.operators.skew import salted_join
from bigdata_processing_spark.session import get_spark

N_KEYS = 10_000
HOT_FRACTION = 0.95


def build(spark, n_rows: int):
    fact = spark.range(n_rows).select(
        F.when(F.rand(seed=7) < HOT_FRACTION, F.lit(0))
        .otherwise((F.rand(seed=11) * N_KEYS).cast("long"))
        .alias("k"),
        (F.rand(seed=13) * 100).alias("v"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("grp")
    )
    return fact, dim


def consume(df) -> tuple[int, float]:
    row = df.agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()[0]
    return row.n, row.s


def timed(fn) -> tuple[float, tuple]:
    t0 = time.monotonic()
    out = fn()
    return round(time.monotonic() - t0, 2), out


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(
        "skew-bench",
        extra_conf={
            # force a real shuffled join: no broadcast rescue
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = build(spark, n_rows)
    fact.write.mode("overwrite").parquet("/tmp/skew_bench_fact")
    dim.write.mode("overwrite").parquet("/tmp/skew_bench_dim")
    fact = spark.read.parquet("/tmp/skew_bench_fact")
    dim = spark.read.parquet("/tmp/skew_bench_dim")

    legs = {
        "unsalted_aqe_off": (False, lambda: consume(fact.join(dim, "k"))),
        "salted_aqe_off": (False, lambda: consume(salted_join(fact, dim, "k", n_salts=32))),
        "unsalted_aqe_skew_split": (True, lambda: consume(fact.join(dim, "k"))),
        "salted_aqe_on": (True, lambda: consume(salted_join(fact, dim, "k", n_salts=32))),
    }
    results: dict[str, float] = {}
    checks = set()
    # two passes; report the second (warm) so leg ordering and JIT
    # warmup don't bias the comparison
    for _pass in range(2):
        for name, (aqe, fn) in legs.items():
            spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
            t, out = timed(fn)
            results[name] = t
            checks.add(out)

    n_set = {c[0] for c in checks}
    assert len(n_set) == 1, f"legs disagree on row count: {checks}"
    sums = [c[1] for c in checks]
    assert all(abs(s - sums[0]) <= 1e-6 * abs(sums[0]) for s in sums), \
        f"legs disagree on value sum: {checks}"
    print(json.dumps({
        "bench": "skew_join",
        "n_rows": n_rows,
        "hot_fraction": HOT_FRACTION,
        "rows_joined": next(iter(n_set)),
        "sec": results,
    }))


if __name__ == "__main__":
    main()
