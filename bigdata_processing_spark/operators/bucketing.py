"""Bucketed tables: pre-shuffled storage for co-located, exchange-free
joins — the 100TB answer to repeatedly joining the same fact tables.

The reference shuffled both RDDs on every join (SURVEY.md §2.5). At
scale, a fact⋈fact join (e.g. orders⋈lineitem) re-shuffles terabytes per
query; bucketing both tables by the join key at write time moves that
shuffle to ingestion, once. Subsequent joins read co-located buckets —
`tests/test_bucketing.py` asserts the join plan contains NO Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 8) -> None:
    """Persist as a bucketed+sorted managed table (Hive-style layout in
    spark.sql.warehouse.dir). Sorting within buckets enables sort-merge
    without a per-query sort."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key_left: str, key_right: str, how: str = "inner") -> DataFrame:
    """Join two identically-bucketed tables — planner sees compatible
    output partitionings and elides both exchanges."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[key_left] == rt[key_right], how)
