"""Sinks (reference S5-S7 analogs).

The reference collected results to the driver and uploaded a single JSON
blob via boto3 (``Codes/etherTransactionsAnalysis/etherTransactionsAnalysis.py:56-66``
and siblings) — single-threaded and driver-memory-bound. Here sinks are
distributed ``DataFrameWriter`` paths; ``single_file=True`` coalesces to
one output file for small results (the reference's blob shape) without
ever materializing rows on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_json(df: DataFrame, path: str, *, mode: str = "overwrite",
               single_file: bool = False) -> None:
    """JSON-lines sink (S5 analog)."""
    (df.coalesce(1) if single_file else df).write.mode(mode).json(path)


def write_csv(df: DataFrame, path: str, *, mode: str = "overwrite",
              header: bool = True, single_file: bool = False) -> None:
    """CSV sink (S7 analog — the notebook's ``df.to_csv``)."""
    (df.coalesce(1) if single_file else df).write.mode(mode).option(
        "header", str(header).lower()
    ).csv(path)


def write_parquet(df: DataFrame, path: str, *, mode: str = "overwrite",
                  partition_by: tuple[str, ...] = ()) -> None:
    """Parquet sink for derived tables (S6 analog — the reference
    re-ingested its own notebook output as contractsTop10.csv).
    ``partition_by`` yields partition-pruned downstream scans."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite",
              partition_by: tuple[str, ...] = ()) -> None:
    """ORC sink (columnar alternative; same pushdown/pruning story as
    parquet in Spark's vectorized reader)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_avro(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """Avro sink — requires the external spark-avro module (not bundled
    in this environment); raises a clear error when absent."""
    try:
        df.write.mode(mode).format("avro").save(path)
    except Exception as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "avro support requires the spark-avro package on the classpath"
        ) from e
