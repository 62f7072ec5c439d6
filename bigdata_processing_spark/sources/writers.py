"""Sinks (reference S5-S7 analogs).

The reference collected results to the driver and uploaded a single JSON
blob via boto3 (``Codes/etherTransactionsAnalysis/etherTransactionsAnalysis.py:56-66``
and siblings) — single-threaded and driver-memory-bound. Here sinks are
distributed ``DataFrameWriter`` paths; ``single_file=True`` coalesces to
one output file for small results (the reference's blob shape) without
ever materializing rows on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def literal_df(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """Tiny literal frame built ENTIRELY JVM-side via a VALUES clause.

    ``spark.createDataFrame(rows)`` backs the frame with a Python RDD,
    and WRITING such a frame launches a Python worker round-trip per
    task — measured ~5s per single-row ledger write on this box (a
    count of the same frame is fast; only the write path pays). Every
    metadata/ledger write (index counts, idmax, meta, stage logs,
    centroid sidecars) goes through this instead: the VALUES text parses
    and executes in the JVM, so the write is a plain local task (~0.2s).

    Doubles are embedded as shortest-repr string literals cast to
    DOUBLE — the correctly-rounded parse recovers identical bits (the
    same trick as operators/ivf._scores_sql). Columns are cast to the
    declared DDL types so readers see the exact schema
    ``createDataFrame`` produced. Supports None/bool/int/float/str and
    (nested) lists thereof; this is a metadata-row helper, keep data
    paths on real sources."""
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(schema)
    names = [f.name for f in st.fields]
    types = [f.dataType.simpleString() for f in st.fields]

    def sqlit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, float):
            return f"CAST('{v!r}' AS DOUBLE)"
        if isinstance(v, int):
            return str(v)
        if isinstance(v, str):
            return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
        if isinstance(v, (list, tuple)):
            return "array(" + ",".join(sqlit(x) for x in v) + ")"
        raise TypeError(f"literal_df: unsupported literal {type(v)}")

    cols = ",".join(
        f"CAST(v{i} AS {t}) AS `{n}`"
        for i, (n, t) in enumerate(zip(names, types))
    )
    tdef = ",".join(f"v{i}" for i in range(len(names)))
    if not rows:
        nulls = "(" + ",".join(["NULL"] * len(names)) + ")"
        return spark.sql(
            f"SELECT {cols} FROM (VALUES {nulls}) AS t({tdef}) WHERE FALSE"
        )
    vals = ",".join(
        "(" + ",".join(sqlit(v) for v in row) + ")" for row in rows
    )
    return spark.sql(f"SELECT {cols} FROM (VALUES {vals}) AS t({tdef})")


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
                  partition_by: tuple[str, ...] = (),
                  compression: str | None = None) -> None:
    """Parquet sink for derived tables (S6 analog — the reference
    re-ingested its own notebook output as contractsTop10.csv).
    ``partition_by`` yields partition-pruned downstream scans.
    ``compression`` picks the codec per table role: 'zstd' for
    cold/archival derived tables (~30% smaller than the snappy default
    at comparable scan speed), 'snappy' (default) for hot tables."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    w.parquet(path)


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite",
              partition_by: tuple[str, ...] = ()) -> None:
    """ORC sink (columnar alternative; same pushdown/pruning story as
    parquet in Spark's vectorized reader)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_sorted_parquet(df: DataFrame, path: str, sort_cols: tuple[str, ...],
                         *, n_files: int | None = None,
                         mode: str = "overwrite") -> None:
    """Layout-optimized parquet: range-partition by ``sort_cols`` (each
    output file owns a disjoint key range) and sort within partitions
    (each parquet row group carries tight min/max stats on those
    columns).

    At 100TB this is the clustered-table write: a selective predicate on
    the sort key skips whole files via footer min/max, then whole row
    groups — the poor man's Z-order, and the layout every lakehouse
    compaction job targets. tests/test_sources.py verifies the written
    footers really do carry disjoint, narrow ranges and that a point
    query reads fewer rows than a full scan.

    ``repartitionByRange`` samples the key distribution, so skewed keys
    still yield balanced files (contrast hash-partitioning, where range
    predicates hit every file)."""
    parts = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    parts.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def write_avro(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """Avro sink — requires the external spark-avro module (not bundled
    in this environment); raises a clear error when absent."""
    try:
        df.write.mode(mode).format("avro").save(path)
    except Exception as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "avro support requires the spark-avro package on the classpath"
        ) from e
