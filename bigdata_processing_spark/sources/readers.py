"""Schema-declared readers with reference-parity row validation.

The reference ingests CSV as raw text lines and re-validates every line
inside Python lambdas — arity check + float()-parse try/except, dropping
the header as a side effect of a failed parse (reference
``Codes/etherTransactionsAnalysis/etherTransactionsAnalysis.py:19-28,45-46``
and the five sibling validators, SURVEY.md §2.2 F1-F7).

Here validation is schema-on-read: a declared ``StructType`` plus Spark's
``DROPMALFORMED``/``PERMISSIVE`` modes reproduce drop-bad-lines semantics
JVM-side (no Python in the row path), and constraint predicates
(non-null, prefix, non-empty) compile to pushed-down filters.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = True,
    drop_malformed: bool = True,
    constraints: Iterable[Column] = (),
) -> DataFrame:
    """CSV scan with declared schema (reference S1 analog).

    ``drop_malformed=True`` reproduces the reference's validator
    semantics: rows whose fields fail to parse into the declared types
    are dropped (the reference dropped them via try/except float parses;
    the header row died the same way — here ``header=True`` handles it
    explicitly). ``constraints`` are additional row predicates (e.g.
    ``col('address').startswith('0x')`` — F2/F3 analogs) ANDed as
    filters, which Catalyst pushes into the scan.
    """
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "DROPMALFORMED" if drop_malformed else "PERMISSIVE")
    )
    df = reader.csv(path)
    for c in constraints:
        df = df.filter(c)
    return df


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    drop_malformed: bool = True,
    constraints: Iterable[Column] = (),
) -> DataFrame:
    """JSON-lines scan with declared schema (reference S2 analog —
    ``sc.textFile`` + per-line ``json.loads`` at
    ``Codes/etherscams/etherscams.py:45-46``)."""
    reader = spark.read.schema(schema).option(
        "mode", "DROPMALFORMED" if drop_malformed else "PERMISSIVE"
    )
    df = reader.json(path)
    for c in constraints:
        df = df.filter(c)
    return df


def read_parquet_evolved(spark: SparkSession, path: str,
                         *paths: str) -> DataFrame:
    """Schema-evolution-tolerant parquet scan: ``mergeSchema`` unions the
    footer schemas across all input files/directories, so a column added
    mid-ingest surfaces as nullable for older files instead of failing
    the read. The per-file footer merge is a driver-side metadata
    operation — data files are still scanned once, with pruning intact.

    At 100TB ingest pipelines the schema WILL drift between landing
    batches; this is the read posture for derived-table directories that
    accumulated over months."""
    return spark.read.option("mergeSchema", "true").parquet(path, *paths)


def read_orc(spark: SparkSession, path: str,
             schema: StructType | None = None) -> DataFrame:
    """ORC scan (columnar sibling of the parquet path — same vectorized
    reader, predicate pushdown, and column pruning; Spark's ORC support
    is built in). Schema optional: ORC footers carry types."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def non_empty(col_name: str) -> Column:
    """F4-style non-empty-string constraint."""
    return F.col(col_name).isNotNull() & (F.col(col_name) != "")


def hex_prefixed(col_name: str) -> Column:
    """F2/F3-style '0x' prefix constraint."""
    return F.col(col_name).startswith("0x")


def parsed_ok(*col_names: str) -> Column:
    """F1-style 'these typed columns parsed' constraint: with a declared
    schema, a failed cast is a NULL — requiring non-null reproduces the
    reference's float()-try/except row drop for those fields."""
    pred = F.lit(True)
    for c in col_names:
        pred = pred & F.col(c).isNotNull()
    return pred
