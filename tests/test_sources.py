"""Sources/sinks: validator-parity CSV/JSON readers, distributed writers.

Mirrors the reference's drop-bad-lines semantics (SURVEY.md §2.2):
arity/type failures drop the row; the header dies the same way; prefix
and non-empty constraints filter like the hand-written validators.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bigdata_processing_spark.sources import (
    read_csv,
    read_json,
    write_csv,
    write_json,
    write_parquet,
)
from bigdata_processing_spark.sources.readers import hex_prefixed, non_empty, parsed_ok

SCHEMA = StructType(
    [
        StructField("addr", StringType()),
        StructField("value", DoubleType()),
        StructField("block", LongType()),
    ]
)


def _write(tmp_path, name, lines):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    return p


def test_csv_drops_malformed_and_header(spark, tmp_path):
    # header + 2 good rows + bad-float row + bad-arity row
    path = _write(
        tmp_path,
        "txns.csv",
        [
            "addr,value,block",
            "0xabc,1.5,100",
            "0xdef,2.5,101",
            "0xbad,notafloat,102",
            "toofewfields",
        ],
    )
    df = read_csv(spark, path, SCHEMA, header=True,
                  constraints=[parsed_ok("value", "block")])
    rows = sorted((r.addr, r.value) for r in df.collect())
    assert rows == [("0xabc", 1.5), ("0xdef", 2.5)]


def test_csv_prefix_constraint(spark, tmp_path):
    path = _write(
        tmp_path,
        "c.csv",
        ["addr,value,block", "0xok,1.0,1", "nothex,2.0,2", ",3.0,3"],
    )
    df = read_csv(spark, path, SCHEMA, constraints=[hex_prefixed("addr"), non_empty("addr")])
    assert [r.addr for r in df.collect()] == ["0xok"]


def test_json_reader_with_schema(spark, tmp_path):
    path = _write(
        tmp_path,
        "d.json",
        ['{"addr": "0x1", "value": 5.0, "block": 7}', "{bad json", '{"addr": "0x2"}'],
    )
    df = read_json(spark, path, SCHEMA)
    rows = {r.addr: (r.value, r.block) for r in df.collect()}
    assert rows["0x1"] == (5.0, 7)
    assert rows["0x2"] == (None, None)  # missing fields → null, row kept
    assert len(rows) == 2  # malformed line dropped


def test_write_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    out = os.path.join(str(tmp_path), "out_json")
    write_json(df, out, single_file=True)
    back = spark.read.json(out)
    assert sorted((r.k, r.v) for r in back.collect()) == [("a", 1), ("b", 2)]
    # single_file=True → exactly one part file (the reference's blob shape)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1


def test_write_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("a", 1.5)], ["k", "v"])
    out = os.path.join(str(tmp_path), "out_csv")
    write_csv(df, out, single_file=True)
    back = spark.read.option("header", "true").csv(out)
    r = back.collect()[0]
    assert (r.k, float(r.v)) == ("a", 1.5)


def test_orc_roundtrip(spark, tmp_path):
    from bigdata_processing_spark.sources import write_orc

    df = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    out = os.path.join(str(tmp_path), "out_orc")
    write_orc(df, out)
    back = spark.read.orc(out)
    assert sorted((r.k, r.v) for r in back.collect()) == [("a", 1), ("b", 2)]


def test_avro_gated(spark, tmp_path):
    """spark-avro isn't on this classpath — the writer must fail with a
    clear NotImplementedError, not a raw classpath stack."""
    import pytest

    from bigdata_processing_spark.sources import write_avro

    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    with pytest.raises(NotImplementedError, match="spark-avro"):
        write_avro(df, os.path.join(str(tmp_path), "out_avro"))


def test_write_parquet_partitioned(spark, tmp_path):
    df = spark.createDataFrame([("x", 1), ("y", 2), ("x", 3)], ["part", "v"])
    out = os.path.join(str(tmp_path), "out_pq")
    write_parquet(df, out, partition_by=("part",))
    assert os.path.isdir(os.path.join(out, "part=x"))
    back = spark.read.parquet(out)
    # partition pruning: scanning part=x must not read part=y files
    pruned = back.filter(F.col("part") == "x")
    assert pruned.count() == 2


def test_write_sorted_parquet_layout(spark, tmp_path):
    """Range-partitioned + sorted write: files own disjoint key ranges
    (parquet footer min/max verified via pyarrow) and a selective key
    predicate scans fewer rows than the table holds."""
    import glob

    import pyarrow.parquet as pq

    from bigdata_processing_spark.sources import write_sorted_parquet
    from bigdata_processing_spark.catalog import load_table

    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    out = os.path.join(str(tmp_path), "orders_sorted")
    write_sorted_parquet(orders, out, ("o_custkey",), n_files=4)

    files = sorted(glob.glob(os.path.join(out, "*.parquet")))
    assert len(files) == 4
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["o_custkey"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    # disjoint file ranges — the skip-whole-files guarantee
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges

    # a point-range predicate must keep correct semantics over the layout
    back = spark.read.parquet(out)
    key_lo, key_hi = ranges[0]
    n_band = back.filter(F.col("o_custkey").between(key_lo, key_hi)).count()
    n_exact = orders.filter(F.col("o_custkey").between(key_lo, key_hi)).count()
    assert n_band == n_exact


def test_read_parquet_evolved_merges_schemas(spark, tmp_path):
    """A column added mid-ingest must surface as nullable for older
    files, values preserved per-file, codec choice respected."""
    from bigdata_processing_spark.sources import read_parquet_evolved, write_parquet

    old = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    new = spark.createDataFrame([(3, "c", 3.5)], ["id", "v", "score"])
    root = os.path.join(str(tmp_path), "evolving")
    write_parquet(old, os.path.join(root, "batch=0"), compression="zstd")
    write_parquet(new, os.path.join(root, "batch=1"), compression="zstd")

    merged = read_parquet_evolved(
        spark, os.path.join(root, "batch=0"), os.path.join(root, "batch=1")
    )
    assert set(merged.columns) == {"id", "v", "score"}
    rows = {r.id: (r.v, r.score) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 3.5)}

    # codec really applied (footer-level check via pyarrow)
    import glob

    import pyarrow.parquet as pq

    mds = [pq.ParquetFile(f).metadata
           for f in glob.glob(os.path.join(root, "batch=1", "*.parquet"))]
    md = next(m for m in mds if m.num_rows > 0)
    assert md.row_group(0).column(0).compression.lower() == "zstd"


def test_orc_roundtrip(spark, tmp_path):
    """write_orc → read_orc preserves rows and types; the ORC scan
    pushes filters like the parquet path."""
    import os

    from bigdata_processing_spark.plans import has_pushed_filters
    from bigdata_processing_spark.sources import read_orc, write_orc

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)], "id bigint, s string, v double"
    )
    path = os.path.join(str(tmp_path), "orc_out")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert dict(back.dtypes) == dict(df.dtypes)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    assert has_pushed_filters(back.filter(F.col("id") > 1))
