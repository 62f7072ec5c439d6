"""Python UDTF registration + semantics (table-valued function surface)."""

from __future__ import annotations

from bigdata_processing_spark.functions.udtfs import register_udtfs


def test_udtf_lateral_join(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None)], "id int, txt string"
    ).createOrReplaceTempView("t_udtf_in")
    rows = spark.sql(
        "SELECT id, token, pos FROM t_udtf_in, LATERAL tokenize(txt) ORDER BY id, pos"
    ).collect()
    assert [(r.id, r.token, r.pos) for r in rows] == [
        (1, "a", 0), (1, "b", 1), (1, "c", 2)
    ]


def test_udtf_direct_call(spark):
    register_udtfs(spark)
    out = spark.sql("SELECT * FROM tokenize('x  y')").collect()
    assert [(r.token, r.pos) for r in out] == [("x", 0), ("y", 1)]
