"""Bucketed co-located joins: the join itself must plan with ZERO
shuffles (both sides pre-partitioned by the join key at write time)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from conftest import SF_SMALL

from bigdata_processing_spark.catalog import load_table
from bigdata_processing_spark.operators.bucketing import bucketed_join, write_bucketed
from bigdata_processing_spark.plans import explain_str, shuffle_count


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    write_bucketed(
        load_table(spark, SF_SMALL, "orders"), "b_orders", "o_orderkey", n_buckets=4
    )
    write_bucketed(
        load_table(spark, SF_SMALL, "lineitem"), "b_lineitem", "l_orderkey", n_buckets=4
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey")
    assert shuffle_count(joined) == 0, explain_str(joined)[:600]


def test_bucketed_join_correct(spark, bucketed_tables):
    joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey")
    got = joined.agg(
        F.count("*").alias("n"), F.sum("l_extendedprice").alias("s")
    ).collect()[0]
    orders = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    want = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .agg(F.count("*").alias("n"), F.sum("l_extendedprice").alias("s"))
        .collect()[0]
    )
    assert got.n == want.n
    assert abs(got.s - want.s) < 1e-6 * abs(want.s)


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join over raw parquet requires exchanges."""
    orders = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(li, orders.o_orderkey == li.l_orderkey)
        assert shuffle_count(joined) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")