"""Every registered query vs its DuckDB oracle at sf0.001 (fast gate;
the driver runs the same contract at sf0.01)."""

from __future__ import annotations

import pytest

from conftest import SF_SMALL
from oracle_harness import compare

from bigdata_processing_spark.queries import all_oracles, all_queries

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, name):
    df = _QUERIES[name](spark, SF_SMALL)
    if name in _ORACLES:
        problems = compare(df, SF_SMALL, _ORACLES[name])
        assert not problems, f"{name}: {problems[:5]}"
    else:
        # rows-only contract for non-SQL-expressible ops
        assert df.count() >= 0
        assert df.columns


def test_every_oracle_has_a_query():
    assert set(_ORACLES) <= set(_QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_timestamp_queries_are_session_tz_independent(spark):
    """The driver harness builds its own SparkSession with whatever
    timezone the host has. The NTZ end-to-end design makes every
    timestamp-touching query's result independent of
    spark.sql.session.timeZone — assert it by re-running the
    timestamp-heavy queries under a shifted zone."""
    names = ["monthly_orders", "session_windows_30m", "rolling_1h_stats",
             "date_functions", "tumbling_window_6h", "asof_purchase_last_view"]
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        for n in names:
            problems = compare(_QUERIES[n](spark, SF_SMALL), SF_SMALL, _ORACLES[n])
            assert not problems, f"{n}: {problems[:3]}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
