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
