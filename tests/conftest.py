from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from bigdata_processing_spark.session import get_spark

    s = get_spark("tests", master="local[8]", extra_conf={
        "spark.sql.shuffle.partitions": "8",
    })
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
