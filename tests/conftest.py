from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from live_market_data_orderflow_analysis_big_data_project__spark import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
