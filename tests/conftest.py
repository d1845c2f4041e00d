from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

SF_SMALL = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from big_data_management_and_analytics_spark.sources.session import get_spark

    s = get_spark("pytest")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def registry():
    import big_data_management_and_analytics_spark as engine

    engine.load_all()
    return engine.all_queries()
