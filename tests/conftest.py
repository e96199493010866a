from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from splitserve_spark.session import get_session

    spark = get_session("splitserve-tests", shuffle_partitions=4)
    yield spark
    spark.stop()
