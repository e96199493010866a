from __future__ import annotations

import pytest

from splitserve_spark.registry import REGISTRY, load_all
from tests.oracle_utils import SF_DIR, check_query

load_all()

# Select by module, not by hand-maintained list (r6 advice pattern):
# every tpcds_paper query is oracled, so new shapes are auto-covered.
QDS = sorted(
    n
    for n, s in REGISTRY.items()
    if s.fn.__module__ == "splitserve_spark.operators.tpcds_paper"
)


@pytest.mark.parametrize("name", QDS)
def test_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)


@pytest.mark.parametrize("name", QDS)
def test_nonempty_at_oracle_sf(spark, name):
    df = REGISTRY[name].fn(spark, "/root/testdata/sf0.01")
    assert df.count() >= 1
