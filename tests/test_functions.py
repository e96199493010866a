from __future__ import annotations

import pytest

from splitserve_spark.registry import REGISTRY, load_all
from tests.oracle_utils import SF_DIR, check_query

load_all()

FN_NAMES = sorted(
    n for n, s in REGISTRY.items() if n.startswith("fn_") and s.oracle is not None
)


@pytest.mark.parametrize("name", FN_NAMES)
def test_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)


def test_hash_partitioning_deterministic(spark):
    fn = REGISTRY["fn_hash_partitioning"].fn
    a = fn(spark, SF_DIR).drop("pid").toPandas()
    b = fn(spark, SF_DIR).drop("pid").toPandas()
    assert a.equals(b)
    assert a["murmur3"].nunique() > 20  # 25 nations, hashes spread
