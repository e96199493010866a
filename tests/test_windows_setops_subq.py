from __future__ import annotations

import pytest

from splitserve_spark.registry import REGISTRY, load_all
from tests.oracle_utils import SF_DIR, check_query

load_all()

NAMES = [n for n, s in REGISTRY.items()
         if n.startswith(("window_", "setop_", "subq_"))]


@pytest.mark.parametrize("name", sorted(NAMES))
def test_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)
