"""Oracle tests for the modern-SQL surface operators.

Selection is by module, not a hand list (the r6 advice pattern the
tpcds suite uses): every operators/modern_sql.py registration is
oracled, so new surfaces (scripting, SQL UDFs, IDENTIFIER/params,
table functions) are auto-covered the day they land.
"""

from __future__ import annotations

import pytest

from splitserve_spark.registry import REGISTRY, load_all
from tests.oracle_utils import SF_DIR, check_query

load_all()

MODERN = sorted(
    n
    for n, s in REGISTRY.items()
    if s.fn.__module__ == "splitserve_spark.operators.modern_sql"
)


def test_module_is_covered():
    assert len(MODERN) >= 9  # grows as surfaces land; never shrinks


@pytest.mark.parametrize("name", MODERN)
def test_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)
