from __future__ import annotations

import pytest

from splitserve_spark.registry import load_all
from tests.oracle_utils import SF_DIR, check_query

load_all()

JOINS = [
    "q3_shipping_priority",
    "q5_region_revenue",
    "join_sort_merge_fact_fact",
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_left_semi",
    "join_left_anti",
    "join_cross",
    "join_non_equi",
    "join_using_key",
    "join_self",
    "join_null_safe",
    "join_lateral_topn",
]


@pytest.mark.parametrize("name", JOINS)
def test_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)
