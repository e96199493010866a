from __future__ import annotations

import pytest

from splitserve_spark.registry import load_all
from tests.oracle_utils import SF_DIR, check_query

load_all()

RELATIONAL = [
    "q1_pricing_summary",
    "project_filter",
    "topk_orders",
    "global_sort_nulls",
    "distinct_values",
    "drop_duplicates_subset",
    "range_generator",
    "union_inline_table",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)


def test_sample_deterministic_subset(spark):
    from splitserve_spark.registry import REGISTRY

    fn = REGISTRY["sample_bernoulli"].fn
    a = fn(spark, SF_DIR).toPandas()
    b = fn(spark, SF_DIR).toPandas()
    # Same seed → same sample.
    assert a.equals(b)
    # Fraction in a sane band around 10%.
    from splitserve_spark.tables import Tables

    total = Tables(spark, SF_DIR).lineitem.count()
    assert 0.04 * total < len(a) < 0.2 * total
