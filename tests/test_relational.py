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
    """Raw SampleExec semantics (seed determinism + rate band) on the
    live API, plus the registered query's invariant row — the query
    now emits (n_population, rate_within_3pct, sample_is_subset)
    value-checked by the oracle."""
    from splitserve_spark.registry import REGISTRY
    from splitserve_spark.tables import Tables

    t = Tables(spark, SF_DIR)
    a = t.lineitem.sample(False, 0.1, seed=42).toPandas()
    b = t.lineitem.sample(False, 0.1, seed=42).toPandas()
    # Same seed → same sample.
    assert a.equals(b)
    # Fraction in a sane band around 10%.
    total = t.lineitem.count()
    assert 0.04 * total < len(a) < 0.2 * total

    row = REGISTRY["sample_bernoulli"].fn(spark, SF_DIR).toPandas().iloc[0]
    assert row["n_population"] == total
    assert bool(row["rate_within_3pct"]) and bool(row["sample_is_subset"])
