from __future__ import annotations

import pytest

from splitserve_spark.operators.temporal_joins import asof_join_merge_asof
from splitserve_spark.registry import REGISTRY, load_all
from tests.oracle_utils import SF_DIR, check_query

load_all()


@pytest.mark.parametrize(
    "name", ["asof_join_events_orders", "range_join_price_bands"]
)
def test_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)


def test_asof_implementations_agree(spark):
    """union+window and cogroup+merge_asof must return identical rows
    (the §5 plan-variant property test applied to a custom operator)."""
    a = REGISTRY["asof_join_events_orders"].fn(spark, SF_DIR).toPandas()
    b = asof_join_merge_asof(spark, SF_DIR).toPandas()
    assert a.equals(b)
    assert len(a) > 0


def test_asof_semantics_edge_cases(spark):
    """Order exactly at event time is visible (>=); events before any
    order get NULL."""
    import pandas as pd

    a = REGISTRY["asof_join_events_orders"].fn(spark, SF_DIR).toPandas()
    with_match = a[a["asof_orderdate"].notna()]
    # every matched order is at-or-before its event
    assert (with_match["asof_orderdate"] <= with_match["ts"]).all()


def test_range_join_is_equi_not_nested_loop(spark):
    """The bin-bucketed range join must plan as a hash/broadcast EQUI
    join on the bin key — not BroadcastNestedLoopJoin."""
    from splitserve_spark.plans.inspect import physical_plan

    df = REGISTRY["range_join_price_bands"].fn(spark, SF_DIR)
    plan = physical_plan(df, mode="simple")
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan), plan
