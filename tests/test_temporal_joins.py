from __future__ import annotations

import pytest

from splitserve_spark.operators.temporal_joins import asof_join_merge_asof
from splitserve_spark.registry import REGISTRY, load_all
from tests.oracle_utils import SF_DIR, check_query

load_all()


@pytest.mark.parametrize(
    "name", ["asof_join_events_orders", "range_join_price_bands",
             "pit_feature_join"]
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


def test_pit_semantics_leakage_ttl_ties(spark):
    """PIT correctness on a hand-built timeline: (a) no label leakage —
    a feature dated one microsecond AFTER the example is invisible;
    (b) inclusive as-of — a feature at exactly the example time IS
    visible; (c) staleness TTL — a feature older than the TTL yields
    NULL, not the stale value; (d) tie-break — among same-timestamp
    features the highest feature id wins."""
    from pyspark.sql import functions as F

    from splitserve_spark.operators.temporal_joins import _pit_attach

    ex = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 12:00:00"),   # feature 1 µs later: leak test
            (2, 20, "2024-01-01 12:00:00"),   # feature exactly at ts
            (3, 30, "2024-01-01 12:00:00"),   # feature 2h+1µs old: stale
            (4, 40, "2024-01-01 12:00:00"),   # two features, same ts
            (5, 50, "2024-01-01 12:00:00"),   # no feature at all
            (6, 60, "2024-01-01 12:00:00"),   # newest feature value NULL
        ],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    feats = spark.createDataFrame(
        [
            (10, "2024-01-01 12:00:00.000001", 111.0, 1),
            (20, "2024-01-01 12:00:00", 222.0, 2),
            (30, "2024-01-01 09:59:59.999999", 333.0, 3),
            (40, "2024-01-01 11:00:00", 401.0, 4),
            (40, "2024-01-01 11:00:00", 402.0, 5),
            (60, "2024-01-01 11:00:00", 600.0, 6),
            (60, "2024-01-01 11:30:00", None, 7),
        ],
        "user_id long, _fts string, _fval double, _fid long",
    ).withColumn("_fts", F.col("_fts").cast("timestamp"))
    got = {
        r.event_id: r.f
        for r in _pit_attach(ex, feats, "user_id", "f", ttl="2 HOURS")
        .collect()
    }
    assert got[1] is None          # future feature must not leak
    assert got[2] == 222.0         # at-or-before is inclusive
    assert got[3] is None          # 2h TTL expired by 1 µs
    assert got[4] == 402.0         # same-ts tie -> highest _fid
    assert got[5] is None          # never-seen entity
    # The newest feature wins even when its VALUE is null — the row
    # carries, not the last non-null value (oracle LIMIT 1 parity).
    assert got[6] is None
    # Without a TTL the stale feature IS served (profile semantics).
    got_no_ttl = {
        r.event_id: r.f
        for r in _pit_attach(ex, feats, "user_id", "f").collect()
    }
    assert got_no_ttl[3] == 333.0
    assert got_no_ttl[6] is None   # fresh NULL shadows older 600.0


def test_pit_single_shuffle_per_feature_table(spark):
    """Scale gate: the two-feature PIT plan must contain exactly the
    per-feature-table window shuffles (2) plus the final presentation
    sort (1) — three exchanges total — and no join operator at all, so
    examples are never fanned out through a range join and no extra
    repartition sneaks in."""
    from splitserve_spark.plans.inspect import count_exchanges, physical_plan

    df = REGISTRY["pit_feature_join"].fn(spark, SF_DIR)
    plan = physical_plan(df)
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan
    assert count_exchanges(df) <= 3, plan


def test_pit_matches_bruteforce_on_random_timeline(spark):
    """Equivalence against a pure-Python reference on a seeded random
    timeline (500 feature rows / 200 examples / 40 entities, ~27% NULL
    feature values, duplicate timestamps forced by second-granularity
    draws): for every example the reference scans its entity's feature
    list for the newest at-or-before row (ties: highest id), applies
    the TTL, and must agree with the union+window result exactly."""
    import random
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from splitserve_spark.operators.temporal_joins import _pit_attach

    rng = random.Random(11)
    base = datetime(2024, 1, 1)
    feats = [
        (
            rng.randrange(40),
            base + timedelta(seconds=rng.randrange(0, 36000)),
            None if rng.random() < 0.27 else round(rng.uniform(0, 100), 3),
            i,
        )
        for i in range(500)
    ]
    exs = [
        (i, rng.randrange(40), base + timedelta(seconds=rng.randrange(0, 36000)))
        for i in range(200)
    ]
    ttl = timedelta(hours=1)

    def reference(uid, ts):
        cands = [
            (fts, fid, fval)
            for (fuid, fts, fval, fid) in feats
            if fuid == uid and fts <= ts
        ]
        if not cands:
            return None
        fts, _, fval = max(cands)  # newest ts, then highest id
        return fval if ts - fts <= ttl else None

    ex_df = spark.createDataFrame(exs, "event_id long, user_id long, ts timestamp")
    f_df = spark.createDataFrame(
        feats, "user_id long, _fts timestamp, _fval double, _fid long"
    )
    got = {
        r.event_id: r.f
        for r in _pit_attach(ex_df, f_df, "user_id", "f", ttl="1 HOURS")
        .collect()
    }
    assert len(got) == 200
    for eid, uid, ts in exs:
        assert got[eid] == reference(uid, ts), (
            eid, uid, ts, got[eid], reference(uid, ts)
        )
