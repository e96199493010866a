from __future__ import annotations

import math

import pytest

from splitserve_spark.registry import REGISTRY, load_all
from tests.oracle_utils import SF_DIR, check_query

load_all()

ORACLE_CHECKED = [
    "rdd_wordcount",
    "rdd_aggregate_by_key",
    "rdd_join_cogroup",
    "rdd_sort_zip_index",
    "rdd_broadcast_accumulator",
    "rdd_tree_aggregate",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)


def test_pi_estimate(spark):
    est = REGISTRY["workload_pi_rdd"].fn(spark, SF_DIR).collect()[0]["pi_estimate"]
    assert abs(est - math.pi) < 0.05


def test_rdd_misc_ops(spark):
    """Smoke the broader §2.11 method list on a small RDD."""
    sc = spark.sparkContext
    r = sc.parallelize(range(100), 4)
    assert r.map(lambda x: x * 2).sum() == 9900
    assert r.filter(lambda x: x % 2 == 0).count() == 50
    assert r.takeOrdered(3) == [0, 1, 2]
    assert r.top(2) == [99, 98]
    assert r.glom().count() == 4
    assert sorted(r.distinct().collect())[:5] == [0, 1, 2, 3, 4]
    assert r.zipWithUniqueId().count() == 100
    stats = r.stats()
    assert stats.count() == 100 and abs(stats.mean() - 49.5) < 1e-9
    hist = r.histogram([0, 50, 100])
    assert hist[1] == [50, 50]
    pairs = sc.parallelize([("a", 1), ("b", 2), ("a", 3)])
    assert dict(pairs.groupByKey().mapValues(list).collect())["a"] == [1, 3]
    assert dict(pairs.foldByKey(0, lambda a, b: a + b).collect()) == {"a": 4, "b": 2}
    other = sc.parallelize([("a", "x")])
    assert pairs.leftOuterJoin(other).count() == 3
    assert pairs.subtractByKey(other).keys().distinct().collect() == ["b"]
    assert r.coalesce(2).getNumPartitions() == 2
    assert r.repartition(8).getNumPartitions() == 8
    assert sc.parallelize([1, 2, 3]).cartesian(sc.parallelize([4])).count() == 3
