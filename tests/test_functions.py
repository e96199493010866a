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


def test_explode_outer_keeps_empty_rows(spark):
    """explode_outer / posexplode_outer emit a NULL row for empty arrays
    (reference GenerateExec outer flag, SQL LATERAL VIEW OUTER)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [10, 20]), (2, []), (3, None)], "id int, xs array<int>"
    )
    outer = df.select("id", F.explode_outer("xs").alias("x")).collect()
    assert [(r["id"], r["x"]) for r in outer] == [(1, 10), (1, 20), (2, None), (3, None)]
    inner = df.select("id", F.explode("xs").alias("x")).collect()
    assert [(r["id"], r["x"]) for r in inner] == [(1, 10), (1, 20)]
    pos = df.select("id", F.posexplode_outer("xs")).collect()
    assert len(pos) == 4


def test_sql_table_valued_function(spark):
    """range(...) in SQL FROM position (ResolveTableValuedFunctions)."""
    rows = spark.sql(
        "SELECT id, id * id AS sq FROM range(5, 8) ORDER BY id"
    ).collect()
    assert [(r["id"], r["sq"]) for r in rows] == [(5, 25), (6, 36), (7, 49)]


def test_lateral_view_sql(spark):
    """LATERAL VIEW [OUTER] explode in SQL (SqlBase.g4:389 surface)."""
    spark.createDataFrame(
        [(1, [10, 20]), (2, [])], "id int, xs array<int>"
    ).createOrReplaceTempView("lv_t")
    rows = spark.sql(
        "SELECT id, x FROM lv_t LATERAL VIEW OUTER explode(xs) t AS x ORDER BY id, x"
    ).collect()
    assert [(r["id"], r["x"]) for r in rows] == [(1, 10), (1, 20), (2, None)]


def test_na_replace(spark):
    """df.na.replace (DataFrameNaFunctions.replace, SURVEY.md §2.2)."""
    df = spark.createDataFrame(
        [("UNKNOWN", 1.0), ("ok", -999.0), ("fine", 2.0)], "s string, x double"
    )
    out = df.na.replace({"UNKNOWN": None}, subset=["s"]).na.replace(
        [-999.0], [float("nan")], subset=["x"]
    )
    rows = out.collect()
    assert rows[0]["s"] is None
    import math

    assert math.isnan(rows[1]["x"])
    assert rows[2] == ("fine", 2.0)
