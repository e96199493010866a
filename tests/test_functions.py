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


def test_hash_partitioning_oracle_and_spread(spark):
    check_query(spark, "fn_hash_partitioning", SF_DIR, strict=True)
    a = REGISTRY["fn_hash_partitioning"].fn(spark, SF_DIR).toPandas()
    assert a["murmur3"].nunique() > 20  # 25 nations, hashes spread


def test_pure_hash_spec_vectors_and_spark_parity(spark):
    """pure_hash must match (a) the published algorithm vectors —
    murmur3_x86_32 SMHasher empty-input vectors apply because Spark's
    byte-wise tail variant coincides with canonical murmur3 on 4-byte-
    aligned input — and (b) Spark bit-for-bit across every code path:
    aligned words, 1-3-byte tails (sign-extension), 4/8-byte xxh64
    tails, and the 32-byte stripe loop."""
    import zlib

    from pyspark.sql import functions as F

    from splitserve_spark.functions.pure_hash import murmur3_x86_32, xxhash64

    assert murmur3_x86_32(b"", 0) == 0
    assert murmur3_x86_32(b"", 1) == 0x514E28B7
    assert (xxhash64(b"", 0) & 0xFFFFFFFFFFFFFFFF) == 0xEF46DB3751D8E999
    strings = ["", "a", "ab", "abc", "abcd", "naïve", "東京",
               "x" * 33, "ï" * 7, "The quick brown fox"]
    rows = (
        spark.createDataFrame([(s,) for s in strings], "s string")
        .select(
            "s",
            F.hash("s").alias("m3"),
            F.xxhash64("s").alias("xx"),
            F.crc32(F.col("s").cast("binary")).alias("crc"),
        )
        .collect()
    )
    for row in rows:
        b = row["s"].encode()
        assert row["m3"] == murmur3_x86_32(b), row["s"]
        assert row["xx"] == xxhash64(b), row["s"]
        assert row["crc"] == zlib.crc32(b), row["s"]


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
