from __future__ import annotations

import pytest

from splitserve_spark.registry import load_all
from tests.oracle_utils import SF_DIR, check_query

load_all()

NAMES = [
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "source_partitioned_parquet",
    "source_text_lines",
]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)


def test_jdbc_orc_api_surface(spark, tmp_path):
    """ORC write/read round-trips locally; JDBC reader accepts partition
    configuration (no driver jar in this container to execute against)."""
    from splitserve_spark.tables import Tables

    t = Tables(spark, SF_DIR)
    path = str(tmp_path / "orc")
    t.nation.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.count() == t.nation.count()

    reader = (
        spark.read.format("jdbc")
        .option("url", "jdbc:postgresql://example/db")
        .option("dbtable", "nation")
        .option("partitionColumn", "n_nationkey")
        .option("lowerBound", 0)
        .option("upperBound", 25)
        .option("numPartitions", 4)
    )
    assert reader is not None
