from __future__ import annotations

import json
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from splitserve_spark.registry import load_all
from splitserve_spark.streaming.windows import (
    run_stream_to_memory,
    stream_tumbling_counts,
)
from splitserve_spark.tables import Tables
from tests.oracle_utils import SF_DIR, check_query

load_all()

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


@pytest.mark.parametrize("name", ["stream_window_tumbling", "stream_window_sliding"])
def test_window_semantics_oracle(spark, name):
    check_query(spark, name, SF_DIR)


@pytest.fixture()
def event_json_dir(spark):
    """events table replayed as two JSON batches (out-of-order tail)."""
    d = tempfile.mkdtemp(prefix="ss_stream_")
    rows = (
        Tables(spark, SF_DIR)
        .events.select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        .orderBy("event_id")
        .collect()
    )
    mid = len(rows) // 2
    for i, chunk in enumerate((rows[:mid], rows[mid:])):
        with open(f"{d}/batch{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps(r.asDict()) + "\n")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_matches_batch(spark, event_json_dir):
    """Micro-batch streaming aggregation == the same aggregation run as
    a plain batch query (the batch-vs-stream oracle from FIXTURES.md)."""
    sdf = stream_tumbling_counts(spark, event_json_dir, EVENT_SCHEMA)
    run_stream_to_memory(sdf, "tumbling_test", output_mode="complete")
    got = (
        spark.table("tumbling_test")
        .orderBy("wstart", "event_type")
        .toPandas()
    )
    expected = (
        spark.read.schema(EVENT_SCHEMA)
        .json(event_json_dir)
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("wstart"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("wstart", "event_type")
        .toPandas()
    )
    assert got.equals(expected)


def test_stream_append_mode_with_watermark(spark, event_json_dir):
    """Append mode emits only watermark-finalized windows; every emitted
    row must agree with the batch result."""
    sdf = stream_tumbling_counts(spark, event_json_dir, EVENT_SCHEMA, "10 minutes")
    run_stream_to_memory(sdf, "append_test", output_mode="append")
    got = spark.table("append_test").toPandas()
    expected = (
        spark.read.schema(EVENT_SCHEMA)
        .json(event_json_dir)
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("wstart"),
            "event_type",
            "n_events",
            "total_value",
        )
        .toPandas()
    )
    merged = got.merge(
        expected, on=["wstart", "event_type"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(got)  # every emitted window exists in batch
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    assert (abs(merged["total_value_s"] - merged["total_value_b"]) < 1e-9).all()


def test_stream_is_streaming_flag(spark, event_json_dir):
    sdf = stream_tumbling_counts(spark, event_json_dir, EVENT_SCHEMA)
    assert sdf.isStreaming
