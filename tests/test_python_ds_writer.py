"""Two-phase-commit contract tests for the Python DataSource batch
writer (`sources/python_ds.py` ShardSinkDataSource).

The visibility rule under test is the file-commit-protocol one: data
becomes visible ONLY through commit (staged shards moved + manifest
written); a failed job aborts and the publish directory never changes.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from splitserve_spark.registry import load_all
from splitserve_spark.sources.python_ds import register_shard_sink
from tests.oracle_utils import SF_DIR, check_query

load_all()


def test_oracle_match(spark):
    check_query(spark, "sink_python_datasource", SF_DIR)


def test_commit_publishes_manifest_gated_shards(spark, tmp_path):
    register_shard_sink(spark)
    out = str(tmp_path / "pub")
    os.makedirs(out)
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("bucket")
    ).repartition(4)
    (
        df.write.format("shard_sink").mode("append")
        .option("path", out).save()
    )
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    assert manifest["total_rows"] == 1000
    assert len(manifest["shards"]) == 4
    files = sorted(
        f for f in os.listdir(out) if f.endswith(".parquet")
    )
    assert files == sorted(s["file"] for s in manifest["shards"])
    assert not os.path.exists(os.path.join(out, "_staging"))
    back = spark.read.parquet(
        *[os.path.join(out, f) for f in files]
    )
    assert back.count() == 1000
    assert back.agg(F.sum("id")).head()[0] == 999 * 1000 // 2


def test_abort_publishes_nothing(spark, tmp_path):
    """A task failure mid-write must leave the publish dir untouched:
    no manifest, no visible shards — failed-attempt files stay in (or
    are swept from) staging, never published."""
    register_shard_sink(spark)
    out = str(tmp_path / "pub")
    os.makedirs(out)

    @F.udf("long")
    def poison(v):
        if v == 666:
            raise ValueError("poisoned row")
        return v

    df = spark.range(0, 1000).select(
        poison(F.col("id")).alias("id")
    ).repartition(4)
    with pytest.raises(Exception):
        (
            df.write.format("shard_sink").mode("append")
            .option("path", out).save()
        )
    published = [
        f for f in os.listdir(out)
        if f.endswith(".parquet") or f == "_MANIFEST.json"
    ]
    assert published == [], published
