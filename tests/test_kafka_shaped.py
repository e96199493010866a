"""Contract tests for the broker-free Kafka-shaped streaming source.

These are StreamTest-style tests of the connector CONTRACT the
reference's Kafka source defines (KafkaSource.scala:84): per-partition
monotonic offsets, startingOffsets=earliest|latest, maxOffsetsPerTrigger
rate limiting, and exactly-once replay across a stop/restart.  If a real
spark-sql-kafka jar ever lands in this environment, these tests apply
to the connector unchanged (swap the format string).
"""

from __future__ import annotations

import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

from splitserve_spark.registry import load_all
from splitserve_spark.sources.kafka_shaped import (
    KAFKA_EPOCH,
    register_kafka_shaped,
)
from tests.oracle_utils import SF_DIR, check_query

load_all()


def test_oracle_match(spark):
    check_query(spark, "source_kafka_shaped", SF_DIR)


def _reader(spark, tmp_path, topic, **overrides):
    register_kafka_shaped(spark)
    opts = {
        "topic": topic,
        "brokerDir": str(tmp_path / "broker"),
        "numPartitions": "2",
        "logSize": "40",
        "logSkew": "0",
        "producePerPoll": "8",
        "maxOffsetsPerTrigger": "8",
        "startingOffsets": "earliest",
    }
    opts.update(overrides)
    return spark.readStream.format("kafka_shaped").options(**opts).load()


def _wait(predicate, timeout=90, interval=0.2):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return
        time.sleep(interval)
    raise TimeoutError("condition not reached")


def _sink_count(spark, path):
    """Rows visible through the file-sink commit log (uncommitted batch
    files are invisible — the exactly-once read path)."""
    try:
        return spark.read.parquet(path).count()
    except Exception:
        return 0  # no committed batch yet


def test_exactly_once_across_stop_restart(spark, tmp_path):
    """Stop the query mid-log, restart from the same checkpoint: every
    (partition, offset) must land in the file sink EXACTLY once — the
    replayed in-flight batch must dedup through the sink's commit log,
    and no offset may be skipped."""
    topic = f"t_restart_{uuid.uuid4().hex[:8]}"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    total = 2 * 40  # numPartitions * logSize

    def start():
        return (
            _reader(spark, tmp_path, topic)
            .selectExpr(
                "partition", "offset", "CAST(value AS STRING) AS value"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="100 milliseconds")
            .start()
        )

    q = start()
    try:
        # Interrupt after at least one committed batch, well before EOF
        # (8 records/trigger of 80 → plenty of room).
        _wait(lambda: 0 < _sink_count(spark, out) < total)
    finally:
        q.stop()
    mid = _sink_count(spark, out)
    assert 0 < mid < total, f"stop landed at {mid}/{total}"

    q2 = start()
    try:
        _wait(lambda: _sink_count(spark, out) >= total)
    finally:
        q2.stop()

    df = spark.read.parquet(out)
    assert df.count() == total, "lost or duplicated records across restart"
    assert df.select("partition", "offset").distinct().count() == total
    # Offsets are gapless per partition: 0..logSize-1.
    per_part = (
        df.groupBy("partition")
        .agg(
            F.count("*").alias("n"),
            F.min("offset").alias("lo"),
            F.max("offset").alias("hi"),
        )
        .collect()
    )
    assert len(per_part) == 2
    for r in per_part:
        assert (r.n, r.lo, r.hi) == (40, 0, 39)
    # Replayed content is byte-identical to the formula.
    row = df.filter("partition = 1 AND offset = 7").head()
    assert row.value == f"m|1|7|{(7 * 31 + 1) % 1000}"


def test_starting_offsets_latest_skips_backlog(spark, tmp_path):
    """startingOffsets=latest begins at the produced watermark as of
    query start: the pre-existing backlog never enters the stream."""
    topic = f"t_latest_{uuid.uuid4().hex[:8]}"
    name = f"k_latest_{os.getpid()}"
    backlog = 25
    stream = _reader(
        spark,
        tmp_path,
        topic,
        startingOffsets="latest",
        initialBacklog=str(backlog),
        maxOffsetsPerTrigger="20",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        expected = 2 * (40 - backlog)
        _wait(lambda: spark.table(name).count() >= expected)
    finally:
        q.stop()
    agg = spark.table(name).agg(
        F.min("offset").alias("lo"),
        F.max("offset").alias("hi"),
        F.count("*").alias("n"),
    ).head()
    assert agg.lo == backlog, "latest must skip the backlog entirely"
    assert (agg.hi, agg.n) == (39, 2 * (40 - backlog))


def test_max_offsets_per_trigger_caps_every_batch(spark, tmp_path):
    """No micro-batch may exceed maxOffsetsPerTrigger rows — including
    the first (Kafka's rate limit applies to the initial backlog too)."""
    topic = f"t_cap_{uuid.uuid4().hex[:8]}"
    name = f"k_cap_{os.getpid()}"
    stream = _reader(
        spark,
        tmp_path,
        topic,
        producePerPoll="40",  # whole log available immediately
        maxOffsetsPerTrigger="10",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        _wait(lambda: spark.table(name).count() >= 80)
        progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    finally:
        q.stop()
    assert progress, "no progress recorded"
    assert all(p["numInputRows"] <= 10 for p in progress), [
        p["numInputRows"] for p in progress
    ]
    # The cap forces a multi-batch drain: >= 80/10 non-empty batches.
    assert len(progress) >= 8


def test_kafka_schema_and_timestamps(spark, tmp_path):
    """Schema is Kafka's exactly; timestamps are CreateTime-style,
    derived from the offset."""
    topic = f"t_schema_{uuid.uuid4().hex[:8]}"
    name = f"k_schema_{os.getpid()}"
    stream = _reader(spark, tmp_path, topic, logSize="5", producePerPoll="5")
    assert [
        (f.name, f.dataType.simpleString()) for f in stream.schema.fields
    ] == [
        ("key", "binary"),
        ("value", "binary"),
        ("topic", "string"),
        ("partition", "int"),
        ("offset", "bigint"),
        ("timestamp", "timestamp"),
        ("timestampType", "int"),
    ]
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        _wait(lambda: spark.table(name).count() >= 10)
    finally:
        q.stop()
    row = spark.table(name).filter("partition = 0 AND offset = 3").head()
    assert row.topic == topic
    assert row.timestampType == 0
    from datetime import timedelta

    assert row.timestamp.replace(tzinfo=None) == KAFKA_EPOCH + timedelta(
        seconds=3
    )
    assert bytes(row.key) == b"k8"  # (3*7 + 0) % 13 = 8


# ---- offset-contract property tests (no JVM: the reader's offset
# bookkeeping is pure driver-side Python over a state file) -----------

from hypothesis import given, settings
from hypothesis import strategies as st

from splitserve_spark.sources.kafka_shaped import KafkaShapedStreamReader


def _mk_reader(tmpdir, **opts):
    base = {
        "topic": f"prop_{uuid.uuid4().hex[:8]}",
        "brokerDir": str(tmpdir),
        "numPartitions": "3",
        "logSize": "50",
        "logSkew": "5",
        "producePerPoll": "7",
        "startingOffsets": "earliest",
    }
    base.update({k: str(v) for k, v in opts.items()})
    return KafkaShapedStreamReader(None, base)


@settings(max_examples=60, deadline=None)
@given(
    per_poll=st.integers(min_value=1, max_value=200),
    cap=st.one_of(st.none(), st.integers(min_value=1, max_value=100)),
    polls=st.integers(min_value=1, max_value=40),
    backlog=st.integers(min_value=0, max_value=60),
)
def test_offset_stream_is_monotone_capped_and_draining(
    tmp_path_factory, per_poll, cap, polls, backlog
):
    """For ANY (producePerPoll, maxOffsetsPerTrigger, backlog): the
    per-partition end-offset sequence is monotone non-decreasing,
    never exceeds the log size, each step respects the per-partition
    rate cap, and enough polls drain every partition to its log end —
    the invariants KafkaSource's ReadLimit contract promises."""
    tmpdir = tmp_path_factory.mktemp("broker")
    opts = {"producePerPoll": per_poll, "initialBacklog": backlog}
    if cap is not None:
        opts["maxOffsetsPerTrigger"] = cap
    r = _mk_reader(tmpdir, **opts)
    sizes = {str(p): r._log_size(p) for p in range(r.n_parts)}
    prev = {p: int(o) for p, o in r.initialOffset().items()}
    for _ in range(polls):
        end = r.latestOffset()
        step_total = 0
        for p, o in end.items():
            assert prev[p] <= o <= sizes[p], (p, prev[p], o)
            step_total += o - prev[p]
            if cap is not None:
                # Per-partition allotment: floor(cap/n) + at most 1.
                assert o - prev[p] <= cap // r.n_parts + 1, (p, prev[p], o)
        if cap is not None:
            # The TOTAL batch never exceeds maxOffsetsPerTrigger —
            # including when cap < #partitions (the r9 review fix; a
            # flat per-partition floor shipped n rows under that cap).
            assert step_total <= cap, (step_total, cap)
        prev = dict(end)
    # Sufficient polls always drain the whole log, even when cap <
    # #partitions (backlog-ranked remainder assignment cannot starve
    # a partition forever).
    total = sum(sizes.values())
    per_poll_bound = min(per_poll, cap) if cap is not None else per_poll
    for _ in range((total // max(1, per_poll_bound)) + r.n_parts + 2):
        prev = r.latestOffset()
    assert prev == sizes, prev


@settings(max_examples=40, deadline=None)
@given(
    backlog=st.integers(min_value=0, max_value=80),
    polls=st.integers(min_value=0, max_value=5),
)
def test_latest_start_is_pinned_across_calls(
    tmp_path_factory, backlog, polls
):
    """startingOffsets=latest: the query start is frozen at the
    produced watermark of the FIRST contact with the topic — later
    initialOffset calls must return the same start even after
    production advances (the drift bug the pinning fixed)."""
    tmpdir = tmp_path_factory.mktemp("broker")
    r = _mk_reader(
        tmpdir, startingOffsets="latest", initialBacklog=backlog
    )
    first = r.initialOffset()
    expect = {
        str(p): min(backlog, r._log_size(p)) for p in range(r.n_parts)
    }
    assert first == expect
    for _ in range(polls):
        r.latestOffset()  # production advances
    assert r.initialOffset() == first
