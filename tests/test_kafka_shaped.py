"""Contract tests for the broker-free Kafka-shaped streaming source.

These are StreamTest-style tests of the connector CONTRACT the
reference's Kafka source defines (KafkaSource.scala:84): per-partition
monotonic offsets, startingOffsets=earliest|latest, maxOffsetsPerTrigger
rate limiting, and exactly-once replay across a stop/restart.  If a real
spark-sql-kafka jar ever lands in this environment, these tests apply
to the connector unchanged (swap the format string).
"""

from __future__ import annotations

import json
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
    # A None override DELETES a default (e.g. maxOffsetsPerTrigger=None
    # for an uncapped drain) — Spark options must be strings.
    opts = {k: v for k, v in opts.items() if v is not None}
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
        # The sink count becomes visible slightly BEFORE the last
        # batch's StreamingQueryProgress is published; wait for the
        # progress stream to catch up or the batch tally reads one
        # short (seen as a 7x10 < 80 flake under host load).
        _wait(lambda: sum(p["numInputRows"] for p in q.recentProgress) >= 80)
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


# ---- per-partition JSON startingOffsets + failOnDataLoss (r10) -------

from splitserve_spark.sources.kafka_shaped import (
    KJ_LOG_START,
    KJ_STARTING,
    _kj_effective_start,
)


def test_oracle_match_json_offsets(spark):
    check_query(spark, "source_kafka_json_offsets", SF_DIR)


def test_json_starting_offsets_resolution(spark, tmp_path):
    """JSON form resolves -1 to the pinned produced watermark and an
    explicit offset to itself — each partition independently."""
    topic = f"t_json_{uuid.uuid4().hex[:8]}"
    name = f"k_json_{os.getpid()}"
    stream = _reader(
        spark,
        tmp_path,
        topic,
        startingOffsets='{"0": -1, "1": 5}',
        initialBacklog="10",
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
        expected = (40 - 10) + (40 - 5)
        _wait(lambda: spark.table(name).count() >= expected)
    finally:
        q.stop()
    per = {
        r.partition: (r.lo, r.hi, r.n)
        for r in spark.table(name)
        .groupBy("partition")
        .agg(
            F.min("offset").alias("lo"),
            F.max("offset").alias("hi"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert per[0] == (10, 39, 30), "-1 must start at the produced watermark"
    assert per[1] == (5, 39, 35), "explicit offset must start exactly there"


def test_explicit_start_above_produced_watermark_is_honoured(
    spark, tmp_path
):
    """An explicit JSON startingOffsets ABOVE the first-poll produced
    watermark (start 10, producePerPoll 7) must never admit offsets
    below the request: latestOffset clamps each batch end up to the
    explicit start, so the engine sees empty batches until production
    reaches it.  Without the clamp, the first batch commits end=7 as
    the next start and partition 0 silently consumes offsets 7-9 in
    violation of the startingOffsets contract."""
    topic = f"t_clamp_{uuid.uuid4().hex[:8]}"
    name = f"k_clamp_{os.getpid()}"
    stream = _reader(
        spark,
        tmp_path,
        topic,
        startingOffsets='{"0": 10, "1": 0}',
        producePerPoll="7",
        maxOffsetsPerTrigger=None,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        expected = (40 - 10) + 40
        _wait(lambda: spark.table(name).count() >= expected)
    finally:
        q.stop()
    per = {
        r.partition: (r.lo, r.hi, r.n)
        for r in spark.table(name)
        .groupBy("partition")
        .agg(
            F.min("offset").alias("lo"),
            F.max("offset").alias("hi"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert per[0] == (10, 39, 30), (
        f"partition 0 must start exactly at the requested offset 10 even "
        f"though the first poll only produced 7 (got {per[0]})"
    )
    assert per[1] == (0, 39, 40), f"partition 1 must be unaffected {per[1]}"


def _run_until_mid_then_stop(spark, tmp_path, topic, out, ckpt, **overrides):
    """Start the standard 2x40 topic into a parquet sink, stop after at
    least one committed batch while every partition is still well below
    offset 35 (so a restart with logStartOffsets=35 is a real
    data-loss scenario).  Returns the committed row count at stop."""
    q = (
        _reader(spark, tmp_path, topic, maxOffsetsPerTrigger="4", **overrides)
        .selectExpr("partition", "offset")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        _wait(lambda: _sink_count(spark, out) >= 4)
    finally:
        q.stop()
    mid = _sink_count(spark, out)
    hi = (
        spark.read.parquet(out)
        .groupBy("partition")
        .agg(F.max("offset").alias("hi"))
        .agg(F.max("hi"))
        .head()[0]
    )
    assert hi < 34, f"stopped too late for the aging scenario (hi={hi})"
    return mid


def test_fail_on_data_loss_true_aborts_after_retention(spark, tmp_path):
    """Restarting from a checkpoint after the broker aged records out
    past the committed offset fails the query (failOnDataLoss defaults
    to true), naming the partition and offsets."""
    topic = f"t_agedfail_{uuid.uuid4().hex[:8]}"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_until_mid_then_stop(spark, tmp_path, topic, out, ckpt)

    q2 = (
        _reader(
            spark, tmp_path, topic,
            maxOffsetsPerTrigger="4", logStartOffsets="35",
        )
        .selectExpr("partition", "offset")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        _wait(lambda: q2.exception() is not None)
    finally:
        q2.stop()
    msg = str(q2.exception())
    assert "data loss" in msg and "failOnDataLoss" in msg, msg[:500]


def test_fail_on_data_loss_false_skips_aged_records(spark, tmp_path):
    """Same scenario with failOnDataLoss=false: the query skips to the
    first retained offset and drains — committed pre-stop rows survive,
    the aged gap is absent, nothing duplicates."""
    topic = f"t_agedskip_{uuid.uuid4().hex[:8]}"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    mid = _run_until_mid_then_stop(spark, tmp_path, topic, out, ckpt)

    q2 = (
        _reader(
            spark, tmp_path, topic,
            maxOffsetsPerTrigger="4", logStartOffsets="35",
            failOnDataLoss="false",
        )
        .selectExpr("partition", "offset")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        _wait(lambda: _sink_count(spark, out) >= mid + 2 * 5)
    finally:
        q2.stop()
    df = spark.read.parquet(out)
    assert df.count() == mid + 10, "exactly the retained tail lands"
    assert df.select("partition", "offset").distinct().count() == mid + 10
    # Every retained offset [35, 40) present once per partition; the
    # aged gap (committed..35) never reaches the sink.
    tail = df.filter("offset >= 35")
    assert tail.count() == 10
    assert df.filter("offset >= 30 AND offset < 35").count() == 0


def test_registered_json_offsets_starts_match_contract(spark):
    """The registered variant's effective starts re-derive from the
    geometry dicts: explicit >= log-start wins, explicit below
    log-start clamps, -2 and unlisted take the log start."""
    assert _kj_effective_start(0) == 10  # explicit, retained
    assert _kj_effective_start(1) == KJ_LOG_START[1]  # unlisted
    assert _kj_effective_start(2) == KJ_LOG_START[2]  # explicit -2
    assert _kj_effective_start(3) == KJ_LOG_START[3]  # aged-out clamp
    assert KJ_STARTING[3] < KJ_LOG_START[3]


@settings(max_examples=50, deadline=None)
@given(
    log_start=st.integers(min_value=-20, max_value=70),
    req=st.integers(min_value=0, max_value=49),
)
def test_log_start_resolution_properties(tmp_path_factory, log_start, req):
    """earliest = clamp(logStart, 0, logSize) per partition (a
    negative retention start must never admit negative offsets); an
    explicit JSON start below the log start raises under
    failOnDataLoss=true and clamps under false."""
    tmpdir = tmp_path_factory.mktemp("broker")
    r = _mk_reader(tmpdir, logStartOffsets=log_start)
    init = r.initialOffset()
    log_start = max(log_start, 0)  # the contract's clamp
    for p in range(r.n_parts):
        assert init[str(p)] == min(log_start, r._log_size(p))

    spec = json.dumps({"0": req})
    strict = _mk_reader(
        tmpdir, startingOffsets=spec, logStartOffsets=log_start
    )
    loose = _mk_reader(
        tmpdir, startingOffsets=spec, logStartOffsets=log_start,
        failOnDataLoss="false",
    )
    if req < min(log_start, strict._log_size(0)):
        with pytest.raises(RuntimeError, match="data loss"):
            strict.initialOffset()
    else:
        assert strict.initialOffset()["0"] == req
    assert loose.initialOffset()["0"] == max(
        req, min(log_start, loose._log_size(0))
    )
    # Partitions 1.. are unlisted -> earliest retained, both modes.
    for r2 in (loose,):
        for p in range(1, r2.n_parts):
            assert r2.initialOffset()[str(p)] == min(
                log_start, r2._log_size(p)
            )


def test_oracle_match_windowed(spark):
    check_query(spark, "stream_kafka_windowed", SF_DIR)
