"""Custom stateful streaming operator via applyInPandasWithState.

The 2.1 reference exposes stateful streaming only through built-in
windowed aggregation (StateStoreSave/Restore,
`streaming/StatefulAggregate.scala:60,98`); arbitrary keyed state
(mapGroupsWithState) landed in 2.2.  This module is the beyond-parity
modern form: a per-key running profile maintained in the state store
across micro-batches with `applyInPandasWithState` — the engine's
recommended way to build operators Spark lacks (design brief: custom
stateful operators).

Operator: per-user running event profile.  State = (n_events,
total_value, last_ts_micros); each micro-batch folds its rows into the
state and emits the updated profile row — i.e. an incrementally
maintained aggregate with access to arbitrary Python state, the shape
sessionization/CDC/feature-store operators build on.

Scale: state lives in the executor state store partitioned by user_id
(one shuffle per batch on the grouping key, same as built-in streaming
aggregation); Arrow batches cross the Python boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from splitserve_spark.session import ensure_parity_conf

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, last_ts_micros bigint"
)
STATE_SCHEMA = "n bigint, total double, last_us bigint"


def _fold_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State-fold kernel: merge this batch's rows into the running
    per-user profile and emit the updated profile."""
    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            # Resolution-independent epoch-µs: pandas 2.x may hand the
            # kernel datetime64[us] OR datetime64[ns] depending on the
            # Arrow path, so never assume the int64 unit — divide a
            # Timedelta instead.
            ts = pdf["ts"]
            tz = getattr(ts.dt, "tz", None)
            epoch = pd.Timestamp(0, tz=tz) if tz is not None else pd.Timestamp(0)
            ts_us = ((ts - epoch) // pd.Timedelta(microseconds=1)).max()
            last_us = max(last_us, int(ts_us))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_ts_micros": [last_us],
        }
    )


def running_user_profile(spark: SparkSession, events_stream: DataFrame) -> DataFrame:
    """events stream (user_id, ts, value) → per-user running profile,
    one emitted row per user per micro-batch that touched the user."""
    ensure_parity_conf(spark)
    return (
        events_stream
        .groupBy("user_id")
        .applyInPandasWithState(
            _fold_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


from pyspark.sql import functions as F  # noqa: E402

from splitserve_spark.registry import register  # noqa: E402


@register(
    "stream_stateful_profile",
    priority=35,  # fixed round 3 (multi-batch dedup + 4dp) — must re-verify
    oracle="""
    SELECT user_id,
           count(*)                       AS n_events,
           round(sum(value), 4)           AS total_value,
           CAST(epoch_us(max(ts)) AS BIGINT) AS last_ts_micros
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("streaming", "stateful", "custom-operator"),
)
def stream_stateful_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful operator run through the real micro-batch
    engine over the events table: each user's state folds every event,
    so the FINAL emitted profile per user equals the batch aggregate —
    which is exactly what the oracle checks.

    An update-mode memory sink APPENDS one row per user per micro-batch
    that touched the user, so under multi-batch input (several event
    files, or maxFilesPerTrigger) a user has several rows.  n_events is
    strictly increasing per user, so max_by(., n_events) deterministically
    selects the final state regardless of how the source was batched.
    Multi-batch state carry-over is covered in tests/test_custom_state.py."""
    ensure_parity_conf(spark)
    from splitserve_spark.streaming.stateful import _events_stream

    name = "ssp_" + "".join(c if c.isalnum() else "_" for c in sf_dir.strip("/"))
    raw = _events_stream(spark, sf_dir).select("user_id", "ts", "value")
    q = (
        running_user_profile(spark, raw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            # 4dp rounding on BOTH engines: the Python fold accumulates in
            # a different order than the oracle's sum → last-ULP drift.
            F.round(F.max_by("total_value", "n_events"), 4).alias("total_value"),
            F.max_by("last_ts_micros", "n_events").alias("last_ts_micros"),
        )
        .orderBy("user_id")
    )
