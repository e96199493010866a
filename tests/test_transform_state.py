"""Contract tests for the transformWithStateInPandas operator.

ENV-GATED: the transformWithState driver worker speaks protobuf to the
JVM state server and `google.protobuf` is absent here (no pip), so the
whole module importorskips — the moment the dependency lands, these
tests activate unchanged and the operator can be registered (the
oracle is already written, `transform_state.TWS_PROFILE_ORACLE`).

What IS asserted unconditionally (no protobuf needed):
* the processor's fold logic, driven directly with pandas batches and
  fake state objects — exact integer-cents totals and per-type counts
  across multi-batch folds;
* the operator stays import-clean and unregistered while the
  dependency is missing (the registry count cannot silently change
  with the environment).
"""

from __future__ import annotations

import pandas as pd
import pytest

from splitserve_spark.registry import load_all
from splitserve_spark.streaming import transform_state as T


def test_not_registered_while_env_lacks_protobuf():
    registry = load_all()
    has_protobuf = True
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        has_protobuf = False
    if not has_protobuf:
        assert "stream_tws_profile" not in registry


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeMapState:
    def __init__(self):
        self._m = {}

    def containsKey(self, k):
        return k in self._m

    def getValue(self, k):
        return self._m[k]

    def updateValue(self, k, v):
        self._m[k] = v

    def keys(self):
        return iter(self._m)


class _FakeHandle:
    def __init__(self):
        self.value = _FakeValueState()
        self.map = _FakeMapState()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.value

    def getMapState(self, name, kschema, vschema, ttlDurationMs=None):
        return self.map


def _batch(types_and_cents):
    return pd.DataFrame(
        {
            "event_type": [t for t, _ in types_and_cents],
            "cents": [c for _, c in types_and_cents],
        }
    )


def test_processor_fold_is_exact_across_batches():
    """The fold kernel itself: two batches for one user must yield the
    exact running count, integer-cents total, and distinct-type count
    — the same invariants the oracle checks end-to-end."""
    p = T.UserProfileProcessor()
    p.init(_FakeHandle())
    out1 = list(
        p.handleInputRows(
            (7,), iter([_batch([("click", 199), ("click", 1)])]), None
        )
    )
    assert len(out1) == 1
    row = out1[0].iloc[0]
    assert (row.user_id, row.n_events, row.total_cents, row.n_types) == (
        7, 2, 200, 1,
    )
    out2 = list(
        p.handleInputRows(
            (7,),
            iter([_batch([("purchase", 2500)]), _batch([("click", 50)])]),
            None,
        )
    )
    row = out2[0].iloc[0]
    assert (row.n_events, row.total_cents, row.n_types) == (4, 2750, 2)


def test_end_to_end_matches_oracle(spark):
    """Full micro-batch run vs the DuckDB oracle — activates when
    google.protobuf is installed."""
    pytest.importorskip("google.protobuf")
    import duckdb

    sf_dir = "/root/testdata/sf0.001"
    got = (
        T.stream_tws_profile(spark, sf_dir)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = con.execute(T.TWS_PROFILE_ORACLE).df()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert got["total_cents"].tolist() == want["total_cents"].tolist()
    assert got["n_types"].tolist() == want["n_types"].tolist()
