"""Per-process warehouse hygiene (wh_util): the fix for the r7/r8
concurrent-suite collisions, where two JVMs on one checkout wrote the
same fixed-name saveAsTable locations (VERDICT r8, What's wrong #1).

Contract under test:
  * every suite-written catalog object name embeds the writer's pid,
    so concurrent processes are disjoint by construction;
  * sweep_stale_locations removes only DEAD processes' orphan
    directories — never a live process's.
"""

from __future__ import annotations

import os
import re
import time

import pytest

from splitserve_spark.operators import wh_util
from splitserve_spark.operators.catalog_ddl import _tag
from splitserve_spark.operators.wh_util import (
    _PROC_DIR,
    _pid_alive,
    proc_suffix,
    sweep_stale_locations,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _dead_pid() -> int:
    """A pid guaranteed not to belong to a live process."""
    for pid in range(2_000_000, 2_000_100):
        if not _pid_alive(pid):
            return pid
    pytest.skip("no dead pid found in probe range")


def test_proc_suffix_embeds_pid_and_matches_sweep_regex():
    suf = proc_suffix()
    assert suf == f"p{os.getpid()}"
    # The sweep must be able to parse back what the writers emit —
    # for plain table dirs and for database (.db) dirs.
    m = _PROC_DIR.search(f"orders_b_sf0_001_{suf}")
    assert m and int(m.group(1)) == os.getpid()
    m = _PROC_DIR.search(f"ddl_db_sf0_001_{suf}.db")
    assert m and int(m.group(1)) == os.getpid()


def test_catalog_tag_is_per_process():
    tag = _tag(SF_DIR)
    assert tag.endswith(f"_p{os.getpid()}")
    # Two processes would produce different tags for the same sf_dir:
    # only the pid component distinguishes them.
    assert re.sub(r"_p\d+$", "", tag) == re.sub(
        r"[^0-9a-zA-Z]", "_", os.path.basename(os.path.normpath(SF_DIR))
    )


def test_sweep_removes_dead_keeps_live_and_foreign(spark, tmp_path, monkeypatch):
    warehouse = tmp_path / "wh"
    warehouse.mkdir()
    # Pre-r9 fixed-name bucketed location (no _p token): legacy, OURS,
    # swept by the one-time legacy cleanup (r9 review finding).
    dead = warehouse / f"orders_b_sf_{_dead_pid()}x"
    dead_tok = warehouse / f"orders_b_sf_p{_dead_pid()}"
    dead_db = warehouse / f"ddl_db_sf_p{_dead_pid()}.db"
    live = warehouse / f"orders_b_sf_{proc_suffix()}"
    foreign = warehouse / "user_table"  # not suite-written: untouched
    # r10 ADVICE: a USER table that merely looks per-process must
    # survive even though its embedded pid is dead.
    foreign_pid = warehouse / f"metrics_p{_dead_pid()}"
    # A legacy fixed-name dir that is FRESH could belong to a
    # still-running pre-r9 process mid-upgrade: kept.
    legacy_fresh = warehouse / f"lineitem_b_sf_{_dead_pid()}x"
    for d in (dead, dead_tok, dead_db, live, foreign, foreign_pid,
              legacy_fresh):
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"x")
    # Age the sweepable legacy dir past the 6h mid-upgrade guard.
    old = time.time() - 7 * 3600
    os.utime(dead, (old, old))

    monkeypatch.setattr(
        wh_util, "local_warehouse_path", lambda _s: str(warehouse)
    )
    monkeypatch.setattr(wh_util, "_SWEPT", False)
    sweep_stale_locations(spark)

    assert not dead_tok.exists(), "dead process's table dir must be swept"
    assert not dead_db.exists(), "dead process's database dir must be swept"
    assert live.exists(), "live process's dir must never be touched"
    assert foreign.exists(), "non-suite dirs must never be touched"
    assert foreign_pid.exists(), (
        "user dirs with a coincidental _p<pid> suffix are not suite-"
        "written and must never be swept"
    )
    assert legacy_fresh.exists(), (
        "fresh legacy dirs may belong to a still-running pre-r9 "
        "process — only >6h-old ones are orphans"
    )
    assert not dead.exists(), (
        "legacy fixed-name bucketed dirs (pre-r9, no _p token) are ours "
        "and must be swept once aged"
    )


def test_sweep_runs_once_per_process(spark, tmp_path, monkeypatch):
    warehouse = tmp_path / "wh2"
    warehouse.mkdir()
    monkeypatch.setattr(
        wh_util, "local_warehouse_path", lambda _s: str(warehouse)
    )
    monkeypatch.setattr(wh_util, "_SWEPT", False)
    sweep_stale_locations(spark)
    # Second call is a no-op even if a new dead dir appears — the
    # sweep is startup hygiene, not a GC loop.
    orphan = warehouse / f"orders_b_sf_p{_dead_pid()}"
    orphan.mkdir()
    sweep_stale_locations(spark)
    assert orphan.exists()
