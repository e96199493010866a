"""Replay of the reference's own SQL logic-test corpus.

The reference ships its executable SQL-surface spec as the 28 input
files of sql/core/src/test/resources/sql-tests/inputs/ (run by its
SQLQueryTestSuite.scala).  SURVEY.md §5 prescribes adopting them; these
tests replay the 26 deterministic files (random.sql and blacklist.sql
excluded with reasons) through the engine's SQL surface AND an
independent DuckDB oracle, asserting zero unexplained divergences.

Pass taxonomy per statement (splitserve_spark/sql_corpus.py):
  match          — both engines succeed, value sets equal
  both_error     — both engines reject (the corpus is full of
                   intentional error cases; rejection IS the spec)
  spark_only_ok  — DDL/metadata statements DuckDB can't mirror
  meta_error     — DESC/SHOW statements the corpus marks as error cases
  ledgered:*     — reasoned entry in sql_corpus_ledger.py

The floors asserted in test_corpus_breadth pin the taxonomy mix so a
regression that silently turns matches into both_error (e.g. the
engine starts rejecting valid SQL, making every compare "both fail")
cannot pass.
"""

from __future__ import annotations

import os
from collections import Counter

import pytest

from splitserve_spark import sql_corpus

pytestmark = pytest.mark.skipif(
    not os.path.isdir(sql_corpus.CORPUS_DIR),
    reason="reference sql-tests corpus not present (standalone checkout); "
    "set SPARK_GRAFT_SQL_CORPUS to replay",
)

_FILES = (sql_corpus.corpus_files()
          if os.path.isdir(sql_corpus.CORPUS_DIR) else [])

#: Accumulated outcomes across the parametrized file tests, consumed by
#: the breadth / stale-ledger summary tests that run after them.
_OUTCOMES: Counter = Counter()
_FILES_RUN: set[str] = set()


@pytest.mark.parametrize("fname", _FILES)
def test_corpus_file(spark, fname):
    results = sql_corpus.replay_file(spark, fname)
    assert results, f"{fname}: no statements parsed"
    divergences = [r for r in results if r.outcome == "DIVERGENCE"]
    msg = "\n".join(
        f"  STMT: {' '.join(r.stmt.split())[:200]}\n  -> {r.detail[:400]}"
        for r in divergences)
    assert not divergences, f"{fname}: unexplained divergences:\n{msg}"
    for r in results:
        _OUTCOMES[r.outcome.split(":")[0]] += 1
    _FILES_RUN.add(fname)


def test_corpus_breadth():
    """≥25 files replayed and the outcome mix is pinned: a majority of
    comparable statements must VALUE-match the independent oracle."""
    assert len(_FILES_RUN) >= 25, _FILES_RUN
    assert _OUTCOMES["match"] >= 150, _OUTCOMES
    assert _OUTCOMES["spark_only_ok"] >= 50, _OUTCOMES
    # Error-cases and ledger entries exist but stay bounded.
    assert _OUTCOMES["both_error"] <= 60, _OUTCOMES
    assert _OUTCOMES["ledgered"] <= 45, _OUTCOMES


def test_ledger_entries_all_used():
    """Every ledger entry must have been consulted by the replay —
    stale entries (statement fixed upstream or re-keyed) are errors."""
    assert len(_FILES_RUN) >= 25, "runs before the per-file tests?"
    stale = set(sql_corpus.LEDGER) - sql_corpus.USED_LEDGER_KEYS
    assert not stale, f"stale ledger entries: {sorted(stale)[:5]}"


def test_ledger_hygiene():
    sql_corpus._populate_ledger()
    assert sql_corpus.LEDGER, "ledger failed to populate"
    for (fname, stmt), entry in sql_corpus.LEDGER.items():
        assert fname.endswith(".sql")
        assert entry.kind in ("spark_error", "duckdb_gap",
                              "value_diverges", "skip")
        assert len(entry.reason) >= 20, (fname, stmt)


def test_excluded_files_have_reasons():
    for fname, reason in sql_corpus.EXCLUDED_FILES.items():
        assert reason
        assert os.path.isfile(os.path.join(sql_corpus.CORPUS_DIR, fname))
