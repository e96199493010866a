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
_ERROR_VIOLATIONS: list[str] = []
_ERROR_KINDS_VERIFIED: list[int] = [0]


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
    violations, verified = sql_corpus.expected_error_violations(results)
    _ERROR_VIOLATIONS.extend(violations)
    _ERROR_KINDS_VERIFIED[0] += verified
    _FILES_RUN.add(fname)


def test_expected_error_kinds_match_reference():
    """The reference's results/*.sql.out files state the expected error
    class per error statement; a both_error/meta_error outcome is only
    a real pass if Spark rejected for the documented KIND (Parse vs
    Analysis).  Every statement where Spark now errors differently (or
    succeeds) must carry a reasoned ERROR_KIND_EVOLVED / ledger entry —
    and the verified count is floored so the cross-check can't silently
    no-op (62 error statements exist across 14 result files; 5 carry
    evolution entries)."""
    assert len(_FILES_RUN) >= 25, "runs before the per-file tests?"
    assert not _ERROR_VIOLATIONS, "\n".join(_ERROR_VIOLATIONS[:10])
    assert _ERROR_KINDS_VERIFIED[0] >= 50, _ERROR_KINDS_VERIFIED
    stale = set(sql_corpus.ERROR_KIND_EVOLVED) - sql_corpus.USED_EVOLVED_KEYS
    assert not stale, f"stale ERROR_KIND_EVOLVED entries: {sorted(stale)[:5]}"
    for key, reason in sql_corpus.ERROR_KIND_EVOLVED.items():
        assert len(reason) >= 20, key


def test_corpus_breadth():
    """≥25 files replayed and the outcome mix is pinned: a majority of
    comparable statements must VALUE-match the independent oracle."""
    assert len(_FILES_RUN) >= 25, _FILES_RUN
    assert _OUTCOMES["match"] >= 150, _OUTCOMES
    assert _OUTCOMES["spark_only_ok"] >= 50, _OUTCOMES
    # Error-cases and ledger entries exist but stay bounded.  The
    # both_error ceiling tightened 60 → 45 in round 11 (measured 38)
    # once the expected-error-kind cross-check below pinned the error
    # CLASSES: mass drift into both_error now trips this sooner, and
    # class drift within both_error trips the cross-check.
    assert _OUTCOMES["both_error"] <= 45, _OUTCOMES
    assert _OUTCOMES["ledgered"] <= 40, _OUTCOMES


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
