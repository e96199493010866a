"""Bounded per-run persist tracker for multi-consumer intermediates.

Iterative operators (PageRank's edge table) and multi-branch plans
(the LSH collapse's membership table, BM25's tokenized corpus) build
an intermediate that several branches of one returned plan consume.
Catalyst re-derives an unpersisted intermediate once per branch — for
corpus-scale inputs that multiplies the scan + hot-loop cost by the
branch count — so these operators persist it (Spark's default
MEMORY_AND_DISK: spills, never OOMs).

The returned DataFrame's lineage still references the persisted data,
so it cannot be unpersisted at return time.  The contract is
*bounded to one run*: every tracked operator calls release_prior() on
entry, freeing whatever the PREVIOUS tracked invocation cached.
Consumers must therefore materialize an operator's result before
invoking the next tracked operator (every harness here — driver,
bench, check_all, tests — collects eagerly); a released result is
never wrong, it just recomputes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list = []


def persist_tracked(df: DataFrame) -> DataFrame:
    _PERSISTED.append(df)
    return df.persist()


def release_prior() -> None:
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist()
        except Exception:
            pass
