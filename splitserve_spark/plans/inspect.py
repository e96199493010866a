"""Plan-inspection utilities (SURVEY.md §4 — the scale-discipline gate).

The reference gets its physical behavior from Catalyst strategy
selection (`SparkStrategies.scala:65-453`); this engine asserts the
same decisions on the modern planner: filters pushed into parquet
scans, dimension joins broadcast, fact-fact joins sort-merge, top-k as
TakeOrderedAndProject, codegen fused.  tests/test_plans.py runs these
assertions on the registered queries — a failing assertion means a
query silently lost its 100 TB-safe plan.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output (default `formatted` physical plan) as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    for needle in needles:
        assert needle not in plan, f"did not expect {needle!r} in plan:\n{plan}"


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of every scan in the plan."""
    return "\n".join(
        line.strip()
        for line in physical_plan(df).splitlines()
        if "PushedFilters" in line
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges — the scale-cost headline of a plan.
    Counted on the `simple` plan (the formatted mode repeats each node
    in its detail section).  BroadcastExchange and ReusedExchange are
    deliberately excluded: the word-boundary regex does not match
    either (no boundary after 't'/'d'), only standalone `Exchange
    hashpartitioning/rangepartitioning/...` nodes."""
    import re

    plan = physical_plan(df, mode="simple")
    return sum(
        1
        for line in plan.splitlines()
        if re.search(r"(?<![A-Za-z])Exchange\b", line)
    )
