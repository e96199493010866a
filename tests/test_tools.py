"""Format pins for the non-gating diagnostics in tools/.

tools/scan_audit.py regex-parses `explainString(..., "simple")` output
and skips InMemoryRelation subtrees by indentation — plan-format drift
across Spark versions would silently miscount (r7 ADVICE).  These
tests pin the exact assumptions against a live plan, so drift fails
loudly here instead.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from scan_audit import _count_executed_scans, _depth  # noqa: E402

from splitserve_spark.tables import Tables  # noqa: E402
from tests.oracle_utils import SF_DIR  # noqa: E402


def _simple_plan(df) -> str:
    # The exact call scan_audit.main() uses.
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def test_scan_audit_format_assumptions(spark):
    """Pins: (a) a persisted input prints as InMemoryRelation with its
    FileScan lineage indented strictly deeper, (b) the file-path regex
    extracts the base table name from FileScan lines, (c) cached
    subtrees are skipped while uncached scans are counted once per
    reference."""
    t = Tables(spark, SF_DIR)
    cached = t.nation.persist()
    try:
        cached.count()
        df = cached.join(
            t.region, F.col("n_regionkey") == F.col("r_regionkey")
        )
        plan = _simple_plan(df)
        assert "InMemoryRelation" in plan, plan
        assert "FileScan" in plan and "region.parquet" in plan, plan

        # The cached subtree's own FileScan (nation) sits deeper than
        # the InMemoryRelation header line — the indentation invariant
        # the skip heuristic relies on.
        lines = plan.splitlines()
        imr = next(i for i, l in enumerate(lines) if "InMemoryRelation" in l)
        nat = next(i for i, l in enumerate(lines) if "nation.parquet" in l)
        assert nat > imr and _depth(lines[nat]) > _depth(lines[imr]), plan

        counts = _count_executed_scans(plan)
        assert counts == {"region": 1}, (counts, plan)
    finally:
        cached.unpersist()


def test_scan_audit_counts_repeat_scans(spark):
    """An UNCACHED table referenced from two branches counts twice —
    the repeat-scan defect class the audit exists to hunt."""
    t = Tables(spark, SF_DIR)
    a = t.nation.select("n_nationkey", "n_regionkey")
    b = t.nation.select(
        F.col("n_nationkey").alias("k2"), F.col("n_name").alias("nm")
    )
    df = a.join(b, a.n_nationkey == b.k2)
    counts = _count_executed_scans(_simple_plan(df))
    assert counts.get("nation") == 2, counts
