#!/usr/bin/env python
"""Registry-wide repeated-scan audit.

For every batch-relational registry query, build its DataFrame at a
small SF and count how many times the physical plan scans each base
parquet table.  A table scanned N times means Catalyst re-derives a
shared intermediate once per consuming branch — harmless on 60 k rows,
an N× corpus-scan multiplier at 100 TB (the defect class fixed for
dedup_minhash_lsh / text_bm25_search / text_keyword_tfidf /
text_source_drift_jsd by persisting the shared intermediate —
run_cache.py).

Self-joins and fenced all-pairs blocks legitimately scan twice, so the
report flags >= --threshold (default 3).  Usage:

    python tools/scan_audit.py [--sf /root/testdata/sf0.001] [--threshold 3]

Prints one JSON line per flagged query plus a summary line; exit 0
always (a diagnostic, not a gate — the curated plan budget lives in
tests/test_plans.py).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Queries whose builders are streaming / side-effecting / RDD-based
#: and cannot be planned as a single batch DataFrame here (same
#: exclusion list rationale as the registry-wide guards in
#: tests/test_plans.py).
SKIP_PREFIXES = (
    "stream", "source_", "sink_", "ddl_", "rdd_", "workload_",
    "udtf_", "udf_", "catalog_", "ml_kmeans", "merge_", "scd2",
)


def _depth(line: str) -> int:
    """Position where plan-node content starts (past the tree bars)."""
    m = re.match(r"[\s:+\-*]*", line)
    return m.end()


def _count_executed_scans(plan: str) -> dict[str, int]:
    """Count FileScans on the UNCACHED paths of the plan.

    A persisted intermediate prints as InMemoryRelation with its full
    child lineage re-printed at EVERY reference (with re-aliased
    attributes), so a raw FileScan count overstates executed scans
    N-fold.  Each cached subtree executes at most once (first
    materialization) regardless of reference count, so cached subtrees
    are skipped entirely here — what this diagnostic hunts is the
    repeat-scan class that re-EXECUTES per branch."""
    counts: dict[str, int] = {}
    lines = plan.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        if "InMemoryRelation" in line:
            d = _depth(line)
            j = i + 1
            while j < len(lines) and _depth(lines[j]) > d:
                j += 1
            i = j
            continue
        s = re.search(r"file:[^\]]*/(\w+)\.parquet", line)
        if s:
            counts[s.group(1)] = counts.get(s.group(1), 0) + 1
        i += 1
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--threshold", type=int, default=3)
    args = ap.parse_args()

    from splitserve_spark.registry import load_all
    from splitserve_spark.session import get_session

    spark = get_session("scan-audit", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    flagged = 0
    checked = 0
    for name, spec in sorted(registry.items()):
        if name.startswith(SKIP_PREFIXES):
            continue
        try:
            df = spec.fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "simple"
            )
        except Exception as exc:  # noqa: BLE001 — diagnostic keeps going
            print(json.dumps({"query": name, "error": str(exc)[:120]}))
            continue
        checked += 1
        counts = _count_executed_scans(plan)
        worst = {t: c for t, c in counts.items() if c >= args.threshold}
        if worst:
            flagged += 1
            print(json.dumps({"query": name, "repeat_scans": worst}))
    print(json.dumps({"checked": checked, "flagged": flagged}))
    spark.stop()


if __name__ == "__main__":
    main()
