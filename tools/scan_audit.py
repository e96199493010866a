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
        counts: dict[str, int] = {}
        for m in re.finditer(r"file:[^\]]*/(\w+)\.parquet", plan):
            counts[m.group(1)] = counts.get(m.group(1), 0) + 1
        worst = {t: c for t, c in counts.items() if c >= args.threshold}
        if worst:
            flagged += 1
            print(json.dumps({"query": name, "repeat_scans": worst}))
    print(json.dumps({"checked": checked, "flagged": flagged}))
    spark.stop()


if __name__ == "__main__":
    main()
