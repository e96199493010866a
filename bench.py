#!/usr/bin/env python
"""Benchmark harness: runs the headline query set on $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

  {"metric": "bench_total_seconds", "value": N, "unit": "sec",
   "queries": {"q1_pricing_summary": s, ...}, "sf": 0.1}

The headline set is every registry entry flagged bench=True — the
scan/agg, join, window, streaming-window, dedup (exact + MinHash-LSH),
similarity, and PageRank representatives.  Each query is executed to
completion (count of the result) after a warm-up pass of the session.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from splitserve_spark.registry import load_all
    from splitserve_spark.session import get_session

    spark = get_session("splitserve-bench", master=f"local[{cpus}]",
                        shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    bench_specs = [s for s in registry.values() if s.bench]

    # Warm-up: touch every input table once (JVM/JIT/file-index warmup).
    from splitserve_spark.tables import TABLE_NAMES, Tables

    t = Tables(spark, sf_dir)
    for name in TABLE_NAMES:
        getattr(t, name).count()

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    for spec in bench_specs:
        best, n = None, 0
        for _ in range(max(1, reps)):
            start = time.perf_counter()
            n = spec.fn(spark, sf_dir).count()
            elapsed = time.perf_counter() - start
            best = elapsed if best is None else min(best, elapsed)
        timings[spec.name] = round(best, 3)
        print(f"# {spec.name}: {timings[spec.name]:.3f}s ({n} rows)",
              file=sys.stderr)

    result = {
        "metric": "bench_total_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "definition": f"sum of per-query best-of-{max(1, reps)} timings"
                      " (not wall clock)",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
