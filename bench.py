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


#: Quiet-container CPU-probe reference: median of a 6-run series on
#: this container idle (loadavg 0.8 on 32 CPUs, round 11) —
#: 0.50/0.50/0.51/0.51/0.51/0.56 s.  BASELINE.md's normalization rule
#: divides bench totals by (measured probe / this reference) before
#: any band comparison.
CPU_PROBE_REF_SEC = 0.51


def _cpu_probe() -> float:
    """Fixed single-thread CPU micro-task (pure-Python xorshift over a
    constant iteration count): its wall time depends ONLY on how much
    CPU the host is actually giving this container, never on the repo's
    plans or the data.  Contention calibration — see BASELINE.md."""
    start = time.perf_counter()
    x = 0x9E3779B97F4A7C15
    for _ in range(2_000_000):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    if x == 0:  # unreachable; keeps the loop un-eliminable
        print(x, file=sys.stderr)
    return time.perf_counter() - start


def _shuffle_probe(spark) -> float:
    """Tiny fixed Spark shuffle (200k synthetic rows → 64-key hash agg),
    independent of SF and of every registered plan: times the JVM's
    task-scheduling + exchange path under current host conditions."""
    from pyspark.sql import functions as F

    start = time.perf_counter()
    (
        spark.range(200_000, numPartitions=8)
        .groupBy((F.col("id") % 64).alias("k"))
        .count()
        .count()
    )
    return time.perf_counter() - start


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

    # Contention calibration (BASELINE.md normalization rule): fixed
    # micro-tasks timed before AND after the suite + the host load
    # average, so a total can be normalized across differently-loaded
    # containers instead of eyeballed against the band.
    load_before = os.getloadavg()
    probe = {
        "cpu_before_sec": round(min(_cpu_probe() for _ in range(3)), 4),
        "shuffle_before_sec": round(
            min(_shuffle_probe(spark) for _ in range(3)), 4),
    }

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

    probe["cpu_after_sec"] = round(
        min(_cpu_probe() for _ in range(3)), 4)
    probe["shuffle_after_sec"] = round(
        min(_shuffle_probe(spark) for _ in range(3)), 4)
    probe["loadavg_before"] = [round(v, 2) for v in load_before]
    probe["loadavg_after"] = [round(v, 2) for v in os.getloadavg()]
    # Quiet-container reference for the CPU probe, measured on this
    # container idle (BASELINE.md records the series).  Normalized
    # total = value / cpu_probe_ratio; ratio >> 1 means the host was
    # contended and the RAW total must not be read against the band.
    probe["cpu_ref_sec"] = CPU_PROBE_REF_SEC
    probe["cpu_probe_ratio"] = round(
        (probe["cpu_before_sec"] + probe["cpu_after_sec"])
        / 2 / CPU_PROBE_REF_SEC, 3,
    )

    result = {
        "metric": "bench_total_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "definition": f"sum of per-query best-of-{max(1, reps)} timings"
                      " (not wall clock)",
        "queries": timings,
        "sf": sf,
        "probe": probe,
        "normalized_value": round(
            sum(timings.values()) / max(probe["cpu_probe_ratio"], 1.0), 3,
        ),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
