#!/usr/bin/env python
"""Run every registered query against its DuckDB oracle at a given SF.

    python tools/check_all.py [--strict] [/root/testdata/sf0.1] [name ...]

The driver's t2 gate runs at sf0.01; some divergences only materialize
at larger SFs (e.g. duplicate late lines in TPC-H Q21 first appear at
sf0.1), so run this at the bench SF after touching any operator.

--strict models the driver's exact value hash: no float tolerance, no
array/struct output columns, dtype-class agreement (int vs float),
emitted-order agreement (see tests/oracle_utils.compare_frames).  A
strict pass at sf0.001 AND sf0.01 AND sf0.1 is SUFFICIENT (not
necessary — the driver tolerates last-ULP float drift strict flags)
evidence for a driver hash_match.  Some divergences only appear at
particular SFs in either direction (empty-array NULL at small SF, Q21
duplicates at sf0.1), so run all three.

Optional trailing query names restrict the run to that subset.
Queries without oracles get a rows-only check.  Exits non-zero on any
failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = sys.argv[1:]
    strict = "--strict" in argv
    argv = [a for a in argv if a != "--strict"]
    # --shuffle-partitions N: rerun the whole oracle suite under a
    # different partitioning to prove partition-order INDEPENDENCE —
    # a strict pass at several values (e.g. 5, 16, 64) is evidence the
    # results are identical across cluster sizes, which is exactly the
    # determinism a 1000-executor run needs.  Default 16 matches the
    # committed evidence.
    shuffle_partitions = 16
    if "--shuffle-partitions" in argv:
        i = argv.index("--shuffle-partitions")
        shuffle_partitions = int(argv[i + 1])
        del argv[i : i + 2]
    # First positional is the sf_dir ONLY if it is a real directory;
    # otherwise all positionals are query names ("check_all.py --strict q3"
    # must not treat 'q3' as a data dir and fail everything confusingly).
    if argv and os.path.isdir(argv[0]):
        sf_dir, only = argv[0], set(argv[1:])
    else:
        sf_dir, only = "/root/testdata/sf0.1", set(argv)
    if not os.path.isdir(sf_dir):
        print(f"error: sf_dir {sf_dir!r} is not a directory", file=sys.stderr)
        return 2
    from splitserve_spark.registry import load_all
    from splitserve_spark.session import get_session
    from tests.oracle_utils import check_query

    spark = get_session("check-all", shuffle_partitions=shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    names = [n for n in sorted(registry) if not only or n in only]
    ok, failed = 0, []
    for name in names:
        try:
            if registry[name].oracle is not None:
                check_query(spark, name, sf_dir, strict=strict)
            else:
                registry[name].fn(spark, sf_dir).count()
            ok += 1
        except Exception as ex:
            failed.append(name)
            print(f"FAIL {name}: {str(ex)[:300]}", file=sys.stderr)
    mode = "strict" if strict else "tolerant"
    print(f"{ok}/{len(names)} queries pass ({mode}) at {sf_dir}"
          + (f"; FAILED: {failed}" if failed else ""))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
