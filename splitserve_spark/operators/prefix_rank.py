"""Distributed exact global rank / running sums — no single-reducer window.

An unpartitioned ``Window.orderBy(...)`` moves EVERY row to one
partition (`WindowExec.scala:82` requires a single partition when the
partition spec is empty) — correct, but the known scale ceiling of
exact rank-based analytics (ntile histograms, RFM scores, Pareto
curves, KS statistics).  This module computes the SAME exact values
with the classic two-level decomposition:

1. **Range-bucket** rows by approximate-quantile cut points of the
   sort column (`ApproximatePercentile.scala:69` is the reference's
   sketch; ``df.stat.approxQuantile`` here).  The ≤ ``n_buckets`` cut
   points broadcast onto the scan as a pure projection, so bucket
   assignment costs nothing.  Equal sort values always land in the
   same bucket (the bucket id is a function of the value), and cut
   accuracy affects only load balance — never the result.
2. **Local rank / prefix sums** inside each bucket with a PARTITIONED
   window (``Window.partitionBy(_pid)``) — one ordinary hash shuffle,
   each task sorts ~1/n_buckets of the data.
3. **Bucket offsets**: per-bucket row counts and sum totals reduce to
   ≤ ``n_buckets`` rows, are collected, prefix-accumulated driver-side
   (exact: Python ints / Decimals), and broadcast back.  Global rank =
   bucket offset + local rank; running sum likewise.

The result is bit-identical to the single-reducer form for integer /
decimal running sums (exact, order-independent arithmetic), which is
what keeps the DuckDB exact-hash oracles valid: callers must pass sum
columns as integral or decimal types, never raw doubles (see
FIXTURES.md float-parity rules).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_prefix(
    df: DataFrame,
    sort_col: str,
    tiebreak: Sequence[str] = (),
    sums: Mapping[str, Column] | None = None,
    n_buckets: int = 32,
) -> tuple[DataFrame, int, dict]:
    """Add ``_rank`` (1-based global row_number over
    ``(sort_col, *tiebreak)`` ascending) and, per ``sums`` entry, an
    inclusive running-sum column of that name — without an
    unpartitioned window.

    ``sort_col`` must be a numeric column of ``df`` (callers wanting a
    descending order materialize the negated value).  ``(sort_col,
    *tiebreak)`` must be unique per row so the total order — and hence
    every returned value — is deterministic and partitioning-independent.
    ``sums`` values must be integral/decimal columns (exact,
    order-independent addition; raw doubles would drift vs the
    single-reducer form).

    Returns ``(ranked_df, total_rows, totals)`` where ``totals`` maps
    each sum name to its exact grand total (driver-side int/Decimal) —
    callers use these instead of a ``Window.partitionBy()`` global
    window for shares/fractions.
    """
    sums = dict(sums or {})
    order = [F.col(sort_col).asc(), *[F.col(c).asc() for c in tiebreak]]

    # 1. Range buckets from approx-quantile cut points (balance only —
    # correctness does not depend on their accuracy or determinism).
    fractions = [i / n_buckets for i in range(1, n_buckets)]
    cuts = sorted(
        set(
            df.select(F.col(sort_col).cast("double").alias("_q"))
            .stat.approxQuantile("_q", fractions, 1.0 / (4 * n_buckets))
        )
        if fractions  # n_buckets=1: everything in bucket 0, no cuts
        else []
    )
    pid: Column = F.lit(0)
    for c in cuts:
        pid = pid + (F.col(sort_col).cast("double") > F.lit(c)).cast("int")
    bucketed = df.withColumn("_pid", pid)

    # 3. (computed first so the driver knows the totals) Per-bucket
    # counts/sums → ≤ n_buckets rows → exact driver-side prefix.
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, col in sums.items():
        aggs.append(F.sum(col).alias(f"_s_{name}"))
    stats = {r["_pid"]: r for r in bucketed.groupBy("_pid").agg(*aggs).collect()}
    offsets_rows = []
    run_n = 0
    # Zero of the SAME Python type as the collected sums (int vs
    # Decimal) so createDataFrame infers one column type for offsets.
    run_s = {
        name: next(
            (type(stats[b][f"_s_{name}"])(0) for b in stats
             if stats[b][f"_s_{name}"] is not None),
            0,
        )
        for name in sums
    }
    for b in sorted(stats):
        row = stats[b]
        offsets_rows.append(
            (b, run_n, *[run_s[name] for name in sums])
        )
        run_n += row["_n"]
        for name in sums:
            run_s[name] = run_s[name] + row[f"_s_{name}"]
    total_rows, totals = run_n, dict(run_s)

    spark = df.sparkSession
    if offsets_rows:
        off_schema = ["_pid", "_off_n", *[f"_off_{name}" for name in sums]]
        offsets = spark.createDataFrame(offsets_rows, off_schema)
    else:  # empty input: no buckets, rank columns added below are moot
        offsets = spark.createDataFrame(
            [(0, 0, *[0 for _ in sums])],
            ["_pid", "_off_n", *[f"_off_{name}" for name in sums]],
        )

    # 2. Local rank / running sums with a PARTITIONED window.
    w = Window.partitionBy("_pid").orderBy(*order)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = bucketed.withColumn("_lrank", F.row_number().over(w))
    for name, col in sums.items():
        local = local.withColumn(f"_l_{name}", F.sum(col).over(wf))

    out = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("_rank", (F.col("_off_n") + F.col("_lrank")).cast("long"))
    )
    for name in sums:
        out = out.withColumn(name, F.col(f"_off_{name}") + F.col(f"_l_{name}"))
    drop = ["_pid", "_lrank", "_off_n"]
    drop += [f"_l_{name}" for name in sums] + [f"_off_{name}" for name in sums]
    return out.drop(*drop), total_rows, totals


def ntile_from_rank(rank: Column, n: int, k: int) -> Column:
    """SQL NTILE(k) bucket from an exact 1-based global rank over n
    rows: the first ``n % k`` buckets get ``n // k + 1`` rows, the rest
    ``n // k`` — the standard definition both Spark and DuckDB
    implement, reproduced arithmetically so the bucket comes from the
    distributed rank instead of a single-reducer ntile window.  Uses
    double floor-division: exact for n < 2^52."""
    q, r = n // k, n % k
    if q == 0:
        return rank.cast("int")
    big_cut = r * (q + 1)
    return (
        F.when(rank <= big_cut, F.floor((rank - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rank - big_cut - 1) / q) + 1)
        .cast("int")
    )
