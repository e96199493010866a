from __future__ import annotations

import pytest

from splitserve_spark.registry import REGISTRY, load_all
from tests.oracle_utils import SF_DIR, check_query, duck_connection

load_all()

AGGS = [
    "agg_basic_stats",
    "agg_variance",
    "agg_skew_kurt",
    "agg_corr_covar",
    "agg_percentiles",
    "agg_collect_sorted",
    "agg_min_max_by",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_pivot",
    "agg_median_mode_listagg",
    "agg_multi_distinct",
    "agg_having",
    "agg_bool_and_count_if",
    "agg_sum_distinct",
    "agg_bitwise",
    "agg_hll_sketch",
    "agg_bitmap_distinct",
    "agg_filter_clause",
    "agg_equiwidth_histogram",
    "agg_entropy",
    "agg_regression",
]


@pytest.mark.parametrize("name", AGGS)
def test_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)


def test_approx_aggregates_within_tolerance(spark):
    """The upgraded value-bearing shape: exact_parts matches a direct
    DuckDB exact count, and both in-band booleans hold (these are the
    values the oracle hash-checks; this is the engine-side sanity
    against an independently-written exact query)."""
    pdf = REGISTRY["agg_approx"].fn(spark, SF_DIR).toPandas().set_index("l_returnflag")
    con = duck_connection(SF_DIR)
    try:
        exact = con.execute(
            """
            SELECT l_returnflag,
                   count(DISTINCT l_partkey) AS n_parts
            FROM lineitem GROUP BY l_returnflag
            """
        ).df().set_index("l_returnflag")
    finally:
        con.close()
    for flag in exact.index:
        assert pdf.loc[flag, "exact_parts"] == exact.loc[flag, "n_parts"]
        assert bool(pdf.loc[flag, "parts_within_5pct"])
        assert bool(pdf.loc[flag, "p50_within_1pct"])


def test_hll_sketch_estimate_tracks_exact(spark):
    """General-regime contract for the mergeable HLL rollup: even when
    the sketch leaves exact sparse mode, the merged estimate must stay
    within the lgK=12 error envelope (±2% plus small-count slack)."""
    out = REGISTRY["agg_hll_sketch"].fn(spark, SF_DIR).toPandas()
    assert len(out) > 0
    err = (out["est_docs"] - out["exact_docs"]).abs()
    assert (err <= (0.02 * out["exact_docs"]).clip(lower=1)).all()


def test_hll_fence_keeps_sparse_exact_regime(spark):
    """The in-code fence (doc_id < HLL_FENCE_MAX_ID) must keep every
    per-source cardinality inside the regime where the query's
    sketch→union→estimate pipeline is EXACT.  Measured (the earlier
    ~3k assumption was refuted by the 8× replicated-corpus strict
    run): a single lgK=12 sketch is exact ≤512 distincts, but the
    hll_union_agg path first misses at 388 — so the fence caps per
    source at 250."""
    from pyspark.sql import functions as F

    from splitserve_spark.operators.aggregates import HLL_FENCE_MAX_ID
    from splitserve_spark.tables import Tables

    t = Tables(spark, SF_DIR)
    per_source = (
        t.documents.filter(F.col("doc_id") < HLL_FENCE_MAX_ID)
        .groupBy("source")
        .agg(F.count_distinct("doc_id").alias("n"))
        .toPandas()
    )
    assert (per_source["n"] <= 250).all(), per_source
    # The fence math itself: FENCE ids round-robined over 20 sources.
    assert HLL_FENCE_MAX_ID // 20 <= 250
    # Pin the measured regime at the fence cap: 250 distincts through
    # the SAME split→sketch→union→estimate pipeline the query runs.
    df = spark.range(250).select("id", (F.col("id") % 2).alias("half"))
    partials = df.groupBy("half").agg(F.hll_sketch_agg("id").alias("sk"))
    est = partials.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0]["e"]
    assert est == 250
