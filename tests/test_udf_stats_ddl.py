from __future__ import annotations

import pytest

from splitserve_spark.registry import REGISTRY, load_all
from tests.oracle_utils import SF_DIR, check_query

load_all()

ORACLE_CHECKED = [
    "udf_pandas_scalar",
    "udf_pandas_grouped_agg",
    "udf_apply_in_pandas",
    "udf_map_in_pandas",
    "udf_cogroup_in_pandas",
    "udf_python_row",
    "udtf_chunk_text",
    "stat_crosstab",
    "stat_corr_cov",
    "stat_describe",
    "stat_observe_metrics",
    "stat_chi2_independence",
    "stat_mann_whitney",
    "ddl_temp_view_sql",
    "ddl_global_temp_view",
    "ddl_show_tables",
    "ddl_describe_table",
    "ddl_catalog_list",
    "ddl_cache_table",
    "ddl_analyze_stats",
    "ddl_database_lifecycle",
    "ddl_show_partitions",
    "ddl_truncate_table",
    "ddl_alter_add_column",
    "ddl_column_defaults",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)


def test_freq_items_superset(spark):
    """freqItems must return a superset of true items above support —
    checked here on the RAW sketch API; the registered query now emits
    the same invariant as oracle-pinned values (n_true_hh +
    superset_ok per column)."""
    from splitserve_spark.tables import Tables

    t = Tables(spark, SF_DIR)
    fi = t.orders.stat.freqItems(["o_orderpriority"], support=0.2).collect()[0]
    freq_prio = set(fi["o_orderpriority_freqItems"])
    total = t.orders.count()
    truth = {
        r["o_orderpriority"]
        for r in t.orders.groupBy("o_orderpriority").count().collect()
        if r["count"] / total >= 0.2
    }
    assert truth <= freq_prio

    out = REGISTRY["stat_freq_items"].fn(spark, SF_DIR).toPandas()
    prio = out[out["col"] == "o_orderpriority"].iloc[0]
    assert prio["n_true_hh"] == len(truth)
    assert bool(prio["superset_ok"])


def test_approx_quantile_rank_error(spark):
    """GK sketch, BOTH regimes: the registered query runs the exact
    regime (relativeError=0, oracle-checked vs quantile_disc); the
    approximate regime (the 100 TB setting) must keep each returned
    value's true rank within the requested ±1% envelope."""
    import bisect

    from splitserve_spark.tables import Tables

    row = REGISTRY["stat_approx_quantile"].fn(spark, SF_DIR).collect()[0]
    t = Tables(spark, SF_DIR)
    vals = [r["o_totalprice"] for r in t.orders.select("o_totalprice").collect()]
    vals.sort()
    n = len(vals)
    for q, v in (("q25", 0.25), ("q50", 0.5), ("q75", 0.75)):
        rank = bisect.bisect_right(vals, row[q]) / n
        assert abs(rank - v) <= 0.001 + 1 / n, (q, row[q], rank)
    approx = t.orders.stat.approxQuantile(
        "o_totalprice", [0.25, 0.5, 0.75], 0.01
    )
    for v, av in zip((0.25, 0.5, 0.75), approx):
        rank = bisect.bisect_right(vals, av) / n
        assert abs(rank - v) <= 0.02, (v, av, rank)


def test_sample_by_rates(spark):
    """Stratified sample rates near requested fractions on the RAW
    sampleBy API (P=1.0 exact); the registered query now emits the
    same invariant as oracle-pinned values."""
    from splitserve_spark.operators.stats import SAMPLE_BY_FRACTIONS
    from splitserve_spark.tables import Tables

    t = Tables(spark, SF_DIR)
    smp = t.orders.sampleBy(
        "o_orderstatus", fractions=SAMPLE_BY_FRACTIONS, seed=42
    )
    got = {r["o_orderstatus"]: r["count"]
           for r in smp.groupBy("o_orderstatus").count().collect()}
    tot = {r["o_orderstatus"]: r["count"]
           for r in t.orders.groupBy("o_orderstatus").count().collect()}
    assert got["P"] == tot["P"]
    for k, frac in (("F", 0.2), ("O", 0.1)):
        rate = got.get(k, 0) / tot[k]
        assert abs(rate - frac) < 0.1, (k, rate)

    out = REGISTRY["stat_sample_by"].fn(spark, SF_DIR).toPandas()
    assert set(out["o_orderstatus"]) == set(tot)
    assert out["rate_within_5pct"].all()
    assert dict(zip(out["o_orderstatus"], out["n_stratum"])) == tot


def test_ks_statistic_bounded_and_sane(spark):
    """KS D ∈ [0, 1]; identical-distribution self-test gives D ≈ 0."""
    out = REGISTRY["stat_ks_two_sample"].fn(spark, SF_DIR).toPandas()
    assert len(out) == 1
    d = float(out["ks_d"].iloc[0])
    assert 0.0 <= d <= 1.0
    assert out["n_a"].iloc[0] > 0 and out["n_b"].iloc[0] > 0


def test_mann_whitney_u_range_and_symmetry(spark):
    """U_a ∈ [0, n_a·n_b]; U_a + U_b = n_a·n_b (so u_a determines its
    dual), and the z-score is finite."""
    import math

    out = REGISTRY["stat_mann_whitney"].fn(spark, SF_DIR).toPandas()
    assert len(out) == 1
    n_a, n_b = int(out["n_a"].iloc[0]), int(out["n_b"].iloc[0])
    u_a = float(out["u_a"].iloc[0])
    assert 0.0 <= u_a <= n_a * n_b
    assert math.isfinite(float(out["z_score"].iloc[0]))


def test_freq_items_sketch_superset_of_exact_twin(spark):
    """Family coherence: the freqItems sketch (superset guarantee) must
    contain every item the EXACT heavy-hitters twin reports — raw
    sketch arrays vs the twin, plus the registered query's per-column
    n_true_hh agreeing with the twin's row counts."""
    from splitserve_spark.tables import Tables

    t = Tables(spark, SF_DIR)
    sk = t.orders.stat.freqItems(
        ["o_orderpriority", "o_orderstatus"], support=0.2
    ).collect()[0]
    exact = REGISTRY["stat_heavy_hitters_exact"].fn(spark, SF_DIR).toPandas()
    for col in ("o_orderpriority", "o_orderstatus"):
        sketch_items = set(sk[f"{col}_freqItems"])
        exact_items = set(exact.loc[exact["col"] == col, "item"])
        assert exact_items <= sketch_items, (col, exact_items, sketch_items)

    out = REGISTRY["stat_freq_items"].fn(spark, SF_DIR).toPandas()
    for col in ("o_orderpriority", "o_orderstatus"):
        n_exact = int((exact["col"] == col).sum())
        assert int(out.loc[out["col"] == col, "n_true_hh"].iloc[0]) == n_exact
    assert out["superset_ok"].all()
