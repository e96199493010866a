from __future__ import annotations

import pytest

from splitserve_spark.registry import REGISTRY, load_all
from tests.oracle_utils import SF_DIR, check_query

load_all()

# Module-based selection (minus the manifest set parametrized below)
# so new registrations in this module can't silently miss coverage.
_MANIFEST = {
    "split_train_eval", "filter_reason_codes", "mix_importance_weights",
    "text_token_histogram", "mix_temperature_weights", "pii_detect_stats",
}
ORACLED = sorted(
    n
    for n, s in REGISTRY.items()
    if s.fn.__module__ == "splitserve_spark.operators.training_prep"
    and s.oracle is not None and n not in _MANIFEST
)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)


def test_stratified_sample_exact_k_per_source(spark):
    from splitserve_spark.operators.training_prep import STRAT_K

    pdf = REGISTRY["sample_stratified_topk"].fn(spark, SF_DIR).toPandas()
    per = pdf.groupby("source").size()
    assert (per == STRAT_K).all(), per[per != STRAT_K]
    # Deterministic: a second run picks the identical sample.
    again = REGISTRY["sample_stratified_topk"].fn(spark, SF_DIR).toPandas()
    assert pdf.equals(again)


def test_pseudonymize_is_stable_and_masked(spark):
    out = REGISTRY["pii_pseudonymize"].fn(spark, SF_DIR).toPandas()
    # Surrogates are unique per identity and contain no original digits.
    assert out["pseudo_id"].nunique() == len(out)
    assert not out["masked_name"].str.contains(r"[0-9]").any()


def test_boilerplate_nonvacuous(spark):
    out = REGISTRY["text_boilerplate"].fn(spark, SF_DIR).toPandas()
    assert (out["n_boiler"] > 0).sum() > 0, "boilerplate threshold vacuous"
    assert (out["boiler_ratio"] <= 1.0).all()


def test_pack_sequences_invariants(spark):
    out = REGISTRY["pack_sequences"].fn(spark, SF_DIR).toPandas()
    # Within each shard, offsets are the exclusive prefix sum of tokens.
    for _, g in out.groupby("source"):
        g = g.sort_values("doc_id")
        assert (g["offset_tokens"].values[1:]
                == (g["offset_tokens"] + g["n_tokens"]).values[:-1]).all()
    assert (out["chunk_first"] <= out["chunk_last"]).all()


def test_pack_sequences_window_is_sharded(spark):
    """The packing cumsum must partition by shard — a global (empty
    partitionBy) window would serialize the 100 TB corpus through one
    task."""
    from splitserve_spark.plans.inspect import physical_plan

    plan = physical_plan(REGISTRY["pack_sequences"].fn(spark, SF_DIR))
    assert "windowspecdefinition(source" in plan, plan


def test_mix_quota_exact_and_deterministic(spark):
    a = REGISTRY["mix_domains_quota"].fn(spark, SF_DIR).toPandas()
    b = REGISTRY["mix_domains_quota"].fn(spark, SF_DIR).toPandas()
    assert a.equals(b)
    from splitserve_spark.operators.training_prep import MIX_QUOTA

    assert (a.groupby("source").size() <= MIX_QUOTA).all()


def test_mix_quota_has_window_group_limit(spark):
    """Per-domain top-quota must prune partitions before the sort
    (WindowGroupLimit pushdown), not rank the full corpus."""
    from splitserve_spark.plans.inspect import physical_plan

    plan = physical_plan(REGISTRY["mix_domains_quota"].fn(spark, SF_DIR))
    assert "WindowGroupLimit" in plan, plan


MANIFEST_ORACLED = sorted(_MANIFEST)


@pytest.mark.parametrize("name", MANIFEST_ORACLED)
def test_manifest_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)


def test_split_is_deterministic_and_near_target(spark):
    a = REGISTRY["split_train_eval"].fn(spark, SF_DIR).toPandas()
    b = REGISTRY["split_train_eval"].fn(spark, SF_DIR).toPandas()
    assert a.equals(b)
    by_split = a.groupby("split")["n_docs"].sum()
    frac = by_split.get("eval", 0) / by_split.sum()
    # 5% target with binomial slack on a 500-doc corpus.
    assert 0.005 <= frac <= 0.15, frac


def test_filter_reasons_nondegenerate(spark):
    out = REGISTRY["filter_reason_codes"].fn(spark, SF_DIR).toPandas()
    counts = out["reason"].value_counts()
    assert set(counts.index) == {"too_short", "too_long", "repetitive", "ok"}
    assert (counts > 0).all()


def test_importance_weights_normalize(spark):
    """share-weighted sum of weights = 1 (the weights reproduce the
    uniform target when applied to the actual distribution)."""
    out = REGISTRY["mix_importance_weights"].fn(spark, SF_DIR).toPandas()
    assert abs((out["actual_share"] * out["weight"]).sum() - 1.0) < 1e-3


def test_token_histogram_covers_corpus(spark):
    out = REGISTRY["text_token_histogram"].fn(spark, SF_DIR).toPandas()
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    assert out["n_docs"].sum() == n
    assert (out["bin_lo"] % 10 == 0).all()


def test_temperature_weights_normalize_and_flatten(spark):
    """Sampling probabilities sum to 1 and alpha<1 pulls every source
    toward uniform (upweight >= 1 for below-average sources)."""
    import math

    out = REGISTRY["mix_temperature_weights"].fn(spark, SF_DIR).toPandas()
    assert math.isclose(out["sample_prob"].sum(), 1.0, abs_tol=1e-6)
    mean_n = out["n_docs"].mean()
    small = out[out["n_docs"] < mean_n]
    if len(small):
        assert (small["upweight"] >= 1.0 - 1e-9).all()


def test_group_holdout_sources_never_straddle(spark):
    """The group split's whole point: every source lies entirely in
    one split (doc-level split can't promise this), and both splits
    are non-empty on this corpus."""
    from splitserve_spark.functions.parity_hash import md5_hash60
    from splitserve_spark.operators.training_prep import EVAL_PCT
    from splitserve_spark.tables import Tables

    import pyspark.sql.functions as F

    docs = Tables(spark, SF_DIR).documents
    per_source = (
        docs.select(
            "source",
            F.when(
                md5_hash60(F.concat(F.lit("grp-"), F.col("source"))) % 100
                < EVAL_PCT,
                "eval",
            )
            .otherwise("train")
            .alias("split"),
        )
        .groupBy("source")
        .agg(F.countDistinct("split").alias("n_splits"))
        .toPandas()
    )
    assert (per_source["n_splits"] == 1).all()
    manifest = (
        REGISTRY["split_group_holdout"].fn(spark, SF_DIR).toPandas()
    )
    assert set(manifest["split"]) == {"eval", "train"}
    assert (manifest["n_sources"] > 0).all()


def test_split_dedup_cluster_no_straddle(spark):
    """The leakage-safe split's converged invariant: for EVERY edge of
    the component graph (exact-twin pairs corpus-wide, fenced near-dup
    pairs), both endpoints carry the same cluster label — hence the
    same split side (split is a pure function of the label).  Also
    sanity-pins the eval share."""
    from pyspark.sql import functions as F

    from splitserve_spark.registry import REGISTRY

    out = (
        REGISTRY["split_dedup_cluster"].fn(spark, SF_DIR)
        .toPandas().set_index("doc_id")
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), " +", " ")
    fp = docs.select("doc_id", F.md5(norm.cast("binary")).alias("fp")).toPandas()
    # exact-twin edges: all docs sharing a fingerprint
    for _, grp in fp.groupby("fp"):
        ids = list(grp["doc_id"])
        labels = {out.loc[d, "cluster_id"] for d in ids}
        assert len(labels) == 1, f"exact twins {ids} split across {labels}"
    # fenced near-dup edges: co-members per dedup_cluster_canonical
    canon = (
        REGISTRY["dedup_cluster_canonical"].fn(spark, SF_DIR).toPandas()
    )
    for _, grp in canon.groupby("canonical_id"):
        ids = list(grp["doc_id"])
        labels = {out.loc[d, "cluster_id"] for d in ids}
        assert len(labels) == 1, f"near-dups {ids} split across {labels}"
        sides = {out.loc[d, "split"] for d in ids}
        assert len(sides) == 1
    frac = (out["split"] == "eval").mean()
    assert 0.0 < frac < 0.3, f"eval share {frac} out of range"
