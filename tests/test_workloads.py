from __future__ import annotations

import numpy as np
import pytest

from splitserve_spark.registry import REGISTRY, load_all
from tests.oracle_utils import SF_DIR, check_query

load_all()


@pytest.mark.parametrize(
    "name",
    [
        "graph_pagerank",
        "workload_pi",
        "ml_kmeans_onestep",
        "graph_triangle_count",
        "graph_bfs_levels",
        "graph_sssp_weighted",
        "graph_scc",
        "graph_kcore",
        "graph_adamic_adar",
    ],
)
def test_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)


def test_kcore_unroll_is_past_fixpoint(spark):
    """KCORE_ROUNDS must overshoot the peel fixpoint: one more round
    must not change the output (the margin the docstring promises)."""
    from splitserve_spark.operators import graph as g

    base = REGISTRY["graph_kcore"].fn(spark, SF_DIR).toPandas()
    orig = g.KCORE_ROUNDS
    try:
        g.KCORE_ROUNDS = orig + 1
        more = REGISTRY["graph_kcore"].fn(spark, SF_DIR).toPandas()
    finally:
        g.KCORE_ROUNDS = orig
    assert base.equals(more)
    # the 2-core is nontrivial: strictly between empty and everything
    assert 0 < len(base) < g.KCORE_N


def test_adamic_adar_hub_cap_excludes_hub_middles(spark):
    """The AA_DMAX hub cap must act BEFORE the 2-path self-join: a
    synthetic star hub with degree > AA_DMAX contributes no candidate
    pairs (its deg² fan-out is the 100 TB scale-killer), while pairs
    mediated by low-degree middles still score.  Also pins that the
    fixture graph's max degree sits under the cap, so the un-capped
    DuckDB oracle remains byte-identical evidence."""
    from pyspark.sql import functions as F

    from splitserve_spark.operators import graph as g

    # Star: hub 0 — leaves 1..100 (deg(0)=100 > AA_DMAX=64); plus a
    # path 200-201-202 whose middle 201 has degree 2.
    leaves = [(0, i) for i in range(1, 101)] + [(200, 201), (201, 202)]
    fwd = spark.createDataFrame(leaves, "src int, dst int")
    sym = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    scored = g._aa_scored(sym.distinct()).toPandas()
    # No pair is mediated by the hub: leaves 1..100 never pair up.
    assert not ((scored["u"] >= 1) & (scored["u"] <= 100)
                & (scored["w"] >= 1) & (scored["w"] <= 100)).any()
    # The low-degree middle still produces its pair with the exact weight.
    row = scored[(scored["u"] == 200) & (scored["w"] == 202)]
    assert len(row) == 1 and row["n_common"].iloc[0] == 1
    assert abs(row["aa_score"].iloc[0] - 1.0 / np.log(2.0)) < 1e-8

    # Fixture invariant: max middle degree < AA_DMAX at the test SF.
    from splitserve_spark.tables import Tables
    from splitserve_spark.functions.parity_hash import md5_hash60

    t = Tables(spark, SF_DIR)
    nodes = t.documents.filter(F.col("doc_id") < g.AA_N).select(
        F.col("doc_id").cast("int").alias("u"))

    def _h(tag):
        return md5_hash60(F.concat(F.lit(tag), F.col("u").cast("string")))

    e1 = nodes.select(F.col("u").alias("src"),
                      (_h("aa-e1-") % g.AA_N).cast("int").alias("dst"))
    e2 = nodes.filter(_h("aa-d-") % 2 == 0).select(
        F.col("u").alias("src"), (_h("aa-e2-") % g.AA_N).cast("int").alias("dst"))
    fix = e1.union(e2)
    fix_sym = (fix.union(fix.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
               .filter(F.col("src") != F.col("dst")).distinct())
    max_deg = (fix_sym.groupBy("src").count().agg(F.max("count")).first()[0])
    assert max_deg <= g.AA_DMAX, max_deg


def test_pi_close_to_pi(spark):
    val = REGISTRY["workload_pi"].fn(spark, SF_DIR).first()["pi_estimate"]
    assert abs(val - np.pi) < 0.02


def test_kmeans_ml(spark):
    """The upgraded value-bearing shape: one row, exact vector count,
    positive Lloyd-twin inertia, both invariant booleans true (the
    oracle pins the same values; this is the engine-side sanity)."""
    pdf = REGISTRY["ml_kmeans"].fn(spark, SF_DIR).toPandas()
    from splitserve_spark.tables import Tables

    assert len(pdf) == 1
    row = pdf.iloc[0]
    assert row["n_vectors"] == Tables(spark, SF_DIR).embeddings.count()
    assert row["lloyd_inertia"] > 0
    assert bool(row["ml_within_2pct_of_lloyd"]) and bool(row["n_clusters_ok"])


def test_kmeans_lloyd_matches_numpy(spark):
    """DataFrame Lloyd iterations must equal a numpy reference exactly
    (same init, same iteration count)."""
    from splitserve_spark.operators.ml import K, LLOYD_ITER
    from splitserve_spark.tables import Tables

    pdf = REGISTRY["ml_kmeans_lloyd"].fn(spark, SF_DIR).toPandas()
    emb = (
        Tables(spark, SF_DIR)
        .embeddings.orderBy("vec_id")
        .select("vec_id", "embedding")
        .toPandas()
    )
    X = np.array([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    cents = X[:K].copy()
    for _ in range(LLOYD_ITER):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for k in range(K):
            if (assign == k).any():
                cents[k] = X[assign == k].mean(axis=0)
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    expected = d.argmin(axis=1)
    got = pdf.sort_values("vec_id")["cluster"].to_numpy()
    agree = (got == expected).mean()
    assert agree > 0.99, f"assignment agreement {agree:.3f}"


def test_connected_components_oracle(spark):
    check_query(spark, "graph_connected_components", SF_DIR)


def test_connected_components_invariants(spark):
    """Every node's component label must be a member of the same
    component (label propagation fixpoint sanity)."""
    out = REGISTRY["graph_connected_components"].fn(spark, SF_DIR).toPandas()
    comp_of = dict(zip(out["node"], out["component"]))
    # a component's label is itself labelled with the same component
    for label in set(out["component"]):
        assert comp_of[label] == label


def test_label_propagation_deterministic_and_sane(spark):
    """LPA: two runs agree exactly (the min_by struct tie-break is the
    determinism guarantee), every node keeps a label drawn from the
    node-id space, and propagation coarsens the initial one-label-per-
    node state."""
    fn = REGISTRY["graph_label_propagation"].fn
    a = fn(spark, SF_DIR).toPandas()
    b = fn(spark, SF_DIR).toPandas()
    assert a.equals(b)
    assert a["node"].is_unique and len(a) > 0
    nodes = set(a["node"])
    assert set(a["community"]) <= nodes
    assert a["community"].nunique() < len(a)


def test_label_propagation_neighbors_share_membership(spark):
    """After convergence-ish rounds, a label is always one of the
    node's own 2-hop neighborhood labels — spot-check that every
    community has >= 2 members (the sampled bipartite graph has no
    isolated nodes by construction)."""
    out = REGISTRY["graph_label_propagation"].fn(spark, SF_DIR).toPandas()
    sizes = out.groupby("community").size()
    assert (sizes >= 1).all() and sizes.max() >= 2
