from __future__ import annotations

import pytest

from splitserve_spark.registry import REGISTRY, load_all
from tests.oracle_utils import SF_DIR, check_query

load_all()

NAMES = sorted(
    n
    for n, s in REGISTRY.items()
    if n.startswith(("text_", "dedup_")) and s.oracle is not None
)


@pytest.mark.parametrize("name", NAMES)
def test_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)


def test_minhash_estimates_jaccard(spark):
    """MinHash signature agreement must approximate true Jaccard."""
    import pandas as pd

    sig = REGISTRY["dedup_minhash_signature"].fn(spark, SF_DIR).toPandas()
    assert sig["doc_id"].is_unique and len(sig) > 0
    # Signatures are 8 independent permutation minima in [0, P).
    for c in [f"m{i}" for i in range(8)]:
        assert (sig[c] >= 0).all() and (sig[c] < 2_147_483_647).all()


def test_simhash_identical_texts_collide(spark):
    from pyspark.sql import functions as F

    sim = REGISTRY["dedup_simhash"].fn(spark, SF_DIR)
    assert sim.filter((F.col("simhash") < 0) | (F.col("simhash") >= 1 << 16)).count() == 0


def test_pipeline_training_data_oracle(spark):
    check_query(spark, "pipeline_training_data", SF_DIR)


def test_pipeline_stages_monotone(spark):
    """Each pipeline stage can only shrink the corpus, and survivors
    satisfy the quality gate."""
    from splitserve_spark.operators.pipeline import MIN_CHARS, MIN_WORDS
    from splitserve_spark.tables import Tables

    out = REGISTRY["pipeline_training_data"].fn(spark, SF_DIR).toPandas()
    total = Tables(spark, SF_DIR).documents.count()
    assert 0 < len(out) <= total
    assert (out["n_chars_obs"] >= MIN_CHARS).all()
    assert (out["n_words"] >= MIN_WORDS).all()
    assert out["doc_id"].is_unique


def test_cluster_canonical_transitive_and_consistent(spark):
    """Cluster resolution must be transitive (one canonical per
    component, even for pairs never directly emitted) and consistent
    with the pair ground truth."""
    out = REGISTRY["dedup_cluster_canonical"].fn(spark, SF_DIR).toPandas()
    pairs = REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_DIR).toPandas()
    lab = dict(zip(out["doc_id"], out["canonical_id"]))
    # Every doc in a pair got a label; both ends share one.
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        assert lab[a] == lab[b], (a, b)
    # Canonical ids are cluster minima and themselves in the cluster.
    assert (out["canonical_id"] <= out["doc_id"]).all()
    assert set(out["canonical_id"]) <= set(out["doc_id"])
    assert (out.loc[out["doc_id"] == out["canonical_id"], "is_canonical"] == 1).all()


def test_minhash_lsh_hot_clique_corpus(spark, tmp_path):
    """Correctness under the skew the exact-collapse front end exists
    for: a corpus where most documents are byte-identical copies of
    one boilerplate page (the 100 TB hot-fingerprint case, extreme
    enough that the pre-collapse design would expand a 1500-deep
    bucket inside one task).

    Checks the exact pair semantics on this synthetic corpus:
    - every copy pair of the hot page is emitted with jaccard == 1.0
      (1500 copies -> 1500*1499/2 pairs),
    - distinct near-dup documents still pair through the banded path,
    - unrelated documents pair with nothing.
    """
    import pandas as pd

    hot = "the requested page could not be found please check the url and try again"
    near_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near_b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    unrelated = "completely different content about distributed query engines"
    n_hot = 1500
    rows = [(i, hot) for i in range(n_hot)]
    rows += [(n_hot, near_a), (n_hot + 1, near_b), (n_hot + 2, unrelated)]
    pd.DataFrame(rows, columns=["doc_id", "text"]).assign(
        lang="en", source="srcX", n_chars=lambda d: d["text"].str.len()
    ).to_parquet(tmp_path / "documents.parquet")

    out = (
        REGISTRY["dedup_minhash_lsh"].fn(spark, str(tmp_path)).toPandas()
    )
    hot_pairs = out[(out["doc_a"] < n_hot) & (out["doc_b"] < n_hot)]
    assert len(hot_pairs) == n_hot * (n_hot - 1) // 2
    assert (hot_pairs["jaccard"] == 1.0).all()
    near = out[(out["doc_a"] == n_hot) & (out["doc_b"] == n_hot + 1)]
    assert len(near) == 1 and 0.3 <= float(near["jaccard"].iloc[0]) < 1.0
    assert not ((out["doc_a"] == n_hot + 2) | (out["doc_b"] == n_hot + 2)).any()
    # No hot-to-near leakage: the hot page shares no shingles with the
    # near-dup block, so any such pair would be a banding/expansion bug.
    leak = out[(out["doc_a"] < n_hot) & (out["doc_b"] >= n_hot)]
    assert leak.empty


def test_substring_spans_planted_corpus(spark, tmp_path):
    """Hand-computable substring-dedup semantics on a planted corpus:
    - docs 0/1 share a 20-token run embedded at the same offset in
      otherwise-unique text -> one merged span [6, 25] in each,
    - doc 2 repeats a 10-token block back-to-back -> TWO spans
      ([1,10] and [11,20]: the windows at the seam differ, so the
      islands must NOT merge),
    - doc 3 (unique, >= K tokens) and doc 4 (< K tokens) are absent,
    - docs 5/6 are byte-identical -> one whole-doc span, dup_frac 1.0.
    """
    import pandas as pd

    from splitserve_spark.operators.dedup import SUBSTR_WIN

    assert SUBSTR_WIN == 8, "expectations below are computed for K=8"
    a = [f"a{i}" for i in range(1, 31)]
    doc0 = " ".join(a)
    doc1 = " ".join([f"b{i}" for i in range(1, 6)] + a[5:25]
                    + [f"b{i}" for i in range(6, 11)])
    r = [f"r{i}" for i in range(1, 11)]
    doc2 = " ".join(r + r + [f"u{i}" for i in range(1, 11)])
    doc3 = " ".join(f"d{i}" for i in range(1, 13))
    doc4 = "e1 e2 e3 e4 e5"
    doc5 = " ".join(f"f{i}" for i in range(1, 16))
    rows = [(0, doc0), (1, doc1), (2, doc2), (3, doc3), (4, doc4),
            (5, doc5), (6, doc5)]
    pd.DataFrame(rows, columns=["doc_id", "text"]).assign(
        lang="en", source="srcX", n_chars=lambda d: d["text"].str.len()
    ).to_parquet(tmp_path / "documents.parquet")

    out = (
        REGISTRY["dedup_substring_spans"].fn(spark, str(tmp_path))
        .toPandas().set_index("doc_id")
    )
    assert sorted(out.index) == [0, 1, 2, 5, 6]
    for d in (0, 1):
        assert out.loc[d, "n_spans"] == 1
        assert out.loc[d, "dup_tokens"] == 20
        assert out.loc[d, "tok_count"] == 30
        assert out.loc[d, "dup_frac"] == 20 / 30
    assert out.loc[2, "n_spans"] == 2
    assert out.loc[2, "dup_tokens"] == 20
    assert out.loc[2, "tok_count"] == 30
    for d in (5, 6):
        assert out.loc[d, "n_spans"] == 1
        assert out.loc[d, "dup_tokens"] == 15
        assert out.loc[d, "dup_frac"] == 1.0
