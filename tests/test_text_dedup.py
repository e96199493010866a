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
