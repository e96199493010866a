from __future__ import annotations

import pytest

from splitserve_spark.registry import REGISTRY, load_all
from tests.oracle_utils import SF_DIR, check_query

load_all()

QDS = [
    "qds5_channel_rollup",
    "qds16_multi_site_no_returns",
    "qds94_web_no_returns",
    "qds95_both_sites_view",
    "qds3_brand_revenue",
    "qds7_demographic_item_avgs",
]


@pytest.mark.parametrize("name", QDS)
def test_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)


@pytest.mark.parametrize("name", QDS)
def test_nonempty_at_oracle_sf(spark, name):
    df = REGISTRY[name].fn(spark, "/root/testdata/sf0.01")
    assert df.count() >= 1
