from __future__ import annotations

import pytest

from splitserve_spark.registry import load_all
from tests.oracle_utils import SF_DIR, check_query

load_all()

TPCH = [
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_shipping_lateness",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q20_potential_promotion",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
]


@pytest.mark.parametrize("name", TPCH)
def test_oracle_match(spark, name):
    check_query(spark, name, SF_DIR)


@pytest.mark.parametrize("name", TPCH)
def test_nonempty_at_oracle_sf(spark, name):
    """Every adapted query must be non-trivial (≥1 row) at sf0.01 so the
    driver's hash compare exercises real values."""
    from splitserve_spark.registry import REGISTRY

    df = REGISTRY[name].fn(spark, "/root/testdata/sf0.01")
    assert df.count() >= 1
