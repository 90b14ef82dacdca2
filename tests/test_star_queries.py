"""Oracle-parity tests for the general relational surface (SURVEY §2.3-§2.6)."""

from __future__ import annotations

import pytest

from tests.oracle import check_registered

STAR_QUERIES = [
    "star_pricing_summary",
    "star_top_revenue_orders",
    "star_region_revenue",
    "star_orders_with_lineitems_semi",
    "star_customers_without_orders_anti",
    "star_customer_order_counts_left",
    "star_supplier_part_distinct",
    "star_cube_quantity",
    "star_rollup_orderpriority",
    "star_top3_parts_per_supplier",
    "star_running_quantity",
    "star_order_gap_lag",
    "star_setops",
    "star_setops_except",
    "star_pivot_linestatus",
    "star_shipping_priority",
    "star_nation_volume",
]


@pytest.mark.parametrize("name", STAR_QUERIES)
def test_star_query_matches_oracle(spark, duck, name):
    check_registered(spark, duck, name)


def test_nation_volume_broadcasts_all_dims(spark):
    """Every dimension hop is a broadcast join; no nested loop and no
    cartesian anywhere in the five-way plan."""
    from insight_de_smart_grid_spark.plans.registry import QUERIES
    from tests.conftest import SF_ORACLE

    plan = (QUERIES["star_nation_volume"].fn(spark, SF_ORACLE)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("BroadcastHashJoin") >= 4
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
