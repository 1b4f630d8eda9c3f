"""Plan + semantics pins for the deep TPC-H family (queries/tpch_deep_q.py).

The value-level correctness of every query is covered by the oracle gate
(tests/test_oracle.py runs the whole registry); these tests pin the PLAN
properties that make the decorrelated shapes scale — broadcast dimensions,
no cartesian products, TakeOrderedAndProject for top-k, and the
window-over-aggregate scalar decorrelation staying on the small frame.
"""

from __future__ import annotations

import re

from mysql2psql_spark.queries import QUERIES
from tests.conftest import SF_DIR_ORACLE

DEEP = [
    "q02_min_cost_supplier",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q11_important_stock",
    "q12_latency_priority",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q20_promo_volume_suppliers",
    "q21_waiting_suppliers",
    "q22_sales_opportunity",
]


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_no_cartesian_products(spark):
    for name in DEEP:
        plan = _plan(QUERIES[name](spark, SF_DIR_ORACLE))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_dimension_hops_broadcast(spark):
    # every query that touches a dimension table must BHJ it, never
    # shuffle the fact side for a 100-row dimension
    for name in (
        "q02_min_cost_supplier",
        "q07_volume_shipping",
        "q08_market_share",
        "q09_product_profit",
        "q16_supplier_part_counts",
        "q20_promo_volume_suppliers",
    ):
        plan = _plan(QUERIES[name](spark, SF_DIR_ORACLE))
        assert "BroadcastHashJoin" in plan, name


def test_q21_topk_is_take_ordered(spark):
    plan = _plan(QUERIES["q21_waiting_suppliers"](spark, SF_DIR_ORACLE))
    assert "TakeOrderedAndProject" in plan


def test_q16_exclusion_is_anti_join(spark):
    plan = _plan(QUERIES["q16_supplier_part_counts"](spark, SF_DIR_ORACLE))
    assert re.search(r"LeftAnti", plan), plan


def test_q20_membership_is_semi_join(spark):
    plan = _plan(QUERIES["q20_promo_volume_suppliers"](spark, SF_DIR_ORACLE))
    assert re.search(r"LeftSemi", plan), plan


def test_scalar_decorrelation_windows_sit_on_aggregates(spark):
    """Q11/Q15's global-total window must run ABOVE the group aggregate
    (a |groups|-row single partition), not over the fact table: the plan
    shows the Window after a HashAggregate, and the fact scan feeds the
    aggregate, not the window."""
    for name in ("q11_important_stock", "q15_top_supplier"):
        plan = _plan(QUERIES[name](spark, SF_DIR_ORACLE))
        assert "Window" in plan, name
        agg_pos = plan.find("HashAggregate")
        win_pos = plan.find("Window")
        assert agg_pos != -1 and win_pos != -1, name
        # formatted explain lists operators leaves-last; the Window node
        # must appear before (= above) at least one HashAggregate
        assert win_pos < plan.rfind("HashAggregate"), name


def test_q13_left_join_keeps_orderless_customers(spark):
    df = QUERIES["q13_customer_distribution"](spark, SF_DIR_ORACLE)
    rows = {r["c_count"]: r["custdist"] for r in df.collect()}
    # the distribution must include SOME customers (left-outer semantics);
    # total across buckets == |customer|
    assert sum(rows.values()) == 1500


def test_q15_ties_kept(spark):
    # equality against the window max keeps every tied supplier; at least
    # one row always survives
    assert QUERIES["q15_top_supplier"](spark, SF_DIR_ORACLE).count() >= 1
