"""Oracle cross-checks for the join/analytic suite (SURVEY.md §2.11
extensions: joins, window functions, set ops, rollup/cube, distinct)."""

import pytest

from tests.conftest import SF_DIR, SF_DIR_MID, assert_query_matches_oracle


def _names():
    from streaming_data_pipeline_spark.plans import tpch_queries

    return sorted(tpch_queries.QUERIES)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle_sf0001(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR)


@pytest.mark.parametrize(
    "name",
    ["tpch_q1_pricing_summary", "tpch_q3_shipping_priority", "tpch_q5_local_supplier_volume"],
)
def test_query_matches_oracle_sf001(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR_MID)


def test_broadcast_hint_in_plan(spark):
    """The dim side of q5 must be broadcast, not shuffled."""
    from streaming_data_pipeline_spark.plans.tpch_queries import q5_local_supplier_volume

    plan = q5_local_supplier_volume(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_top5_uses_take_ordered(spark):
    """top-k compiles to TakeOrderedAndProject (no global sort)."""
    from streaming_data_pipeline_spark.plans.tpch_queries import q3_shipping_priority

    plan = q3_shipping_priority(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
