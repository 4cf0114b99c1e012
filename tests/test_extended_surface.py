"""Oracle cross-checks for the coverage-widening suites:
tpch_extra_queries (Q2/Q4/Q6/Q7/Q10/Q14/Q15/Q17/Q22 shapes),
sql_surface_queries (grouping sets, pivot, percentiles, JSON path,
collect aggregation, RANGE frames, rank family), and the new streaming
queries (sliding windows, streaming dedup, custom stateful operator,
wire->ETL->sink roundtrip)."""

import pytest

from tests.conftest import SF_DIR, SF_DIR_MID, assert_query_matches_oracle


def _names(module_name):
    import importlib

    mod = importlib.import_module(f"streaming_data_pipeline_spark.plans.{module_name}")
    return sorted(mod.QUERIES)


@pytest.mark.parametrize("name", _names("tpch_extra_queries"))
def test_tpch_extra_matches_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR)


@pytest.mark.parametrize(
    "name", ["tpch_q7_volume_shipping", "tpch_q22_idle_customers"]
)
def test_tpch_extra_matches_oracle_sf001(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR_MID)


@pytest.mark.parametrize(
    "name",
    [n for n in _names("sql_surface_queries") if n != "approx_distinct_users"],
)
def test_sql_surface_matches_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR)


def test_approx_distinct_within_tolerance(spark):
    """approx_count_distinct has no cross-engine oracle; assert the
    HLL++ estimate lands within 5% of the exact count."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["approx_distinct_users"](spark, SF_DIR_MID).collect()
    assert len(rows) > 0
    for r in rows:
        assert abs(r.approx_users - r.exact_users) <= max(1, 0.05 * r.exact_users), (
            r.event_type,
            r.approx_users,
            r.exact_users,
        )


@pytest.mark.parametrize(
    "name",
    [
        "streaming_sliding_counts",
        "streaming_dedup_user_event",
        "streaming_stateful_user_totals",
        "streaming_etl_file_roundtrip",
    ],
)
def test_streaming_extra_matches_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR)


def test_q6_filters_pushed_to_scan(spark):
    """Q6's predicates must reach the parquet scan (PushedFilters)."""
    from streaming_data_pipeline_spark.plans.tpch_extra_queries import q6_forecast_revenue

    plan = (
        q6_forecast_revenue(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_discount)" in plan or "GreaterThanOrEqual(l_discount" in plan


def test_q7_broadcasts_dims(spark):
    from streaming_data_pipeline_spark.plans.tpch_extra_queries import q7_volume_shipping

    plan = (
        q7_volume_shipping(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
