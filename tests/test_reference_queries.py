"""Driver-style oracle cross-checks for every reference-surface query,
at sf0.001 (fast) and the full chain at sf0.01 (the driver's gate SF)."""

import pytest

from tests.conftest import SF_DIR, SF_DIR_MID, assert_query_matches_oracle


def _names():
    from streaming_data_pipeline_spark.plans import reference_queries

    return sorted(reference_queries.QUERIES)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle_sf0001(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR)


@pytest.mark.parametrize("name", ["etl_enrich_events", "event_type_rollup", "windowed_counts_60s"])
def test_query_matches_oracle_sf001(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR_MID)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "event_count" in df.columns
