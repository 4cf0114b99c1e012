"""Analytics surface (plans/analytics_queries.py): driver-style oracle
parity plus semantic invariants for the funnel / cohort / dedup-survivor
operators."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, SF_DIR_MID, assert_query_matches_oracle

NAMES = [
    "event_funnel_conversion",
    "retention_cohorts",
    "running_user_value",
    "top_bigrams_by_lang",
    "zipf_token_rank",
    "doc_length_log_histogram",
    "dedup_keep_canonical",
    "user_value_trend",
    "value_histogram_equiwidth",
    "user_event_transitions",
]


@pytest.mark.parametrize("name", NAMES)
def test_analytics_queries_match_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR)


def test_funnel_is_monotone(spark):
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        event_funnel_conversion,
    )

    rows = event_funnel_conversion(spark, SF_DIR_MID).collect()
    counts = [r.n_users for r in sorted(rows, key=lambda r: r.stage)]
    assert counts == sorted(counts, reverse=True)
    assert rows[0].conversion == 1.0 or counts[0] == 0


def test_cohort_offset_zero_is_full(spark):
    """Every user is active in their own cohort week, so offset 0 rows
    must have retention exactly 1.0 and n_active == cohort_size."""
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        retention_cohorts,
    )

    for r in retention_cohorts(spark, SF_DIR_MID).collect():
        assert r.week_offset >= 0
        if r.week_offset == 0:
            assert r.n_active == r.cohort_size and r.retention == 1.0


def test_keep_canonical_covers_corpus(spark):
    """Survivor manifest invariants: keeper is the cluster min (== the
    cluster_id label by construction), sizes sum to the corpus size,
    and removed = size - 1 per cluster."""
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        dedup_keep_canonical,
    )
    from streaming_data_pipeline_spark.sources.batch import load_table

    rows = dedup_keep_canonical(spark, SF_DIR_MID).collect()
    n_docs = load_table(spark, SF_DIR_MID, "documents").count()
    assert sum(r.cluster_size for r in rows) == n_docs
    for r in rows:
        assert r.keeper_doc == r.cluster_id
        assert r.n_removed == r.cluster_size - 1


def test_zipf_topk_avoids_global_window_shuffle(spark):
    """The vocabulary-wide top-k must be TakeOrderedAndProject (merged
    partial top-k), not a single-partition global window sort."""
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        zipf_token_rank,
    )

    plan = zipf_token_rank(spark, SF_DIR_MID)._jdf.queryExecution().toString()
    assert "TakeOrderedAndProject" in plan
