"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Queries live in streaming_data_pipeline_spark/plans/*; each plans module
exposes a QUERIES dict (Spark callables) and an ORACLE dict (DuckDB SQL
twins). This file only merges them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Full ETL chain (parse -> validate -> enrich -> quality-filter) feeding
    the A1 event-type rollup — the reference's core end-to-end path.
    """
    from streaming_data_pipeline_spark.plans.reference_queries import event_type_rollup

    return event_type_rollup(spark, SF_SMOKE_DIR)


# The driver sweeps queries() in dict (insertion) order with a 50-query
# budget per round. This explicit priority list rotates coverage:
# queries that were red last round and queries that have never had a
# driver row come first (architectural operators before analytics
# breadth), then the tranche whose last green row is oldest (the 33
# TPC-H + 2 reference-tail queries last verified in r1), then
# everything else. More names than the 50 budget: overflow rolls to
# the next round's window.
_SWEEP_PRIORITY = [
    # ---- round-5 window (driver budget: first 50) -------------------
    # 1 new query (real baseline JPEG decode), the 2 plans reshaped
    # this round (repartition-before-explode), the wire-sink ledger
    # reshaped in r4, then 34 of the 59 never-driver-checked backlog
    # (architectural operators first; poisson/permutation are both
    # backlog AND reshaped) and the 14 stalest TPC-H queries (evidence
    # from r1). Backlog after this window: 25. r6 retires the queue
    # below.
    "multimodal_jpeg_decode",
    "poisson_bootstrap_ci",
    "permutation_test_mean_diff",
    "wire_sink_roundtrip",
    "range_join_binned_incidents",
    "similarity_pq_adc",
    "cms_token_frequency",
    "epoch_shuffle_shards",
    "curriculum_mix_schedule",
    "dedup_unicode_normalized",
    "dedup_edit_distance_pairs",
    "graph_triangle_counts",
    "value_histogram_equidepth",
    "join_skew_diagnostics",
    "incremental_join_maintenance",
    "char_diversity_by_source",
    "inverted_index_postings",
    "dedup_containment_pairs",
    "gopher_rules_filter",
    "weighted_sample_docs",
    "max_concurrent_shipments",
    "bigram_lm_surprisal",
    "bpe_train_merges",
    "repeated_passage_coverage",
    "token_budget_selection",
    "k_core_peel_rounds",
    "streaming_quality_gate",
    "audio_energy_windows",
    "sparse_dot_topk_pairs",
    "pmi_collocations",
    "langid_confusion_metrics",
    "within_doc_dedup",
    "bpe_apply_compression",
    "grouped_leakage_free_split",
    "pca_power_iteration",
    "cross_source_dup_matrix",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q18_large_volume_customer",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q4_order_priority",
    "tpch_q17_small_quantity_revenue",
    "tpch_q2_cheapest_part_per_brand",
    "tpch_q22_idle_customers",
    "tpch_q8_market_share",
    # ---- round-6 queue ----------------------------------------------
    # FIRST: queries whose physical plans changed in round 5 after their
    # last driver row (spread_small_scan in the shared minhash/simhash/
    # multimodal stages — results identical, verified green in four full
    # sf0.01 sweeps + the skip-free sf0.1 sweep this round, but their
    # first-party rows predate the change), then the remaining
    # never-driver-checked queries, then the rest of the r1-stale tranche
    "dedup_near_minhash_lsh",
    "simhash_near_dup",
    "dedup_ngram_jaccard",
    "dedup_minhash_estimate_error",
    "dedup_cluster_components",
    "dedup_keep_canonical",
    "dedup_keep_best_quality",
    "image_phash_near_dup",
    "multimodal_png_decode",
    "multimodal_png_resize",
    "multimodal_wav_decode",
    "k_anonymity_audit",
    "dup_cluster_size_histogram",
    "similarity_recall_at_k",
    "ewma_user_value",
    "cumulative_unique_users_by_day",
    "first_touch_attribution",
    "winsorized_price_stats",
    "basket_lift_pairs",
    "interarrival_gap_stats",
    "seasonal_residual_anomaly",
    "top_event_paths",
    "mann_kendall_trend",
    "revenue_gini",
    "lorenz_curve_deciles",
    "theil_sen_slope",
    "ks_two_sample",
    "cusum_changepoint",
    "mann_whitney_u",
    "acf_lag_profile",
    "spearman_rank_correlation",
    "kaplan_meier_table",
    "neyman_allocation_sample",
    "median_imputation_audit",
    "benford_first_digit_audit",
    "linear_model_quality_gate",
    "dataset_datasheet",
    "top5_latest",
    "windowed_counts_60s",
    "revenue_by_region",
    "customers_with_orders",
    "customers_without_orders",
    "top_order_per_customer",
    "monthly_revenue_momentum",
    "nation_key_set_ops",
    "rollup_order_status",
    "cube_returnflag_status",
    "distinct_mktsegments",
    "sql_cte_priority_revenue",
    "asof_last_login_value",
    "tpch_q9_product_profit",
    "tpch_q11_part_value_concentration",
    "tpch_q12_late_shipment_priority",
    "tpch_q13_customer_order_histogram",
    "tpch_q16_supplier_count_by_part",
    "tpch_q19_or_predicate_revenue",
    "tpch_q20_promotion_suppliers",
    "tpch_q21_waiting_suppliers",
]


def _plan_modules():
    mods = []
    for name in (
        "analytics_queries",
        "curation_queries",
        "training_queries",
        "llm_queries",
        "streaming_queries",
        "pysource_queries",
        "scale_queries",
        "sql_surface_queries",
        "reference_queries",
        "tpch_queries",
        "tpch_extra_queries",
        "tpch_wide_queries",
    ):
        try:
            mods.append(
                __import__(
                    f"streaming_data_pipeline_spark.plans.{name}",
                    fromlist=[name],
                )
            )
        except ImportError:
            pass
    return mods


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, reordered
    so the driver's 50-query budget lands on the stalest evidence."""
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _plan_modules():
        merged.update(getattr(mod, "QUERIES", {}))
    out = {n: merged[n] for n in _SWEEP_PRIORITY if n in merged}
    out.update(merged)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin per query (omitted for the few
    genuinely non-SQL-expressible ops -> driver does rows-only check)."""
    out: dict[str, str] = {}
    for mod in _plan_modules():
        out.update(getattr(mod, "ORACLE", {}))
    return out
