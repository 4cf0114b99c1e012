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
    # ---- round-7 window (driver budget: first 50) -------------------
    # FIRST: the 12 queries whose plans/oracles changed THIS round —
    # the de-triplication refactor (Gopher rules + banding SQL now
    # single-sourced in functions/quality_rules.py + plans/
    # oracle_text.py), the simhash/phash option work in operators/
    # dedup.py (simhash_sig width param, phash emit='star'), and the
    # streaming _wm timezone-warning change (windowed_counts_60s is
    # the one windowed query with an r6-fresh row to re-stamp). All
    # re-verified green in this round's scoped + full sf0.01 sweeps;
    # the window gives them fresh first-party driver rows.
    "gopher_rules_filter",
    "streaming_quality_gate",
    "linear_model_quality_gate",
    "dedup_near_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_minhash_estimate_error",
    "dedup_cluster_components",
    "dedup_keep_canonical",
    "simhash_near_dup",
    "simhash_signatures",
    "image_phash_near_dup",
    "windowed_counts_60s",
    # THEN the pre-staged r7 queue from the r6 verdict: the 8 rows
    # whose plans changed in the r6 hardening pass after the r6 window
    # froze, the pysource trio, the 11 remaining r1-stale rows.
    "similarity_pq_adc",
    "similarity_multiprobe_lsh",
    "similarity_multitable_lsh",
    "similarity_int8_rerank",
    "semantic_dedup_keep_canonical",
    "udaf_median_mad_by_type",
    "small_file_compaction",
    "heavy_hitter_bigrams",
    "pmi_collocations",
    "daily_volume_anomaly",
    "bpe_train_merges",
    "skew_salted_join",
    "boilerplate_chunk_removal",
    "within_doc_dedup",
    "embedding_random_projection",
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
    "pysource_batch_rollup",
    "pysource_pushdown_purchases",
    "pysource_stream_rollup",
    # THEN as much of the r2-stale tranche as fits the 50 budget.
    "text_stats_by_lang",
    "token_counts_by_source",
    "lang_id_heuristic",
    "doc_fingerprints",
    "doc_quality_by_source",
    "dedup_exact_text",
    "dedup_token_set",
    "similarity_topk_bruteforce",
    "similarity_ann_lsh",
    # ---- round-8 queue (overflow past the 50 budget) ----------------
    # The 12 head insertions pushed these 12 pre-staged names out of
    # the r7 window; they lead r8, followed by the rest of the r2-stale
    # tranche, then the freshest (r6-window) rows rotate last. The
    # final r8 ordering is regenerated mechanically at round end by
    # tools/evidence_age.py (fingerprint baseline recorded after the
    # closing full sweep).
    "similarity_ivf",
    "embedding_near_dup_pairs",
    "multimodal_decode_fake",
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    "streaming_windowed_counts",
    "streaming_user_sessions",
    "streaming_sliding_counts",
    "streaming_dedup_user_event",
    "streaming_stateful_user_totals",
    "streaming_etl_file_roundtrip",
    "streaming_foreach_batch_upsert",
    "partitioned_sink_pruning",
    "sessionize_events_batch",
    "range_join_promo_windows",
    "csv_export_roundtrip",
    "grouping_sets_revenue",
    "pivot_priority_by_status",
    "order_price_percentiles",
    "json_props_extract",
    "collect_sources_per_lang",
    "rolling_weekly_revenue",
    "customer_balance_quartiles",
    "json_export_roundtrip",
    "etl_enrich_events",
    "event_type_rollup",
    "quality_score_distribution",
    "smoke_count",
    "health_check",
    "value_counts",
    "hour_buckets",
    "recent_count",
    "global_mean",
    "schema_introspection",
    # r6-window rows (freshest evidence, rotate last)
    "dedup_edit_distance_pairs",
    "multimodal_jpeg_decode",
    "wire_sink_roundtrip",
    "dedup_keep_best_quality",
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
    "dataset_datasheet",
    "top5_latest",
    "revenue_by_region",
    "customers_with_orders",
    "customers_without_orders",
    "top_order_per_customer",
    "monthly_revenue_momentum",
    "nation_key_set_ops",
    "rollup_order_status",
    "cube_returnflag_status",
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
