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
    # red in CORRECTNESS_r02 — fixed this round
    "skew_salted_join",
    "embedding_centroids_by_label",
    "approx_distinct_users",
    # round-3 architectural additions — custom DataSource source/sink,
    # offline state-store reader, backfill, sketch union, schema
    # evolution, DQ gate, full-outer join (completes the join matrix)
    "pysource_batch_rollup",
    "pysource_pushdown_purchases",
    "pysource_stream_rollup",
    "xml_export_roundtrip",
    "backfill_dynamic_overwrite",
    "hll_mergeable_sketch_union",
    "wire_sink_roundtrip",
    "streaming_state_inspection",
    "dq_constraint_report",
    "schema_evolution_merge_read",
    "full_outer_activity_join",
    # new in round 3 — never driver-checked
    "streaming_windowed_append",
    "streaming_session_append",
    "streaming_rate_source_etl",
    "streaming_stream_stream_join",
    "retention_expire_partitions",
    "similarity_multiprobe_lsh",
    "similarity_multitable_lsh",
    "similarity_recall_at_k",
    "dedup_cluster_components",
    "tfidf_top_terms",
    "embedding_quantize_int8",
    "quality_repetition_metrics",
    "pii_redaction_stats",
    "domain_blocklist_filter",
    "scd2_user_state",
    "approx_quantiles_check",
    "udtf_chunk_split",
    # session-3 additions answering explicit round-2 weaknesses (real
    # decode, approximation classes) or completing operator matrices —
    # promoted over six queries whose families already hold green rows
    "multimodal_wav_decode",
    "multimodal_png_decode",
    "theta_sketch_audience_overlap",
    "kmeans_lloyd_iterations",
    "snapshot_time_travel",
    "streaming_stream_stream_full_join",
    "event_funnel_conversion",
    "retention_cohorts",
    "user_event_transitions",
    "streaming_stream_stream_left_join",
    "corpus_curation_end_to_end",
    "small_file_compaction",
    "etl_dead_letter_routing",
    "shard_manifest_checksums",
    "streaming_static_enrich_join",
    "unpivot_order_metrics",
    "heavy_hitter_bigrams",
    "variant_nested_extract",
    "cdc_chunk_dedup",
    # displaced from the 50-window (families already driver-green);
    # first in line for round 4
    "contamination_ngram_overlap",
    "stratified_sample_docs",
    "boilerplate_chunk_removal",
    "pack_training_sequences",
    "train_val_test_split",
    "embedding_random_projection",
    # round-3 session-3 additions (UDAF surface, runtime bloom filter,
    # time-series gap fill) — next in line for the round-4 window
    "udaf_median_mad_by_type",
    "bloom_filter_join_pruning",
    "hourly_dense_locf",
    "incremental_rollup_maintenance",
    "tokenizer_bpe_pair_counts",
    "order_rank_profile",
    "bucketed_colocated_join",
    "streaming_update_mode_changelog",
    "map_column_roundtrip",
    "approx_topk_mergeable_tokens",
    "kll_quantile_sketch_check",
    "sql_udf_quality_score",
    "recursive_cte_user_hierarchy",
    "multimodal_png_resize",
    "zorder_locality_buckets",
    "snapshot_incremental_changes",
    "daily_distribution_drift",
    "daily_volume_anomaly",
    "pagerank_event_transitions",
    "streaming_chained_window_rollup",
    "sql_table_function_calendar",
    "file_metadata_audit",
    "ab_test_chi_square",
    "null_safe_join_counts",
    # last green row is round 1 (r2's 50-query budget skipped these)
    "top5_latest",
    "windowed_counts_60s",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q18_large_volume_customer",
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
    "tpch_q9_product_profit",
    "tpch_q11_part_value_concentration",
    "tpch_q12_late_shipment_priority",
    "tpch_q13_customer_order_histogram",
    "tpch_q16_supplier_count_by_part",
    "tpch_q19_or_predicate_revenue",
    "tpch_q20_promotion_suppliers",
    "tpch_q21_waiting_suppliers",
    # round-3 analytics-breadth queries deferred past the 50-budget
    # window: their operator families (analytic windows, histograms,
    # token stats, dedup survivors, exports) each already hold a green
    # driver row on an adjacent query, and all of these are
    # oracle-verified in tests/; they roll into the round-4 window.
    "running_user_value",
    "user_value_trend",
    "value_histogram_equiwidth",
    "doc_length_log_histogram",
    "zipf_token_rank",
    "top_bigrams_by_lang",
    "dedup_keep_canonical",
    "vocab_richness_by_source",
    "unigram_surprisal_by_doc",
    "chunk_dup_stats",
    "orc_export_roundtrip",
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
