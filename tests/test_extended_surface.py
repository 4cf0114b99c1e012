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


@pytest.mark.parametrize("name", _names("sql_surface_queries"))
def test_sql_surface_matches_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR)


def test_approx_distinct_within_tolerance(spark):
    """The self-validating HLL++ query must report the estimate within 5%
    of exact for every group (its oracle asserts literal TRUE)."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["approx_distinct_users"](spark, SF_DIR_MID).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.approx_within_5pct, (r.event_type, r.exact_users)


@pytest.mark.parametrize(
    "name",
    [
        "streaming_sliding_counts",
        "streaming_dedup_user_event",
        "streaming_stateful_user_totals",
        "streaming_etl_file_roundtrip",
        "streaming_foreach_batch_upsert",
    ],
)
def test_streaming_extra_matches_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR)


@pytest.mark.parametrize(
    "name",
    [
        "dedup_ngram_jaccard",
        "simhash_near_dup",
        "similarity_ivf",
        "csv_export_roundtrip",
    ],
)
def test_new_llm_ops_match_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR)


def test_ngram_jaccard_order_sensitive(spark):
    """Word-shingle Jaccard must distinguish reordered documents that
    bag-of-words Jaccard conflates."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_spark.operators.dedup import minhash_lsh_pairs
    from streaming_data_pipeline_spark.functions.text import word_shingles

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "dog lazy the over jumps fox brown quick the"),
        ],
        "doc_id long, text string",
    )
    word_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(df, threshold=0.8).collect()
    }
    shingle_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(df, threshold=0.8, tokens_fn=word_shingles).collect()
    }
    assert (1, 2) in word_pairs and (1, 3) in word_pairs
    assert (1, 2) in shingle_pairs and (1, 3) not in shingle_pairs


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


@pytest.mark.parametrize("name", _names("tpch_wide_queries"))
def test_tpch_wide_matches_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR)


@pytest.mark.parametrize("name", _names("scale_queries"))
def test_scale_queries_match_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR)


def test_partitioned_sink_prunes_partitions(spark):
    """The partitioned warehouse read must carry the date predicate as a
    PartitionFilter (pruned listing), not a post-scan filter."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from streaming_data_pipeline_spark.sources.batch import load_table

    ev = load_table(spark, SF_DIR, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    base = tempfile.mkdtemp(prefix="spark_graft_prune_")
    try:
        ev.write.mode("overwrite").partitionBy("event_date").parquet(base)
        back = spark.read.parquet(base).filter(
            F.col("event_date").between("2024-01-08", "2024-01-14")
        )
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "event_date" in plan.split(
            "PartitionFilters"
        )[1].split("]")[0]
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_bucketed_join_avoids_shuffle(spark):
    """Pre-bucketed tables on the join key must sort-merge-join with NO
    Exchange (the 100 TB co-located-join pattern: bucket layout replaces
    the per-query shuffle)."""
    from streaming_data_pipeline_spark.sources.batch import load_table

    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode(
        "overwrite"
    ).saveAsTable("orders_bkt")
    cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey").mode(
        "overwrite"
    ).saveAsTable("customer_bkt")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_bkt").join(
            spark.table("customer_bkt"),
            spark.table("orders_bkt").o_custkey
            == spark.table("customer_bkt").c_custkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS customer_bkt")


@pytest.mark.parametrize(
    "name",
    [
        "etl_enrich_events",
        "event_type_rollup",
        "tpch_q1_pricing_summary",
        "dedup_near_minhash_lsh",
        "similarity_topk_bruteforce",
        "text_stats_by_lang",
        "sessionize_events_batch",
    ],
)
def test_no_python_udf_on_hot_path(spark, name):
    """SURVEY.md §2.9: the batch surface must stay JVM-side — no
    row-at-a-time or Arrow Python evaluation nodes in these plans
    (multimodal ops are the sanctioned mapInPandas exception)."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_aqe_skew_join_splits_hot_partition(spark):
    """The session's AQE skew-join config must actually fire: a join
    with one pathological hot key (100k of 120k rows on one key) gets
    its hot partition split at runtime — the executed plan shows the
    skew-handling AQEShuffleRead — and the result is still exact. This
    is the automatic complement to the explicit salt-and-replicate
    pattern (`skew_salted_join`): same problem, zero query rewrite."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 120000).select(
            F.when(F.col("id") < 100000, 0)
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("lv"),
        )
        # every key appears exactly twice on the right
        right = spark.range(0, 200).select(
            (F.col("id") % 100).alias("k"), F.col("id").alias("rv")
        )
        j = left.join(right, "k")
        # drive the DataFrame's own adaptive execution (a write/count
        # wraps a separate QueryExecution and leaves this one unrun)
        n = j._jdf.queryExecution().executedPlan().execute().count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert n == 240000  # 120k left rows x exactly 2 right matches
        assert "isFinalPlan=true" in plan
        assert "skew" in plan.lower()
    finally:
        for k, v in saved.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)


def test_aqe_switches_smj_to_broadcast_at_runtime(spark):
    """AQE's runtime join replanning, isolated via the two thresholds:
    the STATIC broadcast threshold is disabled (so the static plan is a
    sort-merge join), while the ADAPTIVE broadcast threshold stays on —
    the final plan must have switched to broadcast from the post-
    shuffle RUNTIME size (10 rows) the static planner never saw."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "10485760",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("lv")
        )
        # dense small side: every shuffle partition non-empty, so
        # DynamicJoinSelection does NOT demote the broadcast (a mostly-
        # empty build side is deliberately kept on the shuffle path)
        right = (
            spark.range(0, 200000)
            .filter(F.col("id") % 100 == 0)
            .select((F.col("id") % 1000).alias("k"), F.col("id").alias("rv"))
        )
        j = left.join(right, "k")
        static = j._jdf.queryExecution().sparkPlan().toString()
        n = j._jdf.queryExecution().executedPlan().execute().count()
        final = j._jdf.queryExecution().executedPlan().toString()
        assert n == 400000  # 2000 right rows x 200 left matches each
        assert "SortMergeJoin" in static and "BroadcastHashJoin" not in static
        assert "isFinalPlan=true" in final
        assert "BroadcastHashJoin" in final
    finally:
        for k, v in saved.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)
