"""Training-data prep surface: split assignment, random projection,
chunk-duplication audit, vocabulary richness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_query_matches_oracle


@pytest.mark.parametrize(
    "name",
    [
        "train_val_test_split",
        "embedding_random_projection",
        "chunk_dup_stats",
        "vocab_richness_by_source",
        "unigram_surprisal_by_doc",
        "udtf_chunk_split",
    ],
)
def test_training_queries_match_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR)


def test_split_is_deterministic_and_total(spark):
    """The split must be a partition of the corpus (counts sum to the
    table size) and reproducible run-to-run."""
    import __spark_entry__ as entrymod

    from streaming_data_pipeline_spark.sources.batch import load_table

    q = entrymod.queries()["train_val_test_split"]
    a = {r["split"]: r["n_docs"] for r in q(spark, SF_DIR).collect()}
    b = {r["split"]: r["n_docs"] for r in q(spark, SF_DIR).collect()}
    assert a == b
    total = load_table(spark, SF_DIR, "documents").count()
    assert sum(a.values()) == total
    assert set(a) == {"train", "val", "test"}
    # 80/10/10 target within binomial slack on a 500-doc fixture.
    assert a["train"] > a["val"] and a["train"] > a["test"]


def test_random_projection_shape_and_exactness(spark):
    """Every vector projects to exactly 8 dims, and the DECIMAL
    accumulation makes the result invariant to repartitioning."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()["embedding_random_projection"]
    out = q(spark, SF_DIR)
    per_vec = out.groupBy("vec_id").count()
    assert per_vec.filter(F.col("count") != 8).count() == 0
    # Re-run and diff: exact equality, not approximate.
    again = q(spark, SF_DIR)
    assert out.exceptAll(again).count() == 0


def test_chunk_dup_stats_bounds(spark):
    """dup_chunks <= n_chunks and the fixture's near-dup docs surface."""
    import __spark_entry__ as entrymod

    out = entrymod.queries()["chunk_dup_stats"](spark, SF_DIR)
    assert out.filter(F.col("dup_chunks") > F.col("n_chunks")).count() == 0
    assert out.filter(F.col("dup_chunks") > 0).count() > 0


def test_tws_plan_builds(spark):
    """transformWithStateInPandas plan construction needs no protobuf —
    the wiring (grouping, output schema, Update mode) is checkable even
    where the runtime protocol dep is absent."""
    from streaming_data_pipeline_spark.streaming.sources import (
        events_fixture_stream,
    )
    from streaming_data_pipeline_spark.streaming.stateful import (
        user_type_stats_tws,
    )

    out = user_type_stats_tws(events_fixture_stream(spark, SF_DIR))
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "n_events",
        "n_types",
    ]


def test_tws_runs_and_matches_batch_truth(spark):
    """End-to-end TWS run (RocksDB state store) vs the batch aggregate —
    skipped where the protobuf protocol dep is unavailable."""
    from streaming_data_pipeline_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        tws_available,
        user_type_stats_tws,
    )

    if not tws_available():
        pytest.skip("protobuf not installed: TWS driver worker cannot start")

    from streaming_data_pipeline_spark.sources.batch import load_table
    from streaming_data_pipeline_spark.streaming.sources import (
        events_fixture_stream,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        out = user_type_stats_tws(events_fixture_stream(spark, SF_DIR))
        q = (
            out.writeStream.format("memory")
            .queryName("tws_user_stats")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = (
            spark.table("tws_user_stats")
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("n_types").alias("n_types"),
            )
        )
        want = (
            load_table(spark, SF_DIR, "events")
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.countDistinct("event_type").alias("n_types"),
            )
        )
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
