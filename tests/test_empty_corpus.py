"""Empty-corpus robustness (round 11): every declared query must run —
and agree with the DuckDB oracle — when all ten tables exist with the
production schema and ZERO rows. At warehouse scale an empty input is
routine (a backfill window with no events, a filter matching nothing,
an incremental pipeline's first run), and the whole-surface sweep
(tools/empty_corpus_sweep.py, log committed per round) found 18 queries
that crashed or diverged on it. This file pins each fixed failure class
so none regresses; the full 244-query sweep stays a tools/ cadence item
because it costs ~8 minutes.

Failure classes fixed (all provably output-neutral on non-empty data):
- fileless-sink read-back: schema inference has nothing to read after a
  zero-row write -> explicit reader schemas / empty-manifest branches
  (9 queries: the partitioned/retention/compaction/backfill/evolution/
  snapshot/CDF/metadata sinks + the streaming ETL roundtrip)
- ANSI strictness on empty aggregates: v[0] on a zero-length collected
  eigenvector (pca), n / 0.0 funnel conversion -> get() / try_divide
- SUM-over-nothing NULLs where the vacuous answer is 0: dq constraint
  violations, theta exact set sizes -> coalesce
- sketch aggregates over zero groups: theta_intersection_agg throws
  datasketches' "infinite set", approx_top_k_combine dies on a null
  buffer -> FILTERed-union pivot + binary scalar set ops / empty-seed
- GROUPING SETS (): Spark's Expand-based rollup emits nothing on empty
  input where the standard (and DuckDB) emit the grand-total row ->
  plans.base.with_empty_grouping_total
- plan-build-time dimension probe: embedding_random_projection raised
  on an empty table -> placeholder dim, schema-stable empty result
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import canon, oracle_df

# Every query the whole-surface empty sweep found red before round 11,
# by failure class (docstring above).
FIXED_QUERIES = [
    # fileless-sink read-back
    "partitioned_sink_pruning",
    "retention_expire_partitions",
    "small_file_compaction",
    "backfill_dynamic_overwrite",
    "schema_evolution_merge_read",
    "snapshot_time_travel",
    "snapshot_incremental_changes",
    "file_metadata_audit",
    "streaming_etl_file_roundtrip",
    # ANSI strictness / NULL aggregates
    "pca_power_iteration",
    "event_funnel_conversion",
    "dq_constraint_report",
    # sketch aggs over zero groups
    "theta_sketch_audience_overlap",
    "approx_topk_mergeable_tokens",
    # grouping-sets grand-total row
    "rollup_order_status",
    "cube_returnflag_status",
    "grouping_sets_revenue",
    # dimension probe
    "embedding_random_projection",
]


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    from tools.empty_corpus_sweep import build_empty_dir

    return build_empty_dir(str(tmp_path_factory.mktemp("empty_sf")))


@pytest.mark.parametrize("name", FIXED_QUERIES)
def test_fixed_query_runs_and_matches_oracle_on_empty(
    spark, duck, empty_sf, name
):
    import __spark_entry__ as entrymod

    got = entrymod.queries()[name](spark, empty_sf).toPandas()
    spark.catalog.clearCache()
    sql = entrymod.oracle_sql().get(name)
    assert sql is not None, f"{name} lost its oracle"
    want = oracle_df(duck, sql, empty_sf)
    assert len(got) == len(want), (len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns)
    assert canon(got) == canon(want)


def test_grouping_total_helper_is_a_noop_on_nonempty_input(spark):
    """with_empty_grouping_total must append its row ONLY when the
    rolled frame is empty — on any non-empty input the output is the
    plain rollup, byte-identical."""
    from streaming_data_pipeline_spark.plans.base import (
        with_empty_grouping_total,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "g string, v long"
    )
    rolled = df.rollup("g").agg(
        F.count("*").alias("n"), F.grouping_id().cast("long").alias("grp")
    )
    total_row = [
        F.lit(None).cast("string").alias("g"),
        F.lit(0).cast("long").alias("n"),
        F.lit(1).cast("long").alias("grp"),
    ]
    plain = {tuple(r) for r in rolled.collect()}
    wrapped = {
        tuple(r)
        for r in with_empty_grouping_total(rolled, df, *total_row).collect()
    }
    assert wrapped == plain
    # and on empty input it emits exactly the provided ()-row
    empty_base = df.filter(F.lit(False))
    empty_rolled = empty_base.rollup("g").agg(
        F.count("*").alias("n"), F.grouping_id().cast("long").alias("grp")
    )
    only = with_empty_grouping_total(empty_rolled, empty_base, *total_row).collect()
    assert [tuple(r) for r in only] == [(None, 0, 1)]


def test_empty_twin_preserves_production_schemas(empty_sf, spark):
    """The zero-row twin must be byte-identical in schema to the real
    fixtures — otherwise the sweep exercises a different engine path
    (e.g. the events timestamp unit probe in load_table)."""
    import pyarrow.parquet as pq

    from streaming_data_pipeline_spark.schema import ALL_TABLES
    from tools.empty_corpus_sweep import SRC_SF as src
    for t in ALL_TABLES:
        real = pq.read_schema(os.path.join(src, f"{t}.parquet"))
        twin = pq.read_schema(os.path.join(empty_sf, f"{t}.parquet"))
        assert twin.equals(real), t
        assert pq.read_metadata(os.path.join(empty_sf, f"{t}.parquet")).num_rows == 0
