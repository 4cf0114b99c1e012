"""Shared plan helpers: the enriched-events view on both engines.

The Spark side builds the enriched table with the transform chain
(operators.transforms.enrich_raw_events); the oracle side re-derives the
identical table in one DuckDB CTE so every downstream query can be
cross-checked. Keeping both here, adjacent, is the parity contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_pipeline_spark.operators.transforms import enrich_raw_events
from streaming_data_pipeline_spark.schema import OPTIONAL_FIELDS
from streaming_data_pipeline_spark.sources.batch import load_table

# Fixed clock: one tick past the fixture's last event (events span
# 2024-01-01 .. 2024-01-30; TESTDATA.md). All freshness predicates are
# relative to this.
AS_OF = "2024-01-31 00:00:00"

# Cached intermediate frames from the most recent multi-reference plan —
# the plans-side twin of operators/dedup._LIVE_CACHES (kept separate:
# the evidence tooling pins dedup's registry literal). A query whose
# plan references one heavy subtree N times otherwise re-executes that
# subtree N times (Spark shares no work across DataFrame references
# without an explicit cache); each entry point that uses plan_cached()
# releases the previous query's frames up front, bounding live cache to
# one query's worth across a multi-hundred-query sweep.
_PLAN_CACHES: list[DataFrame] = []


def release_plan_caches() -> None:
    while _PLAN_CACHES:
        try:
            _PLAN_CACHES.pop().unpersist()
        except Exception:
            pass


def plan_cached(df: DataFrame) -> DataFrame:
    """Register-and-cache an intermediate referenced by several
    downstream branches (compute-once + fan-out). Lazy: materialized by
    the query's own action, never by a separate job here."""
    df = df.cache()
    _PLAN_CACHES.append(df)
    return df


def enriched_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet -> full 19-column enriched table (quality-filtered)."""
    return enrich_raw_events(load_table(spark, sf_dir, "events"), as_of=AS_OF)


# TRY_CAST(... AS JSON): the tolerant-parse twin of Spark's from_json/
# get_json_object — NULL, '', and malformed payloads all yield NULL
# fields (T3 semantics) instead of DuckDB's hard json parse error.
_OPTIONAL_SQL = ",\n      ".join(
    f"json_extract_string(TRY_CAST(props AS JSON), '$.{f}') AS {f}"
    for f in OPTIONAL_FIELDS
)

# DuckDB twin of enrich_raw_events + quality filter. Must stay in lockstep
# with operators/transforms.py:enrich_raw_events.
ENRICHED_CTE = f"""
WITH enriched AS (
  SELECT * FROM (
    SELECT
      CAST(event_id AS VARCHAR) AS id,
      ts AS "timestamp",
      props AS message,
      CAST(user_id AS VARCHAR) AS user_id,
      event_type,
      COALESCE(value, 0.0) AS value,
      TIMESTAMP '{AS_OF}' AS processed_at,
      {_OPTIONAL_SQL},
      CAST(length(COALESCE(props, '')) AS BIGINT) AS message_length,
      CAST(COALESCE(hour(ts), 0) AS BIGINT) AS event_hour,
      CAST(
          (CASE WHEN user_id IS NOT NULL AND CAST(user_id AS VARCHAR) <> ''
                 AND CAST(user_id AS VARCHAR) <> 'unknown' THEN 25 ELSE 0 END)
        + (CASE WHEN props IS NOT NULL AND props <> '' THEN 25 ELSE 0 END)
        + (CASE WHEN COALESCE(value, 0.0) > 0.0 THEN 25 ELSE 0 END)
        + (CASE WHEN ts IS NOT NULL THEN 25 ELSE 0 END)
      AS BIGINT) AS data_quality_score
    FROM events
  )
  WHERE data_quality_score >= 50
)
"""


def int_halfup_avg_expr(sum_expr: str, cnt_expr: str):
    """Tie-safe rounded average (4 dp) of a DECIMAL(18,2) sum over a
    count, as a Spark Column: exact integer half-up —
    (cents*200 + n) div (2n) — because double round() diverges between
    engines exactly on the .xxxx5 boundaries such quotients hit (found
    twice at sf0.1). Twin of :func:`int_halfup_avg_sql`."""
    from pyspark.sql import functions as F

    return (
        F.expr(
            f"(cast(({sum_expr}) * 100 as bigint) * 200 + ({cnt_expr}))"
            f" div (2 * ({cnt_expr}))"
        ).cast("double")
        / F.lit(10000.0)
    )


def int_halfup_avg_sql(sum_expr: str, cnt_expr: str) -> str:
    """DuckDB twin of :func:`int_halfup_avg_expr` (``//`` truncates like
    Spark's ``div`` for the non-negative operands used here)."""
    return (
        f"CAST((CAST(({sum_expr}) * 100 AS BIGINT) * 200 + ({cnt_expr}))"
        f" // (2 * ({cnt_expr})) AS DOUBLE) / 10000.0"
    )


def with_empty_grouping_total(
    rolled: DataFrame, base: DataFrame, *total_row: Column
) -> DataFrame:
    """Standard GROUPING SETS semantics on a zero-row input.

    SQL's empty grouping set ``()`` aggregates like a global aggregate:
    it contributes one grand-total row even when the input has no rows
    (count 0, NULL sums — DuckDB and PostgreSQL both emit it). Spark's
    Expand-based ROLLUP/CUBE/GROUPING SETS implementation expands zero
    input rows to zero expanded rows and returns nothing instead.

    This appends the caller-provided literal ``()``-row iff ``base``
    (the rollup's input relation) is empty — equivalent to probing the
    rollup output, but the probe is ``base.limit(1)``: an
    early-terminating O(one-task) existence check, NOT a second full
    scan + Expand + aggregate (Spark does not reuse the rollup's
    exchange across the union branches — measured: probing the rolled
    frame itself doubled the base scans). The physical plan of the
    rollup is untouched, and on every non-empty input the anti-join
    emits nothing, so the result is provably byte-identical to the
    plain rollup.
    """
    spark = rolled.sparkSession
    probe = base.select(F.lit(1).alias("_one")).limit(1)
    fallback = (
        spark.range(1).join(probe, F.lit(True), "left_anti").select(*total_row)
    )
    return rolled.unionByName(fallback)
