"""Streaming-engine-backed plans: the events fixture replayed through
Structured Streaming (micro-batch engine, availableNow drain), results
materialized from a memory sink so the driver can oracle-check them like
any batch query.

complete output mode is used deliberately: it emits every window
regardless of watermark progress, so a full drain is deterministic and
equals the batch aggregation over the same data — which is exactly what
the DuckDB oracle computes.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_pipeline_spark.operators.transforms import enrich_raw_events
from streaming_data_pipeline_spark.plans.base import AS_OF, ENRICHED_CTE
from streaming_data_pipeline_spark.streaming.sources import events_fixture_stream
from streaming_data_pipeline_spark.streaming.windows import (
    session_window_stats,
    tumbling_window_counts,
)

_counter = itertools.count()


def _drain_complete(agg: DataFrame, spark: SparkSession) -> DataFrame:
    """Run a streaming aggregation to completion into a memory sink and
    hand back the materialized result as a plain DataFrame."""
    name = f"stream_result_{next(_counter)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snapshot = spark.table(name)
    out = spark.createDataFrame(snapshot.toPandas(), schema=snapshot.schema)
    spark.catalog.dropTempView(name)
    return out


def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture replayed through readStream -> the SAME enrichment
    chain as batch -> 60 s tumbling windows with watermark. Oracle: the
    batch equivalent (windowed_counts_60s semantics)."""
    stream = events_fixture_stream(spark, sf_dir)
    enriched = enrich_raw_events(stream, as_of=AS_OF)
    agg = tumbling_window_counts(enriched, ts_col="timestamp")
    return _drain_complete(agg, spark).orderBy("window_start", "event_type")


def streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (2 h inactivity gap) per user over the
    replayed stream. The oracle sessionizes with the classic
    lag/cumulative-sum islands construction — same grouping semantics."""
    stream = events_fixture_stream(spark, sf_dir)
    agg = session_window_stats(
        stream, ts_col="ts", gap="2 hours", watermark="4 hours", key="user_id"
    )
    return _drain_complete(agg, spark).orderBy("user_id", "session_start")


QUERIES = {
    "streaming_windowed_counts": streaming_windowed_counts,
    "streaming_user_sessions": streaming_user_sessions,
}

ORACLE = {
    "streaming_windowed_counts": ENRICHED_CTE
    + """
    SELECT date_trunc('minute', "timestamp") AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM enriched
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    "streaming_user_sessions": """
    WITH ordered AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 2 HOURS
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 2 HOURS AS session_end,
           user_id,
           CAST(COUNT(*) AS BIGINT) AS event_count
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
}
