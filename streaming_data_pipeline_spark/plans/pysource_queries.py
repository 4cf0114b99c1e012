"""Oracle-checked queries over the Spark 4 Python DataSource producer
(sources/pysource.py) — the reference's synthetic-event generator
(web-application.py:400-460) re-expressed as a registered ``format()``
source instead of a driver loop.

Why this surface matters at 100 TB: load synthesis and backfill
generation are per-partition executor work here (the batch reader splits
the index range, the stream reader admits bounded offset ranges), so
generating 10^12 rows is ``num_partitions=100_000`` and zero driver
involvement. Every field is a pure function of the row index, which is
what makes the DuckDB oracles below exact: they regenerate the identical
rows from ``range(n)`` with the same integer mixer.

Float protocol: as plans/tpch_queries.py — DECIMAL(18,2) sums cast back
to double, round()+0.0 signed-zero normalization on averages.
"""

from __future__ import annotations

import itertools
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_pipeline_spark.sources import pysource

_counter = itertools.count()

# Shared DuckDB CTE: regenerate the source table from range(n) with the
# exact integer formulas of pysource._row.
_GEN_CTE = """
WITH g AS (SELECT CAST(u.i AS BIGINT) AS i FROM UNNEST(range({n})) AS u(i)),
ev AS (
  SELECT i AS event_id,
         (['login','logout','purchase','page_view','click','error','signup'])[CAST(i % 7 AS INT) + 1] AS event_type,
         'user_' || CAST(1 + (i * 31 + 7) % 50 AS VARCHAR) AS user_id,
         'synthetic event #' || CAST(i AS VARCHAR) AS message,
         ((i * 7919 + 13) % 9900) / 100.0 + 1.0 AS value,
         TIMESTAMP '2026-01-01 00:00:00' + i * INTERVAL 1 SECOND AS event_ts
  FROM g)
"""


def _read(spark: SparkSession, **options) -> DataFrame:
    pysource.register(spark)
    reader = spark.read.format("event_synth")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def pysource_batch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type rollup over 20k generated events: the producer's health
    dashboard (web-application.py:480-520 analog) as one hash aggregate.
    ``sf_dir`` is unused — the source IS the generator."""
    ev = _read(spark, num_rows=20000, num_partitions=8)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("event_count"),
            F.count_distinct("user_id").alias("distinct_users"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
            (F.round(F.avg("value"), 4) + F.lit(0.0)).alias("avg_value"),
            F.min("event_ts").alias("first_ts"),
            F.max("event_ts").alias("last_ts"),
        )
        # no total sort (r11): order-insensitive compare; the range
        # sampler re-ran this plan's tail once more just for bounds
    )


def pysource_pushdown_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-pushdown path: the equality on event_type and the range on
    event_id reach ``_SynthReader.pushFilters`` and are applied inside
    the generator (6/7 of rows are never constructed; the index range is
    clamped before partition planning) — the DataSource-API analog of
    parquet PushedFilters. Per-user spend for purchase events."""
    ev = _read(spark, num_rows=20000, num_partitions=8)
    return (
        ev.filter((F.col("event_type") == "purchase") & (F.col("event_id") < 14000))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("purchase_count"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("spend"),
        )
        .orderBy("user_id")
    )


def pysource_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same generator consumed through Structured Streaming: the
    stream reader admits 400-index offset ranges per microbatch until
    the 1500-row table is exhausted, the memory sink drains them, and
    the batch aggregate below runs on the complete, deterministic
    prefix. Offsets are monotone and capped (pysource.latestOffset), so
    the sink converges to exactly ``n`` rows regardless of trigger
    cadence — the oracle regenerates all 1500 rows."""
    n = 1500
    pysource.register(spark)
    stream = (
        spark.readStream.format("event_synth")
        .option("num_rows", n)
        .option("rows_per_batch", 400)
        .option("num_partitions", 4)
        .load()
    )
    name = f"pysource_stream_{next(_counter)}"
    q = stream.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        deadline = time.time() + 120
        while spark.table(name).count() < n:
            if not q.isActive:
                # fail FAST with the root cause: without this check a
                # dead stream stalls the poll for the full deadline and
                # the real exception only surfaces from the finally
                # block's awaitTermination
                q.awaitTermination()  # raises the StreamingQueryException
                raise RuntimeError(
                    "pysource stream terminated before reaching %d rows" % n
                )
            if time.time() > deadline:
                raise TimeoutError("pysource stream did not reach %d rows" % n)
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination()
    snap = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return (
        snap.groupBy(F.date_format("event_ts", "HH:mm").alias("minute"))
        .agg(
            F.count("*").alias("event_count"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
        .orderBy("minute")
    )


QUERIES = {
    "pysource_batch_rollup": pysource_batch_rollup,
    "pysource_pushdown_purchases": pysource_pushdown_purchases,
    "pysource_stream_rollup": pysource_stream_rollup,
}

ORACLE = {
    "pysource_batch_rollup": _GEN_CTE.format(n=20000)
    + """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
       round(AVG(value), 4) + 0.0 AS avg_value,
       MIN(event_ts) AS first_ts,
       MAX(event_ts) AS last_ts
FROM ev GROUP BY event_type ORDER BY event_type
""",
    "pysource_pushdown_purchases": _GEN_CTE.format(n=20000)
    + """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS purchase_count,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS spend
FROM ev WHERE event_type = 'purchase' AND event_id < 14000
GROUP BY user_id ORDER BY user_id
""",
    "pysource_stream_rollup": _GEN_CTE.format(n=1500)
    + """
SELECT strftime(event_ts, '%H:%M') AS minute,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM ev GROUP BY minute ORDER BY minute
""",
}


def wire_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python-DataSource SINK (sources/wire_sink.py) closing
    the producer loop: enriched events published through
    ``format("wire_sink")`` (per-task staged JSONL + driver manifest
    commit), read back via the manifest, aggregated. The oracle
    recomputes from the enriched CTE — matching proves the publish path
    is lossless AND that read-back saw exactly the committed files."""
    import shutil
    import tempfile

    from streaming_data_pipeline_spark.plans.base import enriched_events
    from streaming_data_pipeline_spark.sources import wire_sink

    wire_sink.register(spark)
    from streaming_data_pipeline_spark.sources.batch import spread_small_scan

    # Spread the narrow scan before the sink write (guide §2.2/§4): the
    # enriched frame is one split at small SF, so the per-row JSONL
    # encode otherwise runs in a SINGLE Python writer task (profiled:
    # the write stage was 1 task / ~1.5 s of the query's 2.9 s steady
    # wall). The sink stages one file per task either way; the rollup
    # read back is unchanged.
    enriched = spread_small_scan(
        enriched_events(spark, sf_dir).select(
            "id", "event_type", "value", "message_length", "data_quality_score"
        ),
        "id",
    )
    base = tempfile.mkdtemp(prefix="spark_graft_wire_")
    try:
        enriched.write.format("wire_sink").option("path", base).mode("append").save()
        back = wire_sink.read_committed(
            spark,
            base,
            "id string, event_type string, value double, "
            "message_length bigint, data_quality_score bigint",
        )
        out = (
            back.groupBy("event_type", "data_quality_score")
            .agg(
                F.count("*").alias("event_count"),
                F.sum("message_length").alias("total_msg_len"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
            )
            .orderBy("event_type", "data_quality_score")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES["wire_sink_roundtrip"] = wire_sink_roundtrip

from streaming_data_pipeline_spark.plans.base import ENRICHED_CTE  # noqa: E402

ORACLE["wire_sink_roundtrip"] = ENRICHED_CTE + """
SELECT event_type, data_quality_score,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       CAST(SUM(message_length) AS BIGINT) AS total_msg_len,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM enriched GROUP BY event_type, data_quality_score
ORDER BY event_type, data_quality_score
"""
