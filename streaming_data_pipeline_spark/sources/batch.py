"""Batch parquet sources for the fixture tables.

Scale notes (100 TB posture):
- Reads are plain ``spark.read.parquet`` so Catalyst keeps predicate
  pushdown, column pruning, and partition pruning (check with
  ``.explain``: ``PushedFilters`` / ``ReadSchema``).
- The events table carries parquet TIMESTAMP(NANOS) which Spark's
  vectorized reader rejects; we flip the runtime conf
  ``spark.sql.legacy.parquet.nanosAsLong`` and convert the raw int64
  nanos to TIMESTAMP_NTZ with integer arithmetic — still fully
  codegen'd, no UDF, no driver materialization.
- At warehouse scale the sink side writes date-partitioned parquet
  (see streaming_data_pipeline_spark.streaming.sinks), so the 10min/1h/24h
  freshness predicates (SURVEY.md §2.7 P2) prune partitions instead of
  scanning history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_pipeline_spark.session import apply_runtime_confs


def _events_from_nanos(df: DataFrame) -> DataFrame:
    """Convert the raw nanos-as-long ``ts`` to TIMESTAMP_NTZ.

    Integer floor-division to micros matches DuckDB's nanos->micros
    truncation of the same file, so both engines see identical wall-clock
    values. The session timeZone is pinned to UTC (apply_runtime_confs) so
    the TIMESTAMP->NTZ cast is the identity on wall clock.
    """
    # Integer DIV, not `/`: float division of an int64 epoch-nanos loses
    # sub-microsecond precision (doubles hold 53 bits) and rounds up.
    return df.withColumn(
        "ts",
        F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
    )


def events_ts_is_nanos(spark: SparkSession, sf_dir: str) -> bool:
    """Footer-only probe of events.parquet's timestamp unit — it VARIES
    by fixture round (TESTDATA.md): under nanosAsLong a NANOS file
    surfaces ``ts`` as bigint, a MICROS file as a timestamp type. The
    ONE place the unit decision lives; both the batch reader and the
    fixture stream (streaming/sources.py) consume it, so the two paths
    cannot drift. Raises a clear error when the file is missing instead
    of an opaque KeyError downstream."""
    path = os.path.join(sf_dir, "events.parquet")
    if not os.path.exists(path):
        raise FileNotFoundError(f"events fixture not found: {path}")
    apply_runtime_confs(spark)
    return dict(spark.read.parquet(path).dtypes).get("ts") == "bigint"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame with canonical types."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = _events_from_nanos(df)
    return df


def spread_small_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Redistribute a NARROW scan before row-amplifying work.

    Any operator that multiplies rows (explode of per-char shingles, a
    B-way resample, per-row Python encode/decode) must run on a frame
    that is already spread across the cluster — a tiny parquet table
    yields one or two input splits, and amplifying on top of that runs
    the whole blow-up in a single task (measured 28 s -> ~2 s on the
    bootstrap plan). Repartitioning BEFORE the amplification is
    amplification-factor-times cheaper than after.

    The repartition is CONDITIONAL: at real scale the scan already has
    at least the session's shuffle parallelism in splits
    (``spark.sql.files.maxPartitionBytes``) and an unconditional
    repartition would shuffle the full table for nothing.

    BATCH ONLY: the partition-count probe goes through
    ``df.rdd.getNumPartitions()``, which forces physical planning and
    RDD lineage construction (one plan analysis per call, no job) and
    is undefined for a streaming DataFrame — a streaming frame raises
    here rather than failing deep inside the RDD bridge. Streaming
    plans size their parallelism via ``spark.sql.shuffle.partitions``
    on the stateful exchange instead.
    """
    if df.isStreaming:
        raise ValueError(
            "spread_small_scan is batch-only: a streaming DataFrame has "
            "no physical partition count to probe; rely on "
            "spark.sql.shuffle.partitions for the stateful exchange."
        )
    spark = df.sparkSession
    # Target = one wave of the cluster's cores (defaultParallelism =
    # total executor cores on a real cluster), capped by the session's
    # shuffle parallelism. The amplified work is CPU-bound, so one task
    # per core is the right spread; the old target (shuffle.partitions,
    # 2x cores) doubled the task count — and an EXPLICIT repartition(n)
    # is never AQE-coalesced, so every amplification stage paid ~2x the
    # per-task fixed cost for zero extra parallelism (measured at sf0.1:
    # repartition(64) noop 574 ms vs repartition(32) 167 ms on 32
    # cores; the guide's §2.2 "fewer, larger tasks" applied to the map
    # side). Scale-adaptive by construction: grows with the cluster,
    # never exceeds the session's configured shuffle width.
    n = min(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
        spark.sparkContext.defaultParallelism,
    )
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *keys) if keys else df.repartition(n)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (mirrors the DuckDB
    oracle's pre-registered views) so queries can be written in pure SQL."""
    from streaming_data_pipeline_spark.schema import ALL_TABLES

    for name in ALL_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
