"""Streaming-engine-backed plans: the events fixture replayed through
Structured Streaming (micro-batch engine, availableNow drain), results
materialized from a memory sink so the driver can oracle-check them like
any batch query.

complete output mode is used for most windowed drains: it emits every
window regardless of watermark progress, so a full drain is
deterministic and equals the batch aggregation over the same data —
which is exactly what the DuckDB oracle computes.
``streaming_windowed_append`` exercises the production path instead:
append mode with a real watermark gate, where only windows the final
watermark has closed are ever emitted (the oracle applies the same
cutoff to the batch aggregation).
"""

from __future__ import annotations

import itertools
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_pipeline_spark.operators.transforms import enrich_raw_events
from streaming_data_pipeline_spark.plans.base import AS_OF, ENRICHED_CTE
from streaming_data_pipeline_spark.sources.batch import load_table
from streaming_data_pipeline_spark.streaming.sources import (
    events_fixture_stream,
    synthetic_event_stream,
)
from streaming_data_pipeline_spark.streaming.windows import (
    session_window_stats,
    sliding_window_counts,
    streaming_dedup,
    tumbling_window_counts,
)

_counter = itertools.count()


def _drain(
    agg: DataFrame,
    spark: SparkSession,
    mode: str,
    state_partitions: int | None = None,
) -> DataFrame:
    """Run a streaming frame to completion into a memory sink and hand
    back the materialized result as a plain DataFrame.

    ``state_partitions`` right-sizes the STATEFUL exchange for queries
    whose grouping key is known-low-cardinality (time windows: dozens
    of keys). The stateful shuffle's partition count is pinned at query
    start — each partition carries its own state-store instance
    (open/commit/snapshot per micro-batch), and AQE never coalesces a
    stateful exchange the way it does batch shuffles, so an
    over-partitioned streaming agg pays fixed state-store overhead per
    partition per batch forever. Measured on the 6-hour-window
    approx-users query at sf0.1: 64 partitions 8.1 s -> 8 partitions
    2.8 s for ~28 window keys. The same reasoning holds on a cluster:
    size this to key cardinality / throughput, not to the batch
    default; leave None (session default) for high-cardinality keys.
    The conf is set only around query start and restored immediately —
    batch plans in the same session are untouched."""
    name = f"stream_result_{next(_counter)}"
    conf_key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(conf_key)
    if state_partitions is not None:
        spark.conf.set(conf_key, str(state_partitions))
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set(conf_key, saved)
    # localCheckpoint materializes the snapshot into executor storage
    # and cuts the lineage to the (about-to-be-dropped) memory-sink
    # view, removing the extra driver-side pandas roundtrip the old
    # toPandas() detach made. (The memory sink itself still buffers the
    # streaming result on the driver — fine for these grouped
    # aggregates; an unbounded-result drain should use a file sink.)
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def _drain_complete(
    agg: DataFrame, spark: SparkSession, state_partitions: int | None = None
) -> DataFrame:
    return _drain(agg, spark, "complete", state_partitions=state_partitions)


def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture replayed through readStream -> the SAME enrichment
    chain as batch -> 60 s tumbling windows with watermark. Oracle: the
    batch equivalent (windowed_counts_60s semantics)."""
    stream = events_fixture_stream(spark, sf_dir)
    enriched = enrich_raw_events(stream, as_of=AS_OF)
    agg = tumbling_window_counts(enriched, ts_col="timestamp")
    # state keys = (60s window x event_type): hundreds — measured 4.0->1.9s
    return _drain_complete(agg, spark, state_partitions=8).orderBy(
        "window_start", "event_type"
    )


def streaming_windowed_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode watermarked tumbling windows — the production
    streaming-aggregation path (SURVEY.md §2.4 W2; the reference's
    FixedWindows at Streamingdag.py:302-308 with a real lateness gate).

    Unlike the complete-mode drains, a window row here is emitted
    exactly once: when the watermark — max observed event time minus
    the 2 h delay, advanced at micro-batch boundaries — passes the
    window's end. Windows the final watermark never closes (the last
    ~2-3 hours of the fixture) stay in state and are NOT in the output;
    the oracle applies the identical cutoff to the batch aggregation,
    so this query proves watermark-gated emission, not just window
    arithmetic.
    """
    stream = events_fixture_stream(spark, sf_dir)
    agg = tumbling_window_counts(
        stream, ts_col="ts", width="1 hour", watermark="2 hours"
    )
    # state keys = (1h window x event_type): dozens — measured 3.7->1.4s
    return _drain(agg, spark, "append", state_partitions=8).orderBy(
        "window_start", "event_type"
    )


def streaming_update_mode_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE output mode — completes the output-mode matrix (complete
    and append drains elsewhere): each micro-batch emits only the keys
    whose aggregate CHANGED in that batch — the changelog shape that
    feeds a KV serving store. foreachBatch appends every update batch,
    stamped with its batch_id, to a parquet changelog (executor writes,
    nothing driver-side); replaying the changelog with latest-batch-
    wins-per-key must reconstruct exactly the full aggregate — proving
    the per-batch update semantics AND the changelog-compaction algebra
    a downstream store relies on. The fixture replays in event-time
    order, so no update is ever watermark-dropped and the reconstructed
    state equals the batch aggregation (the oracle).
    """
    base = tempfile.mkdtemp(prefix="spark_graft_updlog_")
    log_dir = f"{base}/log"
    try:
        agg = tumbling_window_counts(
            events_fixture_stream(spark, sf_dir),
            ts_col="ts",
            width="1 hour",
            watermark="2 hours",
        )

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(log_dir)

        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{base}/ckpt")
            .start()
        )
        q.awaitTermination()
        from pyspark.sql import Window

        log = spark.read.parquet(log_dir)
        w = Window.partitionBy("window_start", "event_type").orderBy(
            F.desc("batch_id")
        )
        final = (
            log.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn", "batch_id")
            .orderBy("window_start", "event_type")
        )
        return final.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def streaming_chained_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful operators in one streaming query (Spark >= 3.4
    time-window column chaining): a 1-hour windowed aggregate feeds a
    second, 6-hour windowed aggregate over `window_time()` of the first
    — the hour->day-part rollup hierarchy a metrics pipeline keeps, in
    ONE query with ONE watermark instead of two jobs with an
    intermediate sink. Append mode: a 6-hour row emits only when the
    watermark passes its end (by then every inner hour window inside it
    has closed too). Oracle: the batch 6-hour aggregation restricted to
    windows the final watermark (max ts - 2h) closed.
    """
    stream = events_fixture_stream(spark, sf_dir).withColumn(
        # watermarks require TIMESTAMP; session TZ is UTC so the
        # ntz -> ltz cast maps to identical instants
        "ts", F.col("ts").cast("timestamp")
    )
    hourly = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w1"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("vsum"),
        )
    )
    six = (
        hourly.groupBy(
            F.window(F.window_time("w1"), "6 hours").alias("w6"), "event_type"
        )
        .agg(
            F.sum("n").cast("long").alias("event_count"),
            F.sum("vsum").cast("double").alias("value_sum"),
            F.count("*").cast("long").alias("hours_present"),
        )
        .select(
            F.col("w6.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "event_count",
            "value_sum",
            "hours_present",
        )
    )
    # two chained window aggs, keys = (window x event_type) both levels:
    # dozens each — measured 6.8->1.9s (two stateful exchanges saved)
    return _drain(six, spark, "append", state_partitions=8).orderBy(
        "window_start", "event_type"
    )


def streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (2 h inactivity gap) per user over the
    replayed stream. The oracle sessionizes with the classic
    lag/cumulative-sum islands construction — same grouping semantics."""
    stream = events_fixture_stream(spark, sf_dir)
    agg = session_window_stats(
        stream, ts_col="ts", gap="2 hours", watermark="4 hours", key="user_id"
    )
    # state keys = user_id sessions: ~1.5k users in the fixture (size to
    # user cardinality on a cluster) — measured 2.4->1.3s
    return _drain_complete(agg, spark, state_partitions=8).orderBy(
        "user_id", "session_start"
    )


def streaming_session_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode watermarked SESSION windows — the stateful-merge
    analog of ``streaming_windowed_append``. A session row is emitted
    exactly once, when the watermark (max event time - 4 h) passes the
    session's end (last event + 2 h gap); sessions still open at end of
    input stay in state and are withheld. The oracle runs the same
    lag/cumulative-sum islands construction and applies the identical
    cutoff — so this proves watermark-gated session eviction, the
    hardest streaming-state path (merging windows + append output).
    """
    stream = events_fixture_stream(spark, sf_dir)
    agg = session_window_stats(
        stream, ts_col="ts", gap="2 hours", watermark="4 hours", key="user_id"
    )
    # state keys = user_id sessions: ~1.5k fixture users — measured 4.3->1.8s
    return _drain(agg, spark, "append", state_partitions=8).orderBy(
        "user_id", "session_start"
    )


def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 2 h windows sliding every 1 h over the replayed
    stream. Oracle: each event lands in exactly two epoch-aligned
    windows — trunc(ts, hour) and the hour before."""
    stream = events_fixture_stream(spark, sf_dir)
    agg = sliding_window_counts(
        stream, ts_col="ts", width="2 hours", slide="1 hour", watermark="4 hours"
    )
    # state keys = sliding windows (2/doc-hour): dozens — measured 2.1->1.0s
    return _drain_complete(agg, spark, state_partitions=8).orderBy("window_start")


def streaming_dedup_user_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark on (user_id, event_type): first
    arrival per key within the watermark horizon. Projected to the key
    columns so the result set equals batch SELECT DISTINCT."""
    stream = events_fixture_stream(spark, sf_dir)
    deduped = streaming_dedup(
        stream, id_cols=("user_id", "event_type"), ts_col="ts", watermark="30 days"
    ).select("user_id", "event_type")
    # state keys = (user_id x event_type) distinct pairs: ~9k fixture
    # max (size to pair cardinality on a cluster) — measured 3.1->1.2s
    return _drain(deduped, spark, "append", state_partitions=8).orderBy(
        "user_id", "event_type"
    )


def streaming_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user event count + value min/max kept in explicit GroupState
    (the engine's escape hatch for operators Spark lacks natively).
    Count/min/max are order-independent, so the result is deterministic
    under any batch split; the memory-sink updates are collapsed to the
    final (max-count) row per user."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_user(key, pdf_iter, state: GroupState):
        if state.exists:
            cnt, mn, mx = state.get
        else:
            cnt, mn, mx = 0, None, None
        for pdf in pdf_iter:
            cnt += len(pdf)
            vmin = float(pdf["value"].min())
            vmax = float(pdf["value"].max())
            mn = vmin if mn is None else min(mn, vmin)
            mx = vmax if mx is None else max(mx, vmax)
        state.update((cnt, mn, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_count": [cnt],
                "min_value": [mn],
                "max_value": [mx],
            }
        )

    stream = events_fixture_stream(spark, sf_dir)
    totals = stream.groupBy("user_id").applyInPandasWithState(
        update_user,
        outputStructType="user_id bigint, event_count bigint, min_value double, max_value double",
        stateStructType="cnt bigint, mn double, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # state keys = user_id: ~1.5k fixture users (size to user cardinality
    # on a cluster) — measured 2.6->1.6s steady
    drained = _drain(totals, spark, "update", state_partitions=8)
    final = drained.groupBy("user_id").agg(
        F.max("event_count").alias("event_count"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
    return final.orderBy("user_id")


def streaming_etl_file_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full S1 -> T1-T9/E1-E4 -> S2 path end-to-end: fixture events
    serialized to wire-format JSON lines (the producer's Pub/Sub payload,
    microsecond-lossless timestamps), streamed through the ETL with an
    availableNow drain into a date-partitioned parquet sink + checkpoint,
    read back and aggregated. The oracle computes the same aggregate from
    the enriched CTE — proving wire parse/validate/enrich/sink parity."""
    from streaming_data_pipeline_spark.streaming.pipeline import run_pipeline

    ev = load_table(spark, sf_dir, "events")
    wire = ev.select(
        F.to_json(
            F.struct(
                F.col("event_id").cast("string").alias("id"),
                F.concat(
                    F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), F.lit("Z")
                ).alias("timestamp"),
                F.col("props").alias("message"),
                F.col("user_id").cast("string").alias("user_id"),
                F.col("event_type"),
                F.col("value"),
            )
        ).alias("value")
    )
    base = tempfile.mkdtemp(prefix="spark_graft_etl_")
    in_dir, out_dir, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    try:
        wire.write.mode("overwrite").text(in_dir)
        q = run_pipeline(
            spark, in_dir, out_dir, ckpt, available_now=True, as_of=AS_OF
        )
        q.awaitTermination()
        # explicit schema, derived by running the SAME transform over an
        # empty batch frame: a zero-event drain commits no parquet files
        # and inference would fail; on non-empty sinks the read and the
        # wire-parity compare are unchanged
        from streaming_data_pipeline_spark.streaming.pipeline import transform

        sink_schema = transform(
            spark.createDataFrame([], "value string"), as_of=AS_OF
        ).schema
        sunk = spark.read.schema(sink_schema).parquet(out_dir)
        out = (
            sunk.groupBy("event_type")
            .agg(
                F.count("*").alias("event_count"),
                F.sum("message_length").alias("total_msg_len"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
                F.countDistinct("event_date").alias("active_days"),
            )
            .orderBy("event_type")
        )
        # detach from the about-to-be-deleted sink dir without a driver
        # pandas roundtrip (same pattern as _drain)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES = {
    "streaming_windowed_counts": streaming_windowed_counts,
    "streaming_windowed_append": streaming_windowed_append,
    "streaming_user_sessions": streaming_user_sessions,
    "streaming_session_append": streaming_session_append,
    "streaming_sliding_counts": streaming_sliding_counts,
    "streaming_dedup_user_event": streaming_dedup_user_event,
    "streaming_stateful_user_totals": streaming_stateful_user_totals,
    "streaming_etl_file_roundtrip": streaming_etl_file_roundtrip,
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
    "streaming_windowed_append": """
    WITH wm AS (SELECT MAX(ts) - INTERVAL 2 HOURS AS cutoff FROM events)
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events, wm
    WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= cutoff
    GROUP BY 1, 2
    ORDER BY 1, 2
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
    "streaming_session_append": """
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
    ),
    agg AS (
      SELECT MIN(ts) AS session_start,
             MAX(ts) + INTERVAL 2 HOURS AS session_end,
             user_id,
             CAST(COUNT(*) AS BIGINT) AS event_count
      FROM sessions
      GROUP BY user_id, session_id
    )
    SELECT * FROM agg
    WHERE session_end <= (SELECT MAX(ts) - INTERVAL 4 HOURS FROM events)
    ORDER BY user_id, session_start
    """,
    "streaming_sliding_counts": """
    WITH w AS (
      SELECT date_trunc('hour', ts) AS window_start FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR FROM events
    )
    SELECT window_start, CAST(COUNT(*) AS BIGINT) AS event_count
    FROM w GROUP BY 1 ORDER BY 1
    """,
    "streaming_dedup_user_event": """
    SELECT DISTINCT user_id, event_type FROM events
    ORDER BY user_id, event_type
    """,
    "streaming_stateful_user_totals": """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    "streaming_etl_file_roundtrip": ENRICHED_CTE
    + """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           CAST(SUM(message_length) AS BIGINT) AS total_msg_len,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(COUNT(DISTINCT CAST("timestamp" AS DATE)) AS BIGINT) AS active_days
    FROM enriched
    -- the WIRE path (unlike the batch enriched CTE) runs T5
    -- validate_required: to_json omits NULL fields, so a NULL props /
    -- user_id / event_type parses back as a missing required key and
    -- the row is dropped before the sink
    WHERE message IS NOT NULL AND user_id IS NOT NULL
      AND event_type IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
}


def streaming_foreach_batch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent warehouse upsert via foreachBatch (SURVEY.md §2.1 S2's
    exactly-once variant): each micro-batch MERGEs into a keyed parquet
    state table, keeping the latest event per user (ts, then event_id as
    tiebreak). The final state equals last-event-per-user over the whole
    fixture — the oracle computes exactly that window. At warehouse
    scale the merge target would be Delta/Iceberg MERGE INTO; the batch
    logic here is the same algebra (union -> row_number -> keep rn=1)."""
    from pyspark.sql import Window

    state_dir = tempfile.mkdtemp(prefix="spark_graft_upsert_")
    # Version pointer for the copy-on-write state table: each batch
    # reads vN and writes vN+1, so the directory being read is never
    # the one being written. The pointer flip is the atomic commit —
    # the same shape as Delta/Iceberg's snapshot swap, with executors
    # writing every byte (no driver-side materialization at any batch
    # or state size).
    cur = {"path": None, "ver": 0}

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        merged = (
            sp.read.parquet(cur["path"]).unionByName(batch_df)
            if cur["path"] is not None
            else batch_df
        )
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        latest = (
            merged.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        cur["ver"] += 1
        new_path = f"{state_dir}/v{cur['ver']}"
        latest.write.mode("errorifexists").parquet(new_path)
        old, cur["path"] = cur["path"], new_path
        if old is not None:
            shutil.rmtree(old, ignore_errors=True)

    try:
        stream = events_fixture_stream(spark, sf_dir).select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        q = (
            stream.writeStream.foreachBatch(upsert)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{state_dir}/ckpt")
            .start()
        )
        q.awaitTermination()
        if cur["path"] is None:
            # zero batches -> no state table was ever written
            return spark.createDataFrame(
                [], "event_id bigint, ts timestamp_ntz, user_id bigint, "
                "event_type string, value double"
            )
        # localCheckpoint pins the final state in executor storage so
        # the temp dir can be reclaimed without driver materialization.
        # (Non-replicated storage: fine on local[*]; a cluster deploy
        # would keep the state dir until the result is consumed, or use
        # reliable checkpointing.)
        return (
            spark.read.parquet(cur["path"])
            .orderBy("user_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


QUERIES["streaming_foreach_batch_upsert"] = streaming_foreach_batch_upsert
ORACLE["streaming_foreach_batch_upsert"] = """
SELECT event_id, ts, user_id, event_type, value
FROM (
  SELECT event_id, ts, user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
"""


def streaming_rate_source_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4, oracle-checked: the rate-controlled generator
    (web-application.py:432-471 analog, streaming/sources.py
    synthetic_event_stream) feeding the full wire ETL chain
    (parse -> validate -> coerce -> enrich -> quality-filter).

    Determinism: the rate-micro-batch source makes batch b exactly the
    value range [b*N, (b+1)*N), and every generated field except the
    event timestamp is a pure function of that index, so restricting to
    indices < 1000 gives a fixed result set no matter how many batches
    ran before the query was stopped. The DuckDB oracle regenerates the
    same 1000 events from range(1000). ``sf_dir`` is unused (the source
    IS the generator); timestamp-derived columns are excluded from the
    aggregate because the rate source stamps wall-clock time.
    """
    import time

    from streaming_data_pipeline_spark.operators.transforms import wire_pipeline

    n = 1000
    wire = synthetic_event_stream(spark, rows_per_batch=500)
    etl = wire_pipeline(wire, as_of=AS_OF)
    name = f"rate_etl_{next(_counter)}"
    q = (
        etl.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        # The generator's quality chain drops nothing (every synthetic
        # row scores >= 75), so sink count == generated count and the
        # deterministic prefix [0, n) is complete once count >= n.
        deadline = time.time() + 120
        while spark.table(name).count() < n:
            if time.time() > deadline:
                raise TimeoutError("rate stream did not reach %d rows" % n)
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination()
    snap = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    idx = F.regexp_extract("message", r"#(\d+)", 1).cast("long")
    return (
        snap.withColumn("idx", idx)
        .filter(F.col("idx") < n)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("event_count"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
            F.sum("message_length").alias("total_msg_len"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


QUERIES["streaming_rate_source_etl"] = streaming_rate_source_etl
ORACLE["streaming_rate_source_etl"] = """
WITH g AS (SELECT CAST(u.i AS BIGINT) AS i FROM UNNEST(range(1000)) AS u(i)),
ev AS (
  SELECT i,
         (['login','logout','purchase','page_view','click','error','signup'])[CAST(i % 7 AS INT) + 1] AS event_type,
         round(((i * 7919 + 13) % 49999) / 100.0, 2) AS value,
         'message #' || CAST(i AS VARCHAR) AS message
  FROM g)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
       CAST(SUM(length(message)) AS BIGINT) AS total_msg_len,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM ev GROUP BY event_type ORDER BY event_type
"""


def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks on both sides and a
    time-range condition — the funnel query (each purchase joined to the
    same user's page views in the preceding 6 hours) that batch engines
    do with a plain theta join and streaming engines need symmetric-hash
    state for. Watermarks bound both join-state buffers (an
    unwatermarked stream-stream join grows state forever); the
    time-range condition tells Spark exactly when a buffered view can
    never match again. The availableNow drain emits every match, so the
    oracle is the batch join with the identical condition.
    """
    views = (
        events_fixture_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").cast("timestamp").alias("view_ts"),
        )
        .withWatermark("view_ts", "6 hours")
    )
    purchases = (
        events_fixture_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("purchase_ts"),
            "value",
        )
        .withWatermark("purchase_ts", "6 hours")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") > F.col("purchase_ts") - F.expr("INTERVAL 6 HOURS")),
        "inner",
    )
    # join state keyed by user_id (both buffers): ~1.5k fixture users
    # (size to key cardinality on a cluster) — measured 16.0->3.0s steady
    pairs = _drain(joined, spark, "append", state_partitions=8)
    return (
        pairs.groupBy(F.col("p_user").alias("user_id"))
        .agg(
            F.count("*").alias("pair_count"),
            F.countDistinct("view_ts").alias("distinct_views"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
        .orderBy("user_id")
    )


def streaming_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join with watermarks — the null-side
    emission path the inner join never exercises. A purchase with no
    preceding-6h view emits a null-view row only once the view-side
    watermark proves no match can still arrive (view watermark >
    purchase_ts, since the condition bounds view_ts <= purchase_ts);
    purchases newer than the final watermark stay buffered and are
    withheld. The oracle is the batch left join with the same condition,
    minus unmatched purchases the final watermark (max ts - 6 h) never
    released — proving watermark-gated outer-null emission, not just
    join arithmetic.
    """
    # identified users only: the symmetric-hash join state is keyed by
    # user_id, and a NULL key can neither match nor be evicted sanely —
    # Spark's streaming join drops such rows where the batch oracle's
    # outer join would keep them; the oracle applies the same predicate
    views = (
        events_fixture_stream(spark, sf_dir)
        .filter((F.col("event_type") == "view") & F.col("user_id").isNotNull())
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").cast("timestamp").alias("view_ts"),
        )
        .withWatermark("view_ts", "6 hours")
    )
    purchases = (
        events_fixture_stream(spark, sf_dir)
        .filter(
            (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
        )
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "6 hours")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") > F.col("purchase_ts") - F.expr("INTERVAL 6 HOURS")),
        "left_outer",
    )
    # join state keyed by user_id (both buffers): ~1.5k fixture users —
    # measured 16.2->2.9s steady
    pairs = _drain(joined, spark, "append", state_partitions=8)
    return (
        pairs.groupBy(F.col("p_user").alias("user_id"))
        .agg(
            F.sum(F.when(F.col("view_ts").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("matched_pairs"),
            F.sum(F.when(F.col("view_ts").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("unmatched_purchases"),
        )
        .orderBy("user_id")
    )


def streaming_stream_stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join with watermarks — completes the
    streaming join matrix (inner / left above): null-side emission on
    BOTH sides, each gated by the other side's watermark. An unmatched
    purchase is released once the global watermark passes purchase_ts
    (no view with view_ts <= purchase_ts can still arrive); an
    unmatched view once the watermark passes view_ts + 6h (no purchase
    in the view's [view_ts, view_ts + 6h) match window can still
    arrive). The oracle applies BOTH release cutoffs to the batch full
    join: rows the final watermark (min of the two stream maxima - 6 h)
    never released are excluded — so the row proves two-sided
    watermark-gated eviction, not just join arithmetic. State stays
    bounded exactly because those eviction rules also delete the
    buffered rows they emit.
    """
    # identified users only: the symmetric-hash join state is keyed by
    # user_id, and a NULL key can neither match nor be evicted sanely —
    # Spark's streaming join drops such rows where the batch oracle's
    # outer join would keep them; the oracle applies the same predicate
    views = (
        events_fixture_stream(spark, sf_dir)
        .filter((F.col("event_type") == "view") & F.col("user_id").isNotNull())
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").cast("timestamp").alias("view_ts"),
        )
        .withWatermark("view_ts", "6 hours")
    )
    purchases = (
        events_fixture_stream(spark, sf_dir)
        .filter(
            (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
        )
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "6 hours")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") > F.col("purchase_ts") - F.expr("INTERVAL 6 HOURS")),
        "full_outer",
    )
    # join state keyed by user_id (both buffers): ~1.5k fixture users —
    # measured 14.3->3.1s steady
    pairs = _drain(joined, spark, "append", state_partitions=8)
    return (
        pairs.groupBy(F.coalesce("p_user", "v_user").alias("user_id"))
        .agg(
            F.sum(
                F.when(
                    F.col("view_ts").isNotNull() & F.col("purchase_ts").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("matched_pairs"),
            F.sum(F.when(F.col("view_ts").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("unmatched_purchases"),
            F.sum(F.when(F.col("purchase_ts").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("unmatched_views"),
        )
        .orderBy("user_id")
    )


QUERIES["streaming_stream_stream_join"] = streaming_stream_stream_join
QUERIES["streaming_stream_stream_left_join"] = streaming_stream_stream_left_join
QUERIES["streaming_stream_stream_full_join"] = streaming_stream_stream_full_join
QUERIES["streaming_update_mode_changelog"] = streaming_update_mode_changelog
QUERIES["streaming_chained_window_rollup"] = streaming_chained_window_rollup
ORACLE["streaming_stream_stream_join"] = """
WITH views AS (
  SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'),
purch AS (
  SELECT user_id, ts AS purchase_ts, value FROM events
  WHERE event_type = 'purchase')
SELECT p.user_id,
       CAST(COUNT(*) AS BIGINT) AS pair_count,
       CAST(COUNT(DISTINCT view_ts) AS BIGINT) AS distinct_views,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM purch p JOIN views l
  ON p.user_id = l.user_id
 AND l.view_ts <= p.purchase_ts
 AND l.view_ts > p.purchase_ts - INTERVAL 6 HOURS
GROUP BY p.user_id
ORDER BY p.user_id
"""
ORACLE["streaming_stream_stream_left_join"] = """
WITH views AS (
  SELECT user_id, ts AS view_ts FROM events
  WHERE event_type = 'view' AND user_id IS NOT NULL),
purch AS (
  SELECT user_id, ts AS purchase_ts FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL),
wm AS (
  SELECT least((SELECT MAX(ts) FROM events WHERE event_type = 'view'),
               (SELECT MAX(ts) FROM events WHERE event_type = 'purchase'))
         - INTERVAL 6 HOURS AS cutoff),
matched AS (
  SELECT p.user_id, CAST(COUNT(*) AS BIGINT) AS matched_pairs
  FROM purch p JOIN views v
    ON p.user_id = v.user_id
   AND v.view_ts <= p.purchase_ts
   AND v.view_ts > p.purchase_ts - INTERVAL 6 HOURS
  GROUP BY p.user_id),
unmatched AS (
  SELECT p.user_id, CAST(COUNT(*) AS BIGINT) AS unmatched_purchases
  FROM purch p, wm
  WHERE p.purchase_ts < wm.cutoff
    AND NOT EXISTS (
      SELECT 1 FROM views v
      WHERE v.user_id = p.user_id
        AND v.view_ts <= p.purchase_ts
        AND v.view_ts > p.purchase_ts - INTERVAL 6 HOURS)
  GROUP BY p.user_id)
SELECT COALESCE(m.user_id, u.user_id) AS user_id,
       COALESCE(m.matched_pairs, 0) AS matched_pairs,
       COALESCE(u.unmatched_purchases, 0) AS unmatched_purchases
FROM matched m FULL OUTER JOIN unmatched u ON m.user_id = u.user_id
ORDER BY user_id
"""
ORACLE["streaming_update_mode_changelog"] = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""
ORACLE["streaming_chained_window_rollup"] = """
WITH wm AS (SELECT MAX(ts) - INTERVAL 2 HOURS AS cutoff FROM events),
hours AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(value AS DECIMAL(18,2))) AS vsum
  FROM events GROUP BY 1, 2),
six AS (
  SELECT CAST(to_timestamp(CAST(floor(epoch(h) / 21600) AS BIGINT) * 21600)
              AS TIMESTAMP) AS window_start,
         event_type,
         CAST(SUM(n) AS BIGINT) AS event_count,
         CAST(SUM(vsum) AS DOUBLE) AS value_sum,
         CAST(COUNT(*) AS BIGINT) AS hours_present
  FROM hours GROUP BY 1, 2)
SELECT s.window_start, s.event_type, s.event_count, s.value_sum,
       s.hours_present
FROM six s, wm
WHERE s.window_start + INTERVAL 6 HOURS <= wm.cutoff
ORDER BY s.window_start, s.event_type
"""
# NOTE (both outer-join oracles): the eviction cutoffs use strict '<'
# at the exact watermark boundary. Spark's symmetric-hash join applies
# small +/-1ms adjustments when deriving state watermarks, so a fixture
# event landing EXACTLY on the boundary could disagree; the fixtures'
# microsecond-random timestamps make that measure-zero, but if the
# fixtures are ever regenerated with round-hour timestamps this is the
# first place to look.
ORACLE["streaming_stream_stream_full_join"] = """
WITH views AS (
  SELECT user_id, ts AS view_ts FROM events
  WHERE event_type = 'view' AND user_id IS NOT NULL),
purch AS (
  SELECT user_id, ts AS purchase_ts FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL),
wm AS (
  SELECT least((SELECT MAX(ts) FROM events WHERE event_type = 'view'),
               (SELECT MAX(ts) FROM events WHERE event_type = 'purchase'))
         - INTERVAL 6 HOURS AS cutoff),
matched AS (
  SELECT p.user_id, CAST(COUNT(*) AS BIGINT) AS matched_pairs
  FROM purch p JOIN views v
    ON p.user_id = v.user_id
   AND v.view_ts <= p.purchase_ts
   AND v.view_ts > p.purchase_ts - INTERVAL 6 HOURS
  GROUP BY p.user_id),
unmatched_p AS (
  SELECT p.user_id, CAST(COUNT(*) AS BIGINT) AS unmatched_purchases
  FROM purch p, wm
  WHERE p.purchase_ts < wm.cutoff
    AND NOT EXISTS (
      SELECT 1 FROM views v
      WHERE v.user_id = p.user_id
        AND v.view_ts <= p.purchase_ts
        AND v.view_ts > p.purchase_ts - INTERVAL 6 HOURS)
  GROUP BY p.user_id),
unmatched_v AS (
  SELECT v.user_id, CAST(COUNT(*) AS BIGINT) AS unmatched_views
  FROM views v, wm
  WHERE v.view_ts + INTERVAL 6 HOURS < wm.cutoff
    AND NOT EXISTS (
      SELECT 1 FROM purch p
      WHERE p.user_id = v.user_id
        AND v.view_ts <= p.purchase_ts
        AND v.view_ts > p.purchase_ts - INTERVAL 6 HOURS)
  GROUP BY v.user_id)
SELECT COALESCE(m.user_id, up.user_id, uv.user_id) AS user_id,
       COALESCE(m.matched_pairs, 0) AS matched_pairs,
       COALESCE(up.unmatched_purchases, 0) AS unmatched_purchases,
       COALESCE(uv.unmatched_views, 0) AS unmatched_views
FROM matched m
FULL OUTER JOIN unmatched_p up ON m.user_id = up.user_id
FULL OUTER JOIN unmatched_v uv ON COALESCE(m.user_id, up.user_id) = uv.user_id
ORDER BY user_id
"""


def streaming_static_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join — the dimension-enrichment shape
    every production pipeline runs (stream of facts, small slowly-
    changing dim): the replayed event stream joins a 5-row event_type ->
    (category, weight) dim before a windowed aggregate.

    Spark re-plans the join every micro-batch with the static side
    BROADCAST, so the unbounded stream side never shuffles for the join
    and a dim refresh (re-reading the table between batches) needs no
    stream restart. The left join keeps unknown event types (category
    NULL) rather than silently dropping facts — the T5-adjacent posture
    for late-arriving dim rows. The weighted sum runs in DECIMAL
    (exact, order-independent) per the repo's float protocol.
    """
    stream = events_fixture_stream(spark, sf_dir)
    dim = spark.createDataFrame(
        [
            ("view", "engagement", "1.0"),
            ("click", "engagement", "2.0"),
            ("signup", "conversion", "5.0"),
            ("purchase", "conversion", "10.0"),
            ("error", "ops", "0.0"),
        ],
        "event_type string, category string, weight string",
    ).select(
        "event_type", "category", F.col("weight").cast("decimal(4,1)").alias("weight")
    )
    joined = stream.join(F.broadcast(dim), "event_type", "left")
    agg = joined.groupBy(
        F.window("ts", "1 day").start.alias("day"), "category"
    ).agg(
        F.count("*").alias("event_count"),
        F.sum(F.col("value").cast("decimal(18,2)") * F.col("weight"))
        .cast("double")
        .alias("weighted_value"),
    )
    # state keys = (day x category): ~90 — measured 2.4->1.1s steady
    return _drain_complete(agg, spark, state_partitions=8).orderBy("day", "category")


QUERIES["streaming_static_enrich_join"] = streaming_static_enrich_join
ORACLE["streaming_static_enrich_join"] = """
WITH dim(event_type, category, weight) AS (VALUES
  ('view', 'engagement', CAST(1.0 AS DECIMAL(4,1))),
  ('click', 'engagement', CAST(2.0 AS DECIMAL(4,1))),
  ('signup', 'conversion', CAST(5.0 AS DECIMAL(4,1))),
  ('purchase', 'conversion', CAST(10.0 AS DECIMAL(4,1))),
  ('error', 'ops', CAST(0.0 AS DECIMAL(4,1))))
SELECT date_trunc('day', e.ts) AS day, d.category,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2)) * d.weight) AS DOUBLE)
         AS weighted_value
FROM events e LEFT JOIN dim d ON e.event_type = d.event_type
GROUP BY 1, 2
ORDER BY 1, 2
"""


def streaming_state_inspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline state-store inspection: the aggregation state of a
    checkpointed streaming job read back as a batch table via Spark 4's
    ``format("statestore")`` reader — the ops surface that lets you
    audit or debug a 1000-executor streaming job's keyed state with a
    plain batch query, zero downtime, no instrumentation in the job.

    The fixture stream runs a per-type count/sum/min aggregation to
    completion (availableNow drain), so the final state store holds
    exactly the batch aggregation buffers — deterministic, and the
    DuckDB oracle is the same aggregation over ``events``. Matching
    proves the checkpoint state is both readable and *right*, which is
    also what makes the checkpoint trustworthy for recovery
    (tests/test_streaming.py::test_stateful_agg_state_recovers_across_restart
    proves the restore half).
    """
    stream = events_fixture_stream(spark, sf_dir)
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("value_sum"),
        F.min("value").alias("value_min"),
    )
    ck = tempfile.mkdtemp(prefix="spark_graft_state_ck_")
    name = f"state_inspect_{next(_counter)}"
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        spark.catalog.dropTempView(name)
        state = spark.read.format("statestore").load(ck)
        out = (
            state.select(
                F.col("key.event_type").alias("event_type"),
                F.col("value.count").alias("event_count"),
                F.col("value.sum").cast("double").alias("value_sum"),
                F.col("value.min").alias("value_min"),
            )
            .orderBy("event_type")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(ck, ignore_errors=True)


QUERIES["streaming_state_inspection"] = streaming_state_inspection
ORACLE["streaming_state_inspection"] = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
       MIN(value) AS value_min
FROM events GROUP BY event_type ORDER BY event_type
"""


def streaming_scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL dimension enrichment on a stream: each event is joined
    to the SCD2 state its user's last PURCHASE put them in AS OF the
    event's own timestamp — the as-of join a production pipeline runs
    against a warehouse dimension (user tier, consent state, plan) that
    changes over time.

    Shape: the dim is the SCD2 compaction of purchase events
    ([valid_from, valid_to) intervals via one lead() window — the batch
    scd2_user_state pattern on the purchase subset), read as a STATIC
    table; the unbounded event stream joins it per micro-batch on
    user_id equality + interval containment (ts >= valid_from AND
    (valid_to IS NULL OR ts < valid_to)). Stream-static joins re-plan
    every batch, the equality key hashes, the range rides as a join
    filter, and the dim broadcasts — the stream never shuffles for the
    join, and a dim refresh needs no stream restart. Events before the
    user's first purchase keep NULL state (left join; 'none' bucket),
    the correct late-dim posture. Spark streaming has no native as-of
    join; interval-containment against an SCD2 static is the standard
    re-expression (each event matches exactly one interval)."""
    from pyspark.sql import Window

    from streaming_data_pipeline_spark.sources.batch import load_table

    ev_batch = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev_batch.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id")
        .select(
            F.col("user_id").alias("d_user"),
            F.lit("purchaser").alias("base_state"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
        .withColumn(
            "state",
            F.concat(
                F.lit("since_"), F.date_format("valid_from", "yyyy-MM-dd HH")
            ),
        )
    )
    stream = events_fixture_stream(spark, sf_dir)
    joined = stream.join(
        F.broadcast(dim),
        (F.col("user_id") == F.col("d_user"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        "left",
    )
    agg = joined.groupBy(
        F.coalesce(F.col("state"), F.lit("none")).alias("asof_state")
    ).agg(
        F.count("*").alias("n_events"),
        # exact DECIMAL sum (order-independent, float protocol); distinct
        # counts aren't allowed in streaming aggs
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("value_sum"),
    )
    # a few hundred hourly SCD2 states: right-size the stateful
    # exchange (see _drain)
    return _drain_complete(agg, spark, state_partitions=8).orderBy("asof_state")


QUERIES["streaming_scd2_asof_enrich"] = streaming_scd2_asof_enrich
ORACLE["streaming_scd2_asof_enrich"] = """
WITH dim AS (
  SELECT user_id AS d_user,
         ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
         'since_' || strftime(ts, '%Y-%m-%d %H') AS state
  FROM events WHERE event_type = 'purchase'),
joined AS (
  SELECT e.user_id, e.value, COALESCE(d.state, 'none') AS asof_state
  FROM events e
  LEFT JOIN dim d
    ON e.user_id = d.d_user
   AND e.ts >= d.valid_from
   AND (d.valid_to IS NULL OR e.ts < d.valid_to))
SELECT asof_state,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM joined GROUP BY asof_state ORDER BY asof_state
"""


def streaming_multimodal_phash_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode ON THE STREAMING PATH: the documents table
    replayed through the micro-batch engine, real PNG payloads
    synthesized and DECODED per batch in the same fused Arrow
    ``mapInPandas`` stage the batch path uses
    (operators/multimodal.py:synth_dhash_png — spec-valid PNGs, full
    filter set, perceptual dHash, one Python crossing),
    then a stateful rollup over the 64-bit hash space (16 buckets of
    h_lo). Proves the §2.9 Arrow escape hatch composes with Structured
    Streaming unchanged — the decode stage is batch/stream symmetric,
    so an image-ingest pipeline reuses the exact operator objects. The
    oracle regenerates pixels, dHash bits, packed hashes, and the
    rollup in SQL."""
    from streaming_data_pipeline_spark.operators.multimodal import (
        synth_dhash_png,
    )

    docs = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    # Fused synth->decode->dHash stage (guide §4; one crossing).
    sig = synth_dhash_png(docs)
    agg = sig.groupBy(F.pmod(F.col("h_lo"), F.lit(16)).alias("bucket")).agg(
        F.count("*").alias("n_images"),
        F.sum("h_lo").alias("h_lo_sum"),
        F.sum("h_hi").alias("h_hi_sum"),
    )
    # 16 hash buckets: right-size the stateful exchange (see _drain)
    return _drain_complete(agg, spark, state_partitions=8).orderBy("bucket")


QUERIES["streaming_multimodal_phash_rollup"] = streaming_multimodal_phash_rollup
ORACLE["streaming_multimodal_phash_rollup"] = """
WITH dims AS (
  SELECT doc_id, 16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h FROM documents),
g AS (
  SELECT d.doc_id, r.i AS r, c.i AS c,
         (d.doc_id * 31 + ((r.i * d.h) // 8) * 17 + ((c.i * d.w) // 9) * 7)
           % 256 AS p
  FROM dims d,
       UNNEST(range(CAST(8 AS BIGINT))) AS r(i),
       UNNEST(range(CAST(9 AS BIGINT))) AS c(i)),
bits AS (
  SELECT a.doc_id, a.r * 8 + a.c AS k,
         CASE WHEN b.p > a.p THEN 1 ELSE 0 END AS bit
  FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
  WHERE a.c < 8),
h AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN k < 32
                       THEN bit * (CAST(1 AS BIGINT) << k) ELSE 0 END)
              AS BIGINT) AS h_lo,
         CAST(SUM(CASE WHEN k >= 32
                       THEN bit * (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END)
              AS BIGINT) AS h_hi
  FROM bits GROUP BY doc_id)
SELECT h_lo % 16 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(h_lo) AS BIGINT) AS h_lo_sum,
       CAST(SUM(h_hi) AS BIGINT) AS h_hi_sum
FROM h GROUP BY bucket ORDER BY bucket
"""


def streaming_approx_users_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROXIMATE distinct users per 6-hour window ON THE STREAM —
    the sketch-aggregation cell of the streaming matrix (exact distinct
    counts are disallowed in streaming aggs; HLL++ is the production
    answer). Self-validating protocol (same as approx_distinct_users /
    hll_mergeable_sketch_union): the sketch value itself is engine-
    internal, so the query emits what IS reproducible — per window, the
    exact-count join back and the boolean "approx within 5% of exact"
    (guaranteed: rsd=0.01). The oracle emits the exact counts and
    literal TRUE."""
    stream = events_fixture_stream(spark, sf_dir)
    agg = stream.groupBy(F.window("ts", "6 hours").alias("w")).agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count("*").alias("n_events"),
    )
    # ~28 six-hour windows at sf0.1: 8 state partitions, not the batch
    # default (see _drain — measured 8.1 s -> 2.8 s)
    drained = _drain_complete(agg, spark, state_partitions=8).select(
        F.col("w.start").alias("window_start"), "approx_users", "n_events"
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .select(F.col("w.start").alias("window_start"), "exact_users")
    )
    return (
        drained.join(exact, "window_start")
        .select(
            F.col("window_start").cast("timestamp").alias("window_start"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("exact_users").cast("long").alias("exact_users"),
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("within_5pct"),
        )
        .orderBy("window_start")
    )


QUERIES["streaming_approx_users_per_window"] = streaming_approx_users_per_window
ORACLE["streaming_approx_users_per_window"] = """
SELECT CAST(time_bucket(INTERVAL 6 HOUR, ts) AS TIMESTAMP) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_5pct
FROM events GROUP BY 1 ORDER BY 1
"""


def streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher-style quality-rule report ON THE STREAMING PATH: the
    documents table replayed through the micro-batch engine, per-doc
    rule flags computed as pure ARRAY EXPRESSIONS (no per-doc groupBy
    — token stats fold inside `aggregate`/`transform` on the token
    array), so the whole query needs exactly ONE stateful aggregation
    (per source) and is legal in complete mode. Same thresholds and
    output schema as the batch `gopher_rules_filter`; the oracle is
    the identical SQL, which doubles as a batch/stream parity proof.

    The array form is the stream-safe shape of the batch query's
    two-level hash-agg: per-doc work is O(tokens^2) worst-case for the
    dominance count but tokens-per-doc is document-bounded (not
    corpus-bounded), and everything stays in whole-stage codegen.
    """
    docs = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    toks = "filter(split(text, ' '), x -> x <> '')"
    stats = docs.select(
        "source",
        F.expr(f"size({toks})").alias("n_words"),
        F.expr(f"size(array_distinct({toks}))").alias("n_types"),
        F.expr(
            f"aggregate(transform({toks}, x -> length(x)), 0, (a, x) -> a + x)"
        ).alias("chars"),
        F.expr(
            f"array_max(transform(array_distinct({toks}),"
            f" t -> size(filter({toks}, x -> x = t))))"
        ).alias("mx"),
    ).filter(F.col("n_words") > 0)
    # rule predicates + rollup are the single shared copy
    # (functions/quality_rules.py) — identical by construction to the
    # batch gopher_rules_filter, which is what makes the shared oracle
    # a genuine batch/stream parity proof.
    from streaming_data_pipeline_spark.functions.quality_rules import (
        gopher_flag_cols,
        gopher_report_aggs,
    )

    flagged = stats.select("source", *gopher_flag_cols())
    agg = flagged.groupBy("source").agg(*gopher_report_aggs())
    # 20 sources: right-size the stateful exchange (see _drain)
    return _drain_complete(agg, spark, state_partitions=8).orderBy("source")


QUERIES["streaming_quality_gate"] = streaming_quality_gate

from streaming_data_pipeline_spark.plans.curation_queries import (
    ORACLE as _CURATION_ORACLE,
)

ORACLE["streaming_quality_gate"] = _CURATION_ORACLE["gopher_rules_filter"]
