"""Scale-posture operators: the pieces that make the engine hold up at
100 TB, each verified for correctness at sf0.01 by the DuckDB oracle.

- ``partitioned_sink_pruning`` — the warehouse sink the reference
  only *recommends* (README.md:354 suggests date-partitioned BigQuery
  tables): a date-partitioned parquet write whose read-back carries the
  freshness predicate as a PartitionFilter, so a 10min/1h/24h query
  (SURVEY.md §2.7 P2) touches days, not history.
- ``retention_expire_partitions`` — the reference's 30-day warehouse
  expiration (README.md:308-315) as an O(days) partition drop over the
  same date-partitioned sink: no rows read or rewritten.
- ``embedding_centroids_by_label`` — element-wise vector mean per
  label, the reduce step of distributed k-means / class prototypes.
  posexplode -> (label, pos) hash-agg -> re-assemble keeps every stage a
  built-in whole-stage-codegen operator; no driver-side vectors.
- ``sessionize_events_batch`` — gap-based sessionization (30 min
  inactivity splits a session) as two window functions + one agg; the
  batch twin of streaming/windows.session_window_stats.
- ``skew_salted_join`` — explicit salt-and-replicate equi-join for the
  hot-key case where one join key carries a disproportionate share of
  the fact rows and the dim is too big to broadcast whole. AQE's skew
  handling covers sort-merge spills at runtime; salting is the static
  variant that also spreads the *aggregation* that follows. Results are
  provably identical to the plain join (the oracle IS the plain join).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_pipeline_spark.plans.base import (
    int_halfup_avg_expr,
    int_halfup_avg_sql,
)
from streaming_data_pipeline_spark.sources.batch import load_table

_D2 = "decimal(18,2)"


def partitioned_sink_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-partitioned parquet sink + partition-pruned read-back.

    The read plan's scan node shows ``PartitionFilters: [...event_date...]``
    — only 7 of 30 day-directories are listed/read. At 100 TB this is the
    difference between scanning ~23 TB and ~5 TB for a week-window query.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    base = tempfile.mkdtemp(prefix="spark_graft_part_")
    try:
        ev.write.mode("overwrite").partitionBy("event_date").parquet(base)
        # explicit schema: a zero-row source writes a fileless sink, where
        # schema inference fails; the schema is the writer's own, so the
        # non-empty read (and its PartitionFilters pruning) is unchanged
        back = spark.read.schema(ev.schema).parquet(base).filter(
            F.col("event_date").between("2024-01-08", "2024-01-14")
        )
        out = (
            back.withColumn(
                "event_date", F.col("event_date").cast("timestamp_ntz")
            )
            .groupBy("event_date", "event_type")
            .agg(
                F.count("*").alias("event_count"),
                F.sum(F.col("value").cast(_D2)).cast("double").alias("value_sum"),
            )
            .orderBy("event_date", "event_type")
        )
        # detach from the about-to-be-deleted sink dir without a driver
        # pandas roundtrip
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def retention_expire_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 30-day warehouse expiration (README.md:308-315)
    as a partition-level retention op: write the date-partitioned sink,
    drop every day-partition older than the cutoff (a filesystem/
    metadata operation — zero rows read or rewritten), read back.

    The read-back aggregate proves both halves: expired dates are gone
    (any surviving old partition would add rows the oracle doesn't
    have) and retained dates are byte-intact (counts and sums match the
    source restricted to >= cutoff).
    """
    from streaming_data_pipeline_spark.operators.retention import (
        expire_old_partitions,
    )

    cutoff = "2024-01-20"
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    base = tempfile.mkdtemp(prefix="spark_graft_ret_")
    try:
        ev.write.mode("overwrite").partitionBy("event_date").parquet(base)
        expire_old_partitions(base, "event_date", cutoff)
        # explicit schema: survives both a fileless (empty-source) sink
        # and the everything-expired case with zero surviving partitions
        back = spark.read.schema(ev.schema).parquet(base)
        out = (
            back.groupBy(
                F.col("event_date").cast("timestamp_ntz").alias("event_date")
            )
            .agg(
                F.count("*").alias("event_count"),
                F.sum(F.col("value").cast(_D2)).cast("double").alias("value_sum"),
            )
            .orderBy("event_date")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def small_file_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction over the date-partitioned sink
    (operators/maintenance.py).

    Writes the events sink with 8-way task parallelism (8 small files
    per day-partition — the shape a 60 s streaming trigger leaves
    behind), bin-packs every partition to its byte-target (here: one
    file), and proves both halves: ``compacted_ok`` asserts the physical
    file count collapsed (from the operator's report, a 30-row metadata
    join), and the per-date count/sum aggregate must equal the source —
    any row lost or duplicated by the rewrite breaks the oracle match.
    """
    from streaming_data_pipeline_spark.operators.maintenance import (
        compact_partitioned_sink,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    base = tempfile.mkdtemp(prefix="spark_graft_compact_")
    try:
        ev.repartition(8).write.mode("overwrite").partitionBy(
            "event_date"
        ).parquet(base)
        report = compact_partitioned_sink(
            spark, base, "event_date", target_bytes=1 << 30
        )
        rep = spark.createDataFrame(
            [
                (
                    r["partition"].split("=", 1)[1],
                    r["files_before"],
                    r["files_after"],
                )
                for r in report
            ],
            "event_date string, files_before int, files_after int",
        )
        # explicit schema: a zero-row source leaves a fileless sink where
        # inference fails (the compaction report is just empty then)
        back = spark.read.schema(ev.schema).parquet(base)
        out = (
            back.groupBy(F.col("event_date").cast("string").alias("event_date"))
            .agg(
                F.count("*").alias("event_count"),
                F.sum(F.col("value").cast(_D2)).cast("double").alias("value_sum"),
            )
            .join(F.broadcast(rep), "event_date")
            .select(
                F.col("event_date").cast("timestamp_ntz").alias("event_date"),
                "event_count",
                "value_sum",
                (F.col("files_after") == 1).alias("compacted_ok"),
            )
            .orderBy("event_date")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def embedding_centroids_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column.

    posexplode fans each vector into (pos, component) rows, a single
    hash aggregate averages per (label, pos), and sort_array over
    collected (pos, mean) structs reassembles ordered vectors — all
    JVM-side built-ins, linear in rows x dim, no skew (dim is uniform).

    The reassembled centroid is emitted as a canonical fixed-precision
    string (not array<double>): the driver's order-insensitive value
    hasher cannot hash array columns, and '%.6f' after round(.,6)+0.0
    renders the identical double identically in Spark and DuckDB.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    parts = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x")
    )
    return (
        parts.groupBy("label", "pos")
        .agg((F.round(F.avg("x"), 6) + F.lit(0.0)).alias("mean_x"))
        .groupBy("label")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "mean_x"))),
                    lambda s: F.format_string("%.6f", s.mean_x),
                ),
            ).alias("centroid"),
            F.count("*").cast("long").alias("dim"),
        )
        .select(
            F.col("label").cast("long").alias("label"),
            "centroid",
            "dim",
        )
        .orderBy("label")
    )


def sessionize_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions: a >30-minute silence starts a new session.

    lag() marks boundaries, a running sum numbers sessions, one agg
    collapses them — two window passes over the same (user_id, ts)
    ordering, so Spark sorts each user partition once and reuses it.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Integer MICROSECONDS, not seconds: a long cast of the timestamp
    # floors the sub-second part while DuckDB's epoch() keeps it
    # fractional AND its BIGINT cast ROUNDS — a gap near the 1800 s
    # boundary could split sessions differently per engine. micros is
    # exact in both (unix_micros / epoch_us), the same protocol as
    # first_touch_attribution (which promises these exact boundaries).
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    numbered = ev.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast(_D2)).cast("double").alias("value_sum"),
        )
        # no total sort (r11): order-insensitive compare; the range
        # sampler re-ran this plan's tail once more just for bounds
    )


def skew_salted_join(spark: SparkSession, sf_dir: str, salt: int = 8) -> DataFrame:
    """Salted equi-join of events against a per-type stats dim.

    The fact side gets a uniform salt in [0, salt); the dim side is
    replicated salt times; the join key becomes (event_type, salt), so a
    hot event_type spreads over ``salt`` reducers instead of one. The
    salt derives from event_id (deterministic), and the post-join
    aggregate is salt-invariant, so output == unsalted join (the oracle).
    """
    ev = load_table(spark, sf_dir, "events")
    # The dim carries the integer-exact mean ingredients (cents sum +
    # count), NOT a double average: `value > type_avg` on a raw double
    # avg is order-of-summation-sensitive at the ulp level, so a value
    # within 1 ulp of its group mean could flip above_avg_count on one
    # engine only. cents*n > sum*n-style cross-multiplication is exact.
    dim = ev.groupBy(F.col("event_type").alias("d_type")).agg(
        F.avg(F.col("value")).alias("type_avg"),
        # cents cast to decimal(38,0) BEFORE the sum (the file's exactness
        # protocol): summing in int64 first would throw under ANSI near
        # int64 at real scale while DuckDB's SUM(BIGINT) auto-promotes to
        # HUGEINT — the exact cross-engine divergence class this avoids.
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("type_cents"),
        F.count("*").cast("decimal(38,0)").alias("type_n"),
    )
    salted_dim = dim.withColumn(
        "d_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    fact = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(salt)).cast("int"))
    joined = fact.join(
        salted_dim,
        (fact.event_type == salted_dim.d_type) & (fact.salt == salted_dim.d_salt),
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            # + 0.0 normalizes IEEE signed zero: the delta is mathematically
            # 0 per group, so each engine's summation order leaves a ±ε
            # residual and round() can yield -0.0 on one side only.
            (F.round(F.avg(F.col("value") - F.col("type_avg")), 4) + F.lit(0.0)).alias(
                "avg_delta"
            ),
            F.sum(
                F.when(
                    (F.col("value").cast("decimal(18,2)") * 100).cast(
                        "decimal(38,0)"
                    )
                    * F.col("type_n")
                    > F.col("type_cents"),
                    1,
                ).otherwise(0)
            ).alias("above_avg_count"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "partitioned_sink_pruning": partitioned_sink_pruning,
    "retention_expire_partitions": retention_expire_partitions,
    "small_file_compaction": small_file_compaction,
    "embedding_centroids_by_label": embedding_centroids_by_label,
    "sessionize_events_batch": sessionize_events_batch,
    "skew_salted_join": skew_salted_join,
}


ORACLE = {
    "partitioned_sink_pruning": """
    SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date, event_type,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    "retention_expire_partitions": """
    SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-20'
    GROUP BY 1 ORDER BY 1
    """,
    "small_file_compaction": """
    SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
           TRUE AS compacted_ok
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
    "embedding_centroids_by_label": """
    WITH parts AS (
      SELECT label, CAST(u.i AS INT) AS pos,
             CAST(embedding[CAST(u.i AS INT) + 1] AS DOUBLE) AS x
      FROM embeddings, UNNEST(range(len(embedding))) AS u(i)
    ),
    means AS (
      SELECT label, pos, round(AVG(x), 6) + 0.0 AS mean_x
      FROM parts GROUP BY label, pos
    )
    SELECT CAST(label AS BIGINT) AS label,
           array_to_string(list(printf('%.6f', mean_x) ORDER BY pos), ',') AS centroid,
           CAST(COUNT(*) AS BIGINT) AS dim
    FROM means GROUP BY label ORDER BY label
    """,
    "sessionize_events_batch": """
    WITH numbered AS (
      SELECT user_id, event_id, ts, value,
             SUM(CASE WHEN prev_epoch IS NULL
                      OR epoch - prev_epoch > 1800 * 1000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM (
        SELECT user_id, event_id, ts, value,
               epoch_us(ts) AS epoch,
               lag(epoch_us(ts))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_epoch
        FROM events
      )
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    "skew_salted_join": """
    WITH dim AS (
      SELECT event_type AS d_type, AVG(value) AS type_avg,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS type_cents,
             COUNT(*) AS type_n
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(AVG(value - type_avg), 4) + 0.0 AS avg_delta,
           CAST(SUM(CASE WHEN CAST(CAST(value AS DECIMAL(18,2)) * 100
                               AS HUGEINT) * type_n > type_cents
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS above_avg_count
    FROM events JOIN dim ON event_type = d_type
    GROUP BY event_type
    ORDER BY event_type
    """,
}


def range_join_promo_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: events against promo time windows.

    A non-equi BETWEEN join has no hash key, so Spark plans a nested-loop
    join — viable at 100 TB only if the interval side broadcasts (it
    does: promo calendars are tiny) or, for large interval sets, after
    bucketing both sides by coarse time bucket to recover an equi
    prefix. The explicit F.broadcast pins the viable plan.
    """
    ev = load_table(spark, sf_dir, "events")
    promos = spark.createDataFrame(
        [
            ("winter_sale", "2024-01-05 00:00:00", "2024-01-12 00:00:00"),
            ("flash", "2024-01-15 00:00:00", "2024-01-16 00:00:00"),
            ("month_end", "2024-01-25 00:00:00", "2024-01-31 00:00:00"),
        ],
        "promo string, start_ts string, end_ts string",
    ).select(
        "promo",
        F.col("start_ts").cast("timestamp_ntz").alias("start_ts"),
        F.col("end_ts").cast("timestamp_ntz").alias("end_ts"),
    )
    return (
        ev.join(
            F.broadcast(promos),
            (ev.ts >= promos.start_ts) & (ev.ts < promos.end_ts),
        )
        .groupBy("promo")
        .agg(
            F.count("*").alias("event_count"),
            F.countDistinct("user_id").alias("unique_users"),
            F.sum(F.col("value").cast(_D2)).cast("double").alias("value_sum"),
        )
        .orderBy("promo")
    )


QUERIES["range_join_promo_windows"] = range_join_promo_windows
ORACLE["range_join_promo_windows"] = """
WITH promos(promo, start_ts, end_ts) AS (VALUES
  ('winter_sale', TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-12 00:00:00'),
  ('flash',       TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '2024-01-16 00:00:00'),
  ('month_end',   TIMESTAMP '2024-01-25 00:00:00', TIMESTAMP '2024-01-31 00:00:00'))
SELECT promo,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events JOIN promos ON ts >= start_ts AND ts < end_ts
GROUP BY promo
ORDER BY promo
"""


def backfill_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent day-level backfill via dynamic partition overwrite.

    The warehouse op the reference's append-only sink can't express:
    re-running one day's corrected pipeline output must replace exactly
    that day's partition and leave every other day byte-intact. With
    ``spark.sql.sources.partitionOverwriteMode=dynamic``, an overwrite
    INSERT replaces only the partitions present in the incoming frame —
    an O(1 partition) metadata swap, no matter how many days the table
    holds. (Static mode — the default — would truncate the whole table
    first; at 100 TB that difference is the whole ballgame.)

    Here: write all 30 days, then re-run 2024-01-10 with its values
    corrected (doubled), then read the table back and aggregate. The
    oracle computes the same aggregate from the source with the day-10
    correction applied — matching proves the overwrite touched exactly
    the one partition.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    base = tempfile.mkdtemp(prefix="spark_graft_backfill_")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        # Cluster by the partition key before the partitioned write
        # (guide §6): without it every scan task opens one file PER day
        # directory (tasks x 30 files — at sf0.1 the whole table is one
        # split, so a single task wrote all 30 partitions sequentially);
        # hash-distributed, each day is one task writing one right-sized
        # file, the write parallelizes across the 30 days, and the
        # read-back lists 30 files instead of tasks x 30.
        ev.repartition(F.col("event_date")).write.mode("overwrite").partitionBy(
            "event_date"
        ).parquet(base)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        corrected = ev.filter(F.col("event_date") == "2024-01-10").withColumn(
            "value", F.col("value") * 2.0
        )
        corrected.write.mode("overwrite").partitionBy("event_date").parquet(base)
        # explicit schema: a zero-row source means both writes were
        # fileless and inference would fail; non-empty reads are unchanged
        back = spark.read.schema(ev.schema).parquet(base)
        out = (
            back.withColumn("event_date", F.col("event_date").cast("timestamp_ntz"))
            .groupBy("event_date")
            .agg(
                F.count("*").alias("event_count"),
                F.sum(F.col("value").cast(_D2)).cast("double").alias("value_sum"),
            )
            .orderBy("event_date")
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        shutil.rmtree(base, ignore_errors=True)


QUERIES["backfill_dynamic_overwrite"] = backfill_dynamic_overwrite
ORACLE["backfill_dynamic_overwrite"] = """
SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       CAST(SUM(CAST(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-10'
                          THEN value * 2.0 ELSE value END
                     AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events
GROUP BY CAST(ts AS DATE)
ORDER BY event_date
"""


def hll_mergeable_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: per-day HLL sketches unioned
    into per-type totals — the 100 TB pattern where each ingest shard
    persists a sketch and global distincts come from merging kilobyte
    states instead of reshuffling raw IDs (exact COUNT DISTINCT needs
    every distinct value in one place; sketch union needs one reduce of
    fixed-size buffers — at 1000 executors that is the difference
    between a terabyte-scale exchange and a broadcast-sized one).

    Sketch bytes are engine-specific, so like ``approx_distinct_users``
    the query is self-validating: it emits the exact per-type distinct
    count plus a boolean asserting the merged-sketch estimate lands
    within 5% of it; the oracle emits the exact count and literal TRUE.
    The two-level shape (sketch per (type, day), union per type) is the
    point — it proves the estimate survives state merge, not just a
    single-pass aggregation.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    daily = ev.groupBy("event_type", "event_date").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.countDistinct("user_id").alias("daily_exact"),
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"),
        F.sum("daily_exact").alias("sum_daily_exact"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            "sum_daily_exact",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("merged_est_within_5pct"),
        )
        .orderBy("event_type")
    )


QUERIES["hll_mergeable_sketch_union"] = hll_mergeable_sketch_union
ORACLE["hll_mergeable_sketch_union"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS event_date,
         COUNT(DISTINCT user_id) AS daily_exact
  FROM events GROUP BY event_type, CAST(ts AS DATE))
SELECT e.event_type,
       CAST(e.exact_users AS BIGINT) AS exact_users,
       CAST(d.sum_daily_exact AS BIGINT) AS sum_daily_exact,
       TRUE AS merged_est_within_5pct
FROM (SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
      FROM events GROUP BY event_type) e
JOIN (SELECT event_type, SUM(daily_exact) AS sum_daily_exact
      FROM daily GROUP BY event_type) d USING (event_type)
ORDER BY e.event_type
"""


def schema_evolution_merge_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution over a partitioned warehouse: early
    day-partitions were written before a column existed, later ones
    carry it; ``mergeSchema`` unions the parquet footers so one scan
    reads both vintages, with NULL for the column where it predates the
    data. The aggregate proves rows from both vintages survive with the
    right column fill. At 100 TB this is the norm, not the edge case —
    a year of daily partitions spans many pipeline versions, and
    rewriting history on every added column is a non-starter (schema
    merge is footer metadata work, zero data rewrite).

    V1 (days < 2024-01-15): no ``quality_tier``. V2 (>= 15th): adds it.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    v1 = ev.filter(F.col("event_date") < "2024-01-15").select(
        "event_id", "event_type", "value", "event_date"
    )
    v2 = ev.filter(F.col("event_date") >= "2024-01-15").select(
        "event_id",
        "event_type",
        "value",
        "event_date",
        F.when(F.col("value") >= 50.0, "high").otherwise("low").alias("quality_tier"),
    )
    base = tempfile.mkdtemp(prefix="spark_graft_evo_")
    try:
        v1.write.mode("overwrite").partitionBy("event_date").parquet(base)
        v2.write.mode("append").partitionBy("event_date").parquet(base)
        # the real footer merge runs whenever files exist; a zero-row
        # source leaves a fileless sink (no footers to merge), where the
        # v2 schema — the superset the merge would produce — stands in
        back = (
            spark.read.option("mergeSchema", "true").parquet(base)
            if _parquet_files(base)
            else spark.createDataFrame([], v2.schema)
        )
        out = (
            back.groupBy(
                F.coalesce(F.col("quality_tier"), F.lit("pre_schema")).alias(
                    "quality_tier"
                ),
                "event_type",
            )
            .agg(
                F.count("*").alias("event_count"),
                F.sum(F.col("value").cast(_D2)).cast("double").alias("value_sum"),
            )
            .orderBy("quality_tier", "event_type")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES["schema_evolution_merge_read"] = schema_evolution_merge_read
ORACLE["schema_evolution_merge_read"] = """
SELECT CASE WHEN CAST(ts AS DATE) < DATE '2024-01-15' THEN 'pre_schema'
            WHEN value >= 50.0 THEN 'high' ELSE 'low' END AS quality_tier,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
ORDER BY quality_tier, event_type
"""


def _bloom_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join the runtime bloom filter prunes: a selective predicate
    on ``orders`` (creation side) semi-filters the ``lineitem`` scan
    (application side) before its shuffle."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 450000.0
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("line_count"),
            F.sum(
                (F.col("l_extendedprice").cast(_D2))
                * (F.lit(1).cast(_D2) - F.col("l_discount").cast(_D2))
            )
            .cast("decimal(38,4)")
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_BLOOM_CONFS = {
    # force injection at fixture scale: the rule normally requires a
    # >=10 GB application-side scan — exactly the 100 TB regime this
    # demonstrates — and a sub-10 MB creation side (holds here).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # runtime filters target shuffle joins; keep the demo on the
    # sort-merge path the filter exists for.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def bloom_filter_join_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning (Catalyst InjectRuntimeFilter):
    a selective dimension predicate builds a bloom filter at runtime and
    applies it to the fact-side scan BEFORE the join shuffle, so rows
    that cannot match never leave the scan stage. At 100 TB this is the
    difference between shuffling the whole fact table and shuffling the
    ~matching sliver; it composes with (and complements) static
    partition pruning, which can't see a runtime-computed key set.

    The plan is materialized (localCheckpoint) while the bloom confs
    are set, then session confs are restored so the forced thresholds
    don't leak into other queries. tests/ assert the physical plan
    contains the BloomFilterMightContain probe.
    """
    conf = spark.conf
    saved = {k: conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        conf.set(k, v)
    try:
        return _bloom_join_frame(spark, sf_dir).localCheckpoint(eager=True)
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


QUERIES["bloom_filter_join_pruning"] = bloom_filter_join_pruning
ORACLE["bloom_filter_join_pruning"] = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS line_count,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                     (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
            AS DECIMAL(38,4)) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 450000.0
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


def incremental_rollup_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance via mergeable partial
    aggregates: a stored daily rollup is brought up to date by merging
    the NEW days' partials into it — no rescan of raw history. This is
    the exact-aggregate twin of `hll_mergeable_sketch_union`: COUNT and
    DECIMAL SUM are mergeable state, AVG is derived at read time (never
    stored, since averages don't merge).

    Flow: history (days < 2024-01-25) is aggregated once and persisted
    as the stored view; the delta (remaining days) is aggregated alone;
    refresh = unionByName(stored, delta partials) -> re-reduce by key.
    At 100 TB the refresh touches |view| + |delta| rows — the raw fact
    history is never read again, which is the only viable shape when
    history is petabytes and the delta is one day. The oracle recomputes
    the rollup from ALL raw events, proving merged partials are exactly
    the full recompute.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    cutoff = "2024-01-25"

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_date", "event_type").agg(
            F.count("*").alias("event_count"),
            F.sum(F.col("value").cast(_D2)).alias("value_sum"),
        )

    base = tempfile.mkdtemp(prefix="spark_graft_mv_")
    try:
        partials(ev.filter(F.col("event_date") < cutoff)).write.mode(
            "overwrite"
        ).parquet(base)
        stored = spark.read.parquet(base)
        delta = partials(ev.filter(F.col("event_date") >= cutoff))
        refreshed = (
            stored.unionByName(delta)
            .groupBy("event_date", "event_type")
            .agg(
                F.sum("event_count").alias("event_count"),
                F.sum("value_sum").alias("value_sum"),
            )
            .select(
                # date -> timestamp on both sides: the repo's canonical
                # hash-friendly form for date outputs
                F.col("event_date").cast("timestamp").alias("event_date"),
                "event_type",
                "event_count",
                F.col("value_sum").cast("double").alias("value_sum"),
                # derived avg, tie-safe (e.g. 307.03/8 = 38.37875
                # lands exactly on a round-half boundary)
                int_halfup_avg_expr("value_sum", "event_count").alias(
                    "value_avg"
                ),
            )
            .orderBy("event_date", "event_type")
        )
        return refreshed.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES["incremental_rollup_maintenance"] = incremental_rollup_maintenance
ORACLE["incremental_rollup_maintenance"] = f"""
SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date, event_type,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
       {int_halfup_avg_sql("SUM(CAST(value AS DECIMAL(18,2)))", "COUNT(*)")} AS value_avg
FROM events
GROUP BY 1, 2
ORDER BY event_date, event_type
"""


def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-layout co-located join: both tables written bucketBy(8)
    on the join key, so the sort-merge join consumes bucket files
    directly — NO per-query Exchange on either side (plan-asserted in
    tests/test_extended_surface.py::test_bucketed_join_avoids_shuffle).
    At 100 TB this is THE amortization move: one layout-time shuffle
    when the table is written, then every subsequent join on that key
    is exchange-free. Broadcast is disabled inside the query so the
    demo exercises the co-located path (broadcast would win at fixture
    scale and hide it).
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    base = tempfile.mkdtemp(prefix="spark_graft_bkt_")
    # per-run table names (tempdir suffix): a fixed name would let two
    # concurrent sessions sharing a warehouse drop each other's tables
    run_id = base.rsplit("_", 1)[-1]
    t_orders, t_cust = f"q_orders_bkt_{run_id}", f"q_customer_bkt_{run_id}"
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").option(
            "path", f"{base}/orders"
        ).mode("overwrite").saveAsTable(t_orders)
        cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey").option(
            "path", f"{base}/customer"
        ).mode("overwrite").saveAsTable(t_cust)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = spark.table(t_orders)
        c = spark.table(t_cust)
        out = (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("order_count"),
                F.sum(F.col("o_totalprice").cast(_D2))
                .cast("decimal(38,2)")
                .cast("double")
                .alias("revenue"),
            )
            .orderBy("c_mktsegment")
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_cust}")
        shutil.rmtree(base, ignore_errors=True)


QUERIES["bucketed_colocated_join"] = bucketed_colocated_join
ORACLE["bucketed_colocated_join"] = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS order_count,
       CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
            AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


def kmeans_lloyd_iterations(
    spark: SparkSession, sf_dir: str, k: int = 8, iters: int = 2
) -> DataFrame:
    """Distributed k-means (Lloyd) over the embedding column — the
    iterative-algorithm class (IVF coarse quantizer training is exactly
    this). Each iteration: broadcast the k centroids against the vector
    table (k rows — never a shuffle of the big side), assignment =
    argmin of an in-order zip_with/aggregate distance fold (sequential
    fold -> engine-identical doubles; struct-min tiebreaks equal
    distances on centroid id), recompute = posexplode + one hash-agg
    per (cluster, pos). Centroids are rounded to 6 dp between
    iterations so both engines iterate from identical values. At 100 TB
    the per-iteration cost is one scan + one |k x dim| aggregate; the
    centroid table stays broadcast-sized by construction.

    Init: the k lowest vec_ids (deterministic; no sampled seeding).
    Output: final (cluster_id, n_members, pos, mean_x) exploded rows.
    """
    if iters < 1:
        raise ValueError("kmeans needs at least one Lloyd iteration")
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())  # canonical NULL-vector rule
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    cent = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("c"))
    )
    dist = F.aggregate(
        F.zip_with("v", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = None
    for _ in range(iters):
        a = emb.crossJoin(F.broadcast(cent)).withColumn("dist", dist)
        # NOTE(r11 optimization round): caching best/means per iteration
        # was tried and REVERTED — at iters=2 the recomputed lineage is
        # two cheap scans, while the cache materialization barriers cost
        # ~2x the whole query (measured 1.87 s -> 3.69 s at sf0.1).
        # Deep-iteration runs should localCheckpoint cent per round
        # instead; at iters=2 the plain lineage is fastest.
        best = (
            a.groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cid")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cid"))
        )
        means = (
            emb.join(best, "vec_id")
            .select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg((F.round(F.avg("x"), 6) + F.lit(0.0)).alias("mean_x"))
        )
        cent = means.groupBy("cid").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "mean_x"))),
                lambda s: s.mean_x,
            ).alias("c")
        )
    sizes = best.groupBy("cid").agg(F.count("*").alias("n_members"))
    return (
        means.join(sizes, "cid")
        .select(
            F.col("cid").cast("long").alias("cluster_id"),
            "n_members",
            F.col("pos").cast("long").alias("pos"),
            "mean_x",
        )
        .orderBy("cluster_id", "pos")
    )


QUERIES["kmeans_lloyd_iterations"] = kmeans_lloyd_iterations
ORACLE["kmeans_lloyd_iterations"] = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE embedding IS NOT NULL),
c0 AS (
  SELECT vec_id AS cid, v AS c FROM e ORDER BY vec_id LIMIT 8),
d1 AS (
  SELECT e.vec_id, c0.cid,
         list_sum(list_transform(range(1, len(e.v) + 1),
                  i -> (e.v[i] - c0.c[i]) * (e.v[i] - c0.c[i]))) AS dist
  FROM e CROSS JOIN c0),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d1) WHERE rn = 1),
m1 AS (
  SELECT a1.cid, u.i - 1 AS pos, ROUND(AVG(e.v[u.i]), 6) + 0.0 AS mean_x
  FROM e JOIN a1 USING (vec_id), UNNEST(range(1, CAST(len(e.v) + 1 AS BIGINT))) AS u(i)
  GROUP BY a1.cid, u.i),
c1 AS (
  SELECT cid, list(mean_x ORDER BY pos) AS c FROM m1 GROUP BY cid),
d2 AS (
  SELECT e.vec_id, c1.cid,
         list_sum(list_transform(range(1, len(e.v) + 1),
                  i -> (e.v[i] - c1.c[i]) * (e.v[i] - c1.c[i]))) AS dist
  FROM e CROSS JOIN c1),
a2 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d2) WHERE rn = 1),
m2 AS (
  SELECT a2.cid, u.i - 1 AS pos, ROUND(AVG(e.v[u.i]), 6) + 0.0 AS mean_x
  FROM e JOIN a2 USING (vec_id), UNNEST(range(1, CAST(len(e.v) + 1 AS BIGINT))) AS u(i)
  GROUP BY a2.cid, u.i),
sz AS (
  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members FROM a2 GROUP BY cid)
SELECT CAST(m2.cid AS BIGINT) AS cluster_id, sz.n_members,
       CAST(m2.pos AS BIGINT) AS pos, m2.mean_x
FROM m2 JOIN sz USING (cid)
ORDER BY cluster_id, pos
"""


def _parquet_files(base: str) -> list[str]:
    """Sorted absolute paths of every parquet data file under ``base``
    — the manifest primitive the snapshot queries commit, and the
    fileless-sink probe the read-back paths branch on (a zero-row
    write produces a directory with no data files)."""
    out = []
    for root, _dirs, names in os.walk(base):
        out.extend(os.path.join(root, n) for n in names if n.endswith(".parquet"))
    return sorted(out)


def _write_versioned_events(spark: SparkSession, sf_dir: str, base: str):
    """Shared scaffolding for the snapshot/CDF queries: two commits to
    a manifest-versioned, event_type-partitioned table — v1 = days
    before Jan 21, v2 = append of the rest. Returns (data_dir,
    v1_files, v2_files, schema) with files as sorted absolute paths."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", F.col("value").cast(_D2).alias("value")
    )
    data = f"{base}/data"

    def _files():
        return _parquet_files(data)

    ev.filter(F.col("ts") < "2024-01-21").write.partitionBy("event_type").mode(
        "overwrite"
    ).parquet(data)
    v1 = _files()
    ev.filter(F.col("ts") >= "2024-01-21").write.partitionBy("event_type").mode(
        "append"
    ).parquet(data)
    # the schema rides along so readers of an EMPTY manifest (zero-row
    # source -> fileless commits) can build the equivalent empty relation
    return data, v1, _files(), ev.schema


def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-versioned table with time-travel reads — the lakehouse
    commit model (Delta/Iceberg's log) reduced to its algebra: each
    version is a MANIFEST (list of immutable data files); commits never
    mutate files. v1 = initial load (days <= Jan 20, partitioned by
    event_type); v2 = append commit (new files only); v3 = DELETE of
    the error partition as a METADATA-ONLY commit (the manifest drops
    those files — zero data rewritten, the same trick as a partition-
    level DELETE in any table format). A reader pinned to a manifest
    gets snapshot isolation for free: concurrent commits only add
    files it never lists. At 100 TB the manifest is the only
    driver-side object and scales with file count, not data.

    Output: per (version, event_type) row counts + sums, read back AS
    OF each manifest; the oracle recomputes each snapshot's semantic
    definition from raw events.
    """
    base = tempfile.mkdtemp(prefix="spark_graft_tt_")
    try:
        data, v1, v2, schema = _write_versioned_events(spark, sf_dir, base)
        v3 = [f for f in v2 if "event_type=error" not in f]
        manifests = {1: v1, 2: v2, 3: v3}

        def read_as_of(ver: int) -> DataFrame:
            # an empty manifest IS a legal snapshot (zero-row source, or
            # every file deleted by a metadata commit): read it as the
            # empty relation instead of handing parquet zero paths
            snap = (
                spark.read.option("basePath", data).parquet(*manifests[ver])
                if manifests[ver]
                else spark.createDataFrame([], schema)
            )
            return snap.groupBy("event_type").agg(
                F.count("*").alias("row_count"),
                F.sum("value").cast("double").alias("value_sum"),
            ).select(F.lit(ver).cast("long").alias("version"), "*")

        out = (
            read_as_of(1)
            .unionByName(read_as_of(2))
            .unionByName(read_as_of(3))
            .orderBy("version", "event_type")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES["snapshot_time_travel"] = snapshot_time_travel
ORACLE["snapshot_time_travel"] = """
WITH d AS (
  SELECT event_type, ts, CAST(value AS DECIMAL(18,2)) AS value FROM events)
SELECT CAST(1 AS BIGINT) AS version, event_type,
       CAST(COUNT(*) AS BIGINT) AS row_count,
       CAST(SUM(value) AS DOUBLE) AS value_sum
FROM d WHERE ts < TIMESTAMP '2024-01-21 00:00:00' GROUP BY event_type
UNION ALL
SELECT 2, event_type, CAST(COUNT(*) AS BIGINT), CAST(SUM(value) AS DOUBLE)
FROM d GROUP BY event_type
UNION ALL
SELECT 3, event_type, CAST(COUNT(*) AS BIGINT), CAST(SUM(value) AS DOUBLE)
FROM d
-- v3 deletes exactly the error partition; the NULL-type partition
-- (__HIVE_DEFAULT_PARTITION__) survives the commit, and a bare <>
-- would silently drop it from the oracle's snapshot
WHERE event_type <> 'error' OR event_type IS NULL
GROUP BY event_type
ORDER BY version, event_type
"""


def theta_sketch_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET ALGEBRA over distinct user audiences — the
    operation HLL cannot do: per-segment sketches of user_id are
    intersected / unioned / differenced as kilobyte objects, never
    exchanging raw IDs. "How many purchasers also hit errors" over
    100 TB becomes a merge of two sketches a coordinator can hold in
    hand. Self-validating like the HLL queries: the exact answers ride
    along (computed with real INTERSECT / EXCEPT set ops) plus
    within-2% booleans for the sketch estimates; the oracle recomputes
    the exact values and emits literal TRUE (at fixture cardinalities
    the sketches are exact-mode, so the tolerance never flakes).
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id")
    e = ev.filter(F.col("event_type") == "error").select("user_id")
    sk = (
        ev.filter(F.col("event_type").isin("purchase", "error"))
        .groupBy("event_type")
        .agg(F.expr("theta_sketch_agg(user_id)").alias("sk"))
    )
    # Merge step: per-arm FILTERed union-aggs pivot the (at most two)
    # segment sketches onto one row, then the BINARY theta_intersection /
    # theta_union scalars combine them. theta_intersection_agg over ZERO
    # sketches (an empty events batch -> no groups) throws datasketches'
    # "infinite set" SketchesStateException; a FILTERed theta_union_agg
    # over zero rows returns NULL instead, and coalescing each arm with
    # an EMPTY sketch (theta_sketch_agg over no rows — a legal 8-byte
    # compact empty) makes both set operations total: estimate 0, the
    # exact counts 0, the within-2% flags true. Non-empty inputs take
    # the identical union->intersect algebra as before.
    empty_sk = "theta_sketch_agg(event_type) FILTER (WHERE 1 = 0)"
    est = sk.agg(
        F.expr(
            "coalesce(theta_union_agg(sk) FILTER (WHERE event_type = 'purchase'),"
            f" {empty_sk})"
        ).alias("sk_p"),
        F.expr(
            "coalesce(theta_union_agg(sk) FILTER (WHERE event_type = 'error'),"
            f" {empty_sk})"
        ).alias("sk_e"),
    ).select(
        F.expr(
            "theta_sketch_estimate(theta_intersection(sk_p, sk_e))"
        ).alias("est_i"),
        F.expr("theta_sketch_estimate(theta_union(sk_p, sk_e))").alias("est_u"),
    )
    # exact answers in ONE scan: per-user purchase/error flags, then a
    # single count over the flag table (the earlier three separate
    # INTERSECT/UNION/EXCEPT actions scanned events three times)
    flags = (
        ev.filter(F.col("event_type").isin("purchase", "error"))
        .groupBy("user_id")
        .agg(
            F.max(F.col("event_type") == "purchase").alias("has_p"),
            F.max(F.col("event_type") == "error").alias("has_e"),
        )
    )
    exact = flags.agg(
        # coalesce: SUM over zero flag rows is NULL; the exact set sizes
        # of an empty corpus are 0 (COUNT already says so for the union).
        F.coalesce(
            F.sum(F.when(F.col("has_p") & F.col("has_e"), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("exact_intersection"),
        F.count("*").cast("long").alias("exact_union"),
        F.coalesce(
            F.sum(F.when(F.col("has_p") & ~F.col("has_e"), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("exact_purchase_only"),
    )
    ok = lambda est_c, ex_c: (  # noqa: E731
        F.abs(est_c - ex_c) <= F.greatest(F.lit(1.0), 0.02 * ex_c)
    )
    return exact.crossJoin(est).select(
        "exact_intersection",
        "exact_union",
        "exact_purchase_only",
        ok(F.col("est_i"), F.col("exact_intersection")).alias("intersection_ok"),
        ok(F.col("est_u"), F.col("exact_union")).alias("union_ok"),
    )


QUERIES["theta_sketch_audience_overlap"] = theta_sketch_audience_overlap
ORACLE["theta_sketch_audience_overlap"] = """
WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
SELECT CAST((SELECT COUNT(*) FROM (SELECT * FROM p INTERSECT SELECT * FROM e))
            AS BIGINT) AS exact_intersection,
       CAST((SELECT COUNT(*) FROM (SELECT * FROM p UNION SELECT * FROM e))
            AS BIGINT) AS exact_union,
       CAST((SELECT COUNT(*) FROM (SELECT * FROM p EXCEPT SELECT * FROM e))
            AS BIGINT) AS exact_purchase_only,
       TRUE AS intersection_ok,
       TRUE AS union_ok
"""


def approx_topk_mergeable_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable frequent-items (approx_top_k accumulate -> combine ->
    estimate): each source shard builds its own top-k sketch, a single
    combine yields the global top tokens — the two-level shape that
    finds corpus-wide heavy hitters without shuffling raw token counts
    (the exact two-pass variant is `heavy_hitter_bigrams`; this is its
    sketch-merge sibling). Capacity (5000/10000) far exceeds the
    fixture vocabulary, so counts are exact and the oracle compares
    real values; membership at the k=10 boundary is tie-protected by a
    (count desc, item asc) re-rank over a k=50 estimate.
    """
    from streaming_data_pipeline_spark.functions.text import tokens as _tok
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    acc = (
        docs.select("source", F.explode(_tok(F.col("text"))).alias("t"))
        .groupBy("source")
        .agg(F.expr("approx_top_k_accumulate(t, 5000)").alias("st"))
    )
    # Seed one EMPTY accumulate sketch (a zero-row global agg emits a
    # valid empty-sketch row): on a zero-document corpus the groupBy
    # yields no shards and approx_top_k_combine's eval over zero input
    # rows dies with a scala.MatchError on its null buffer; combining
    # one extra empty sketch is the identity on every non-empty corpus,
    # so the output is provably unchanged.
    seed = (
        spark.range(0)
        .select(F.col("id").cast("string").alias("t"))
        .agg(F.expr("approx_top_k_accumulate(t, 5000)").alias("st"))
    )
    acc = acc.select("st").unionByName(seed)
    top = acc.agg(
        F.explode(
            F.expr("approx_top_k_estimate(approx_top_k_combine(st, 10000), 50)")
        ).alias("e")
    ).select(F.col("e.item").alias("token"), F.col("e.count").alias("token_count"))
    w = Window.orderBy(F.desc("token_count"), F.asc("token"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .orderBy("rank")
    )


QUERIES["approx_topk_mergeable_tokens"] = approx_topk_mergeable_tokens
ORACLE["approx_topk_mergeable_tokens"] = """
WITH t AS (
  SELECT u.tok AS token, CAST(COUNT(*) AS BIGINT) AS token_count
  FROM documents d,
       UNNEST(list_filter(string_split(d.text, ' '), x -> x <> '')) AS u(tok)
  GROUP BY 1),
r AS (
  SELECT token, token_count,
         CAST(ROW_NUMBER() OVER (ORDER BY token_count DESC, token ASC) AS BIGINT)
           AS rank
  FROM t)
SELECT token, token_count, rank FROM r WHERE rank <= 10 ORDER BY rank
"""


def kll_quantile_sketch_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KLL quantile sketches, self-validating: per-day
    sketches of `value` are merged per event type (kll_merge_agg — the
    shard-then-merge shape of the HLL/theta/top-k family, for
    quantiles), the merged sketch's p50 estimate is then rank-checked
    against the raw data: the fraction of values at or below the
    estimate must sit within 0.05 of 0.5 (KLL's k=200 normalized rank
    error is ~1.65%, so the 3x margin never flakes even though KLL
    compaction is randomized — which is also why the estimate itself is
    not part of the output). Oracle: exact counts + literal TRUE.
    """
    # NULL values are not observations (the sketch skips them, so the
    # rank check must count the same non-null population) and a NULL
    # event_type would be silently dropped by the equi-join below —
    # both excluded, with the identical predicate in the oracle
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .withColumn("event_date", F.col("ts").cast("date"))
    )
    daily = ev.groupBy("event_type", "event_date").agg(
        F.expr("kll_sketch_agg_double(value)").alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.expr(
            "kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.5)"
        ).alias("p50_est")
    )
    ranked = (
        ev.join(merged, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (
                F.abs(
                    F.sum(F.when(F.col("value") <= F.col("p50_est"), 1).otherwise(0))
                    / F.count("*")
                    - 0.5
                )
                <= 0.05
            ).alias("p50_rank_ok"),
        )
    )
    return ranked.orderBy("event_type")


QUERIES["kll_quantile_sketch_check"] = kll_quantile_sketch_check
ORACLE["kll_quantile_sketch_check"] = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, TRUE AS p50_rank_ok
FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def zorder_locality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering for MULTI-dimensional data skipping:
    interleave the bits of two independent dimensions (user bucket,
    value bucket) into one sort key, so that a RANGE of z-values bounds
    BOTH dimensions at once — the layout trick (Delta ZORDER BY /
    Iceberg sort orders) that lets one sorted file layout serve
    predicates on either column. Single-column sorting can only cluster
    one dimension; the z-curve trades a constant factor on each to get
    locality on both.

    The query makes the property measurable: group events by the top 4
    z-bits (16 curve segments) and emit each segment's min/max along
    BOTH raw dimensions — every segment must span at most half of each
    dimension's range (tests assert it), versus a full-range spread for
    the unsorted layout. Bit arithmetic is identical in DuckDB, so the
    oracle recomputes the interleave exactly.
    """
    ev = load_table(spark, sf_dir, "events")
    bits = " + ".join(
        f"(shiftleft(shiftright(u, {i}) & 1, {2 * i + 1})"
        f" + shiftleft(shiftright(v, {i}) & 1, {2 * i}))"
        for i in range(8)
    )
    z = (
        ev.withColumn("u", (F.col("user_id") % 256).cast("int"))
        .withColumn(
            "v", F.least(F.lit(255), F.floor(F.col("value") * 2.55).cast("int"))
        )
        .withColumn("z", F.expr(bits))
    )
    return (
        z.groupBy(F.shiftright("z", 12).cast("long").alias("z_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("u").cast("long").alias("u_min"),
            F.max("u").cast("long").alias("u_max"),
            F.min("v").cast("long").alias("v_min"),
            F.max("v").cast("long").alias("v_max"),
        )
        .orderBy("z_bucket")
    )


QUERIES["zorder_locality_buckets"] = zorder_locality_buckets
_Z_BITS_SQL = " + ".join(
    f"(((u >> {i}) & 1) << {2 * i + 1}) + (((v >> {i}) & 1) << {2 * i})"
    for i in range(8)
)
ORACLE["zorder_locality_buckets"] = f"""
WITH z AS (
  SELECT CAST(user_id % 256 AS INTEGER) AS u,
         LEAST(255, CAST(FLOOR(value * 2.55) AS INTEGER)) AS v
  FROM events),
zz AS (SELECT u, v, {_Z_BITS_SQL} AS zv FROM z)
SELECT CAST(zv >> 12 AS BIGINT) AS z_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(u) AS BIGINT) AS u_min, CAST(MAX(u) AS BIGINT) AS u_max,
       CAST(MIN(v) AS BIGINT) AS v_min, CAST(MAX(v) AS BIGINT) AS v_max
FROM zz GROUP BY 1 ORDER BY z_bucket
"""


def snapshot_incremental_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed read over the manifest-versioned table: an
    incremental consumer that has processed up to v1 reads EXACTLY the
    files the v2 commit added (manifest difference) — never rescanning
    history. This is how downstream jobs tail a 100 TB table: commits
    are append-only file sets, so "what changed since snapshot N" is
    set subtraction on manifests, zero data reads outside the delta.
    The oracle recomputes the v2-commit rows (days >= Jan 21) from the
    raw events, proving the manifest diff captures the commit exactly.
    """
    base = tempfile.mkdtemp(prefix="spark_graft_cdf_")
    try:
        data, v1, v2, schema = _write_versioned_events(spark, sf_dir, base)
        v1_set = set(v1)
        delta_files = [f for f in v2 if f not in v1_set]
        # a commit that added nothing is a legal (empty) change feed
        changes = (
            spark.read.option("basePath", data).parquet(*delta_files)
            if delta_files
            else spark.createDataFrame([], schema)
        )
        out = (
            changes.groupBy("event_type")
            .agg(
                F.count("*").alias("changed_rows"),
                F.sum("value").cast("double").alias("changed_value_sum"),
                F.min(F.col("ts").cast("date")).cast("timestamp").alias("first_day"),
            )
            .orderBy("event_type")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES["snapshot_incremental_changes"] = snapshot_incremental_changes
ORACLE["snapshot_incremental_changes"] = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS changed_rows,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS changed_value_sum,
       CAST(MIN(CAST(ts AS DATE)) AS TIMESTAMP) AS first_day
FROM events
WHERE ts >= TIMESTAMP '2024-01-21 00:00:00'
GROUP BY event_type
ORDER BY event_type
"""


def file_metadata_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hidden `_metadata` file columns as a storage audit: after a
    one-file-per-partition write (repartition on the partition column),
    every day partition must be exactly one parquet file — the layout a
    small-file-free warehouse maintains — proven by grouping the read
    on `_metadata.file_path` instead of trusting the writer. This is
    the per-file observability surface (file path/name/size/mod time)
    compaction and debugging tools build on; the oracle recomputes the
    per-day row counts and asserts the one-file invariant as a literal.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    base = tempfile.mkdtemp(prefix="spark_graft_meta_")
    try:
        ev.repartition("event_date").write.partitionBy("event_date").mode(
            "overwrite"
        ).parquet(base)
        # explicit schema (fileless-sink safe); _metadata still resolves —
        # it is a scan-node attribute, not part of the data schema
        back = spark.read.schema(ev.schema).parquet(base)
        out = (
            back.groupBy(
                F.col("event_date").cast("timestamp").alias("event_date")
            )
            .agg(
                F.count("*").alias("row_count"),
                F.countDistinct("_metadata.file_path").cast("long").alias(
                    "n_files"
                ),
            )
            .orderBy("event_date")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES["file_metadata_audit"] = file_metadata_audit
ORACLE["file_metadata_audit"] = """
SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS event_date,
       CAST(COUNT(*) AS BIGINT) AS row_count,
       CAST(1 AS BIGINT) AS n_files
FROM events GROUP BY 1 ORDER BY event_date
"""


def cms_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point-frequency estimation — completes the
    mergeable-sketch family (HLL distinct / theta set algebra /
    approx-top-k heavy hitters / KLL quantiles / + CMS frequencies):
    d=4 hash rows x w=256 buckets, cells built as one hash-aggregate
    over (row, bucket) increments — the mergeable-partials shape (shard
    sketches sum cell-wise; map-side combine does the heavy lifting, a
    1024-cell array moves per shard instead of the token stream).
    Point estimate for a token = min over rows of its 4 cells; CMS
    never underestimates (every occurrence lands in all 4 counted
    cells; collisions only add). Probes: the exact top-10 tokens. The
    hashes are md5-derived and deterministic, so BOTH the cells and the
    estimates are exactly reproducible in SQL — the oracle rebuilds the
    sketch and must agree cell-for-cell, making this a stronger check
    than the self-validating boolean protocol the engine-internal
    sketches need."""
    from pyspark.sql import Window

    from streaming_data_pipeline_spark.functions.text import tokens as _tok

    d, width = 4, 256

    def _rb(tcol):
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(F.concat(F.lit(f"{j}:"), tcol)), 1, 7
                                ),
                                16,
                                10,
                            ).cast("long")
                            % width
                        ).alias("bucket"),
                    )
                    for j in range(d)
                ]
            )
        )

    from streaming_data_pipeline_spark.plans.base import (
        plan_cached,
        release_plan_caches,
    )

    release_plan_caches()
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(_tok(F.col("text"))).alias("t"))
    # exact feeds BOTH the probe ranking and the sketch cells — cached
    # so the tokenize explode + count aggregate runs once. The cells are
    # derived from the per-DISTINCT-token counts, not the raw occurrence
    # stream: every occurrence of t lands in the same 4 cells, so
    # cell[j][b] = sum of exact_count over tokens hashing there —
    # identical values, but the 4x md5 band hashing runs per distinct
    # token instead of per occurrence (the duplication factor at corpus
    # scale), and the second full explode pass disappears (guide §2.3
    # aggregate-before-you-shuffle / shuffle keys not payloads).
    exact = plan_cached(
        tok.groupBy("t").agg(F.count("*").cast("long").alias("exact_count"))
    )
    cells = (
        exact.select(_rb(F.col("t")).alias("rb"), "exact_count")
        .select("rb.row", "rb.bucket", "exact_count")
        .groupBy("row", "bucket")
        .agg(F.sum("exact_count").cast("long").alias("cell"))
    )
    w = Window.orderBy(F.desc("exact_count"), F.asc("t"))
    probes = exact.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= 10
    )
    probe_buckets = probes.select(
        "t", "exact_count", "rank", _rb(F.col("t")).alias("rb")
    ).select("t", "exact_count", "rank", "rb.row", "rb.bucket")
    est = (
        probe_buckets.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy("t", "exact_count", "rank")
        .agg(F.min("cell").alias("cms_estimate"))
    )
    return est.select(
        F.col("t").alias("token"),
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("exact_count")).alias("never_underestimates"),
        "rank",
    ).orderBy("rank")


QUERIES["cms_token_frequency"] = cms_token_frequency
ORACLE["cms_token_frequency"] = """
WITH tok AS (
  SELECT u.tok AS t
  FROM documents d,
       UNNEST(list_filter(string_split(d.text, ' '), x -> x <> '')) AS u(tok)),
exact AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS ec FROM tok GROUP BY t),
cells AS (
  SELECT j.j AS row,
         CAST(CAST('0x' || substring(md5(CAST(j.j AS VARCHAR) || ':' || t), 1, 7)
                   AS BIGINT) % 256 AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cell
  FROM tok, (SELECT unnest(range(4)) AS j) j
  GROUP BY 1, 2),
probes AS (
  SELECT t, ec, rnk FROM (
    SELECT t, ec,
           CAST(row_number() OVER (ORDER BY ec DESC, t) AS BIGINT) AS rnk
    FROM exact) WHERE rnk <= 10),
pb AS (
  SELECT p.t, p.ec, p.rnk, j.j AS row,
         CAST(CAST('0x' || substring(md5(CAST(j.j AS VARCHAR) || ':' || p.t), 1, 7)
                   AS BIGINT) % 256 AS BIGINT) AS bucket
  FROM probes p, (SELECT unnest(range(4)) AS j) j),
est AS (
  SELECT pb.t, pb.ec, pb.rnk, MIN(c.cell) AS est
  FROM pb JOIN cells c ON c.row = pb.row AND c.bucket = pb.bucket
  GROUP BY 1, 2, 3)
SELECT t AS token, ec AS exact_count, est AS cms_estimate,
       est >= ec AS never_underestimates, rnk AS rank
FROM est ORDER BY rank
"""


def join_skew_diagnostics(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Pre-join skew DIAGNOSTIC — the profiling pass a pipeline runs
    before a big shuffle join to decide whether to salt (and by how
    much). Companion to `skew_salted_join`, which applies the cure this
    query prescribes.

    Per join key (user_id of the events fact side): row count, share of
    the join input in basis points, and the recommended salt factor —
    ceil(count * P / total) for P=32 target partitions, i.e. how many
    reducers this key needs so no single reducer exceeds the uniform
    per-partition share. All integer arithmetic (BIGINT `div`), one
    hash aggregate + a distributed top-k (TakeOrderedAndProject) — the
    diagnostic itself must stay cheap on a 100 TB input.
    """
    ev = load_table(spark, sf_dir, "events")
    p = 32
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    total = ev.agg(F.count("*").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            F.expr("n * 10000 div total").cast("long").alias("share_bp"),
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(f"(n * {p} + total - 1) div total").cast("long"),
            ).alias("salt_factor"),
        )
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(k)
    )


def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view — the delta-join algebra
    Δ(A ⋈ B) = ΔA ⋈ B₀ + A₀ ⋈ ΔB + ΔA ⋈ ΔB, the two-sided partner of
    `incremental_rollup_maintenance` (which maintains an aggregate; a
    100 TB warehouse needs both).

    View: pairs of (view-event, purchase-event) by the same user —
    i.e. COUNT(*) of the user_id equi-join of the `view` stream with
    the `purchase` stream, grouped by user bucket (user_id % 16). Both
    sides split at 2024-01-25: A₀/B₀ are history, ΔA/ΔB the new days.
    The base join's aggregate is persisted (the stored view), then
    refreshed by adding ONLY the three delta terms — each a join with
    at least one delta input, so a refresh touches |Δ| rows of raw
    data, never the petabyte history. The three delta joins and the
    base join all shuffle on the same user_id key — one exchange
    shape, reusable partitioning. The oracle recomputes the joined
    view from ALL raw events, proving the delta algebra is exact.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("date").alias("d"),
    )
    cutoff = "2024-01-25"
    views = ev.filter(F.col("event_type") == "view")
    purchases = ev.filter(F.col("event_type") == "purchase")
    a0 = views.filter(F.col("d") < cutoff)
    da = views.filter(F.col("d") >= cutoff)
    b0 = purchases.filter(F.col("d") < cutoff)
    db = purchases.filter(F.col("d") >= cutoff)

    def pairs(a: DataFrame, bside: DataFrame) -> DataFrame:
        return (
            a.select("user_id")
            .join(bside.select("user_id"), "user_id")
            .groupBy(F.pmod(F.col("user_id"), F.lit(16)).alias("bucket"))
            .agg(F.count("*").alias("pairs"))
        )

    base = tempfile.mkdtemp(prefix="spark_graft_ivmj_")
    try:
        pairs(a0, b0).write.mode("overwrite").parquet(base)
        stored = spark.read.parquet(base)
        refreshed = (
            stored.unionByName(pairs(da, b0))
            .unionByName(pairs(a0, db))
            .unionByName(pairs(da, db))
            .groupBy("bucket")
            .agg(F.sum("pairs").alias("pairs_refreshed"))
        )
        full = (
            views.select("user_id")
            .join(purchases.select("user_id"), "user_id")
            .groupBy(F.pmod(F.col("user_id"), F.lit(16)).alias("bucket"))
            .agg(F.count("*").alias("pairs_full"))
        )
        out = (
            refreshed.join(full, "bucket", "full_outer")
            .select(
                F.col("bucket").cast("long").alias("bucket"),
                F.coalesce("pairs_full", F.lit(0)).cast("long").alias("pairs_full"),
                F.coalesce("pairs_refreshed", F.lit(0))
                .cast("long")
                .alias("pairs_refreshed"),
                (
                    F.coalesce("pairs_full", F.lit(0))
                    == F.coalesce("pairs_refreshed", F.lit(0))
                ).alias("is_consistent"),
            )
            .orderBy("bucket")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES["join_skew_diagnostics"] = join_skew_diagnostics
ORACLE["join_skew_diagnostics"] = """
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY user_id),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM events)
SELECT user_id, n,
       CAST(n * 10000 // total AS BIGINT) AS share_bp,
       CAST(greatest(1, (n * 32 + total - 1) // total) AS BIGINT) AS salt_factor
FROM c, t
ORDER BY n DESC, user_id ASC
LIMIT 10
"""

QUERIES["incremental_join_maintenance"] = incremental_join_maintenance
ORACLE["incremental_join_maintenance"] = """
WITH v AS (SELECT user_id FROM events WHERE event_type = 'view'),
p AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
full_pairs AS (
  SELECT v.user_id % 16 AS bucket, CAST(COUNT(*) AS BIGINT) AS pairs_full
  FROM v JOIN p ON p.user_id = v.user_id
  GROUP BY 1)
SELECT CAST(bucket AS BIGINT) AS bucket, pairs_full,
       pairs_full AS pairs_refreshed, TRUE AS is_consistent
FROM full_pairs ORDER BY bucket
"""
