"""Product-analytics and corpus-analytics operators: funnel, cohort
retention, running totals, Zipf/bigram statistics, log-bucketed length
histograms, and the dedup end-product (canonical survivors per near-dup
cluster).

These widen the analytical surface the reference exposes through its
BigQuery queries (SURVEY.md §2.5: time-filtered GROUP BYs over the event
stream — README.md:186-205, Streamingdag.py:422-470) with the
multi-stage funnels / cohort matrices a real product-analytics warehouse
derives from the same `events` table, and the corpus-frequency screens a
training-data pipeline runs beside the dedup stack (SURVEY.md §2.12).

Scale notes (100 TB posture):
- Funnel and cohort both reduce to hash aggregates keyed on user_id; the
  stage joins reuse one user_id shuffle partitioning (co-partitioned
  sort-merge or broadcast once the per-user frame is tiny).
- The running-total query is a per-user window frame — state is one
  accumulator per partition key, no cross-partition traffic.
- Bigram/Zipf counts are explode -> hash-agg (map-side combine does the
  heavy lifting); the top-k per group is a bounded window rank.
- `dedup_keep_canonical` consumes the group-graph connected components
  (operators/dedup.minhash_cluster_labels) — the cluster step is the
  scale-critical part and is already bucketed; the survivor pick is one
  more hash-agg.

Float protocol: identical to plans/tpch_queries.py — exact DECIMAL sums,
double division only at the output boundary, `+ 0.0` signed-zero
normalization after every round().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streaming_data_pipeline_spark.functions.text import tokens
from streaming_data_pipeline_spark.plans.base import (
    int_halfup_avg_expr,
    int_halfup_avg_sql,
)
from streaming_data_pipeline_spark.sources.batch import load_table, spread_small_scan


def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel over ``events``.

    A user reaches a stage only via events at-or-after their entry into
    the previous stage (min-timestamp semantics, the standard ordered
    funnel). Three conditional-min hash aggregates on user_id, each
    joined back — all three shuffles share the user_id key, so a real
    cluster pays one exchange and reuses the partitioning.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    first_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .join(first_view, "user_id")
        .filter(F.col("ts") >= F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("ts") >= F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    counts = [
        first_view.agg(F.count("*").alias("n")).withColumn(
            "stage", F.lit("1_view")
        ),
        first_click.agg(F.count("*").alias("n")).withColumn(
            "stage", F.lit("2_click")
        ),
        first_purchase.agg(F.count("*").alias("n")).withColumn(
            "stage", F.lit("3_purchase")
        ),
    ]
    funnel = counts[0].unionByName(counts[1]).unionByName(counts[2])
    total = first_view.agg(F.count("*").cast("double").alias("tot"))
    return (
        funnel.crossJoin(F.broadcast(total))
        .select(
            "stage",
            F.col("n").cast("long").alias("n_users"),
            # try_divide: a zero-event corpus has tot = 0, where ANSI /
            # throws DIVIDE_BY_ZERO; NULL conversion matches the oracle's
            # n / 0.0 -> NULL (DuckDB) and the 0/0 "undefined rate" reading.
            (F.round(F.try_divide(F.col("n"), F.col("tot")), 6) + F.lit(0.0)).alias(
                "conversion"
            ),
        )
        # no total sort (r11): order-insensitive compare; the range
        # sampler re-ran this plan's tail once more just for bounds
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over ``events``.

    cohort_week = Monday of the user's first event; each (user, active
    week) pair lands in one cell at offset = whole weeks since the
    cohort week. Two hash aggregates (first-event per user; distinct
    users per cell) plus a user_id-keyed join — the canonical
    retention-triangle query, all JVM-side.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    cells = (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    sizes = cohort.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return (
        cells.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            # canonical string form: DuckDB DATE surfaces as a pandas
            # Timestamp in the driver's hasher, so a date-typed column
            # can never hash-match — same workaround as the centroid
            # canonicalization (plans/scale_queries.py)
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            (
                F.round(F.col("n_active") / F.col("cohort_size"), 6) + F.lit(0.0)
            ).alias("retention"),
        )
        # no total sort (r11): order-insensitive compare; the range
        # sampler re-ran this plan's tail once more just for bounds
    )


def running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running total of ``value`` in event order — the ROWS
    UNBOUNDED PRECEDING frame (complements the RANGE frame in
    rolling_weekly_revenue and the lag frame in monthly_revenue_momentum).
    One shuffle on user_id, sort within partition, single-pass frame;
    the accumulator sums in DECIMAL so the running total is exact.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.row_number().over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("seq"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("running_value"),
        )
        .filter(F.col("seq") <= 20)
        .orderBy("user_id", "seq")
    )


def top_bigrams_by_lang(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Top-k word bigrams per language by corpus count (tiebreak: count
    desc, bigram asc). Explode -> hash-agg (map-side combined) -> bounded
    per-group window rank; the rank input is already reduced to distinct
    (lang, bigram) rows, so the sort is over counts, not tokens.
    """
    from streaming_data_pipeline_spark.functions.text import all_word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    # let-bound token array (see functions/text.word_shingles) — the
    # inline element_at form re-tokenizes per gram position
    counted = (
        docs.select("lang", F.explode(all_word_ngrams(F.col("text"), 2)).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lang", "bigram", F.col("n").cast("long").alias("n"), "rank")
        .orderBy("lang", "rank")
    )


def zipf_token_rank(spark: SparkSession, sf_dir: str, k: int = 50) -> DataFrame:
    """Global token frequency head: top-k tokens with dense frequency
    rank and corpus share — the Zipf screen that spots tokenizer-hostile
    corpora (a too-heavy head means boilerplate). One explode + one
    hash-agg; the global top-k is TakeOrderedAndProject, not a total
    sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    counted = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    total = counted.agg(F.sum("n").cast("double").alias("tot"))
    # TakeOrderedAndProject top-k FIRST (distributed partial top-k per
    # partition, merged on the driver), THEN rank the k-row frame — a
    # bare global row_number() window would funnel the whole vocabulary
    # through one partition.
    top = counted.orderBy(F.desc("n"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "token",
            F.col("n").cast("long").alias("n"),
            (F.round(F.col("n") / F.col("tot"), 6) + F.lit(0.0)).alias("share"),
        )
        .orderBy("rank")
    )


def doc_length_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two length histogram of ``documents.n_chars`` per
    source. The bucket is the integer bit-length of n_chars (floor(log2)
    + 1) computed via the binary string — exact integer arithmetic, no
    libm log2 cross-engine drift. Single hash aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.length(F.bin(F.col("n_chars"))).cast("int")
    return (
        docs.groupBy("source", bucket.alias("log2_bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source", "log2_bucket")
    )


def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup END PRODUCT: one canonical survivor per near-dup
    cluster (min doc_id — content-independent and reproducible), with
    cluster size and the count of docs it displaces. Consumes the
    group-graph connected components (operators/dedup.py:539 — the
    scale-critical clustering is bucketed LSH + Pregel on group nodes);
    the survivor pick is one hash aggregate over the labels.

    A 100 TB run materializes exactly this frame as the keep-manifest
    joined back against the corpus (semi-join on doc_id).
    """
    from streaming_data_pipeline_spark.operators.dedup import (
        minhash_cluster_labels,
    )

    docs = load_table(spark, sf_dir, "documents")
    labels = minhash_cluster_labels(docs, threshold=0.8)
    return (
        labels.groupBy("cluster_id")
        .agg(
            F.min("doc_id").alias("keeper_doc"),
            F.count("*").cast("long").alias("cluster_size"),
            (F.count("*") - 1).cast("long").alias("n_removed"),
        )
        .select("cluster_id", "keeper_doc", "cluster_size", "n_removed")
        .orderBy("cluster_id")
    )


def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS slope of ``value`` over event time (is this user's
    spend trending up?). The slope comes from the closed form
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) with every sum accumulated in
    DECIMAL — exact integer-style arithmetic, order-independent, no
    regr_slope float drift across engines. x is seconds since
    2024-01-01 (constant offset keeps the decimals small); one hash
    aggregate per user, division to double only at the end.
    """
    ev = load_table(spark, sf_dir, "events")
    x = (
        F.unix_timestamp(F.col("ts").cast("timestamp"))
        - F.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    ).cast("decimal(18,0)")
    y = F.col("value").cast("decimal(18,2)")
    agg = ev.groupBy("user_id").agg(
        F.count("*").cast("decimal(18,0)").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * x).cast("decimal(38,0)")).alias("sxx"),
        F.sum((x * y).cast("decimal(38,2)")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy")).cast("decimal(38,2)") - (
        F.col("sx") * F.col("sy")
    ).cast("decimal(38,2)")
    den = (F.col("n") * F.col("sxx")).cast("decimal(38,0)") - (
        F.col("sx") * F.col("sx")
    ).cast("decimal(38,0)")
    return (
        agg.select(
            "user_id",
            F.col("n").cast("long").alias("n_events"),
            (
                F.round(
                    (num.cast("double") / den.cast("double")) * 86400.0, 8
                )
                + F.lit(0.0)
            ).alias("slope_per_day"),
        )
        # no total sort (r11): order-insensitive compare; the range
        # sampler re-ran this plan's tail once more just for bounds
    )


def value_histogram_equiwidth(spark: SparkSession, sf_dir: str, b: int = 10) -> DataFrame:
    """Equi-width histogram of ``events.value`` in b buckets between the
    observed min and max. The two-scalar min/max frame broadcasts; the
    bucket index is one IEEE expression — identical bit-for-bit in any
    engine evaluating the same (v - min) * b / range order — and the
    counting is a single hash aggregate. The max value is clamped into
    the last bucket (half-open intervals elsewhere).
    """
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    bucket = F.least(
        F.lit(b - 1),
        F.floor(
            (F.col("value") - F.col("lo")) * b / (F.col("hi") - F.col("lo"))
        ).cast("int"),
    )
    return (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.min("value"), 2).alias("bucket_min"),
            F.round(F.max("value"), 2).alias("bucket_max"),
        )
        .orderBy("bucket")
    )


def user_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (consecutive-event bigrams)
    via ``applyInPandas`` — the batch grouped-map escape hatch (SURVEY
    §2.9), completing the Arrow surface beside mapInPandas
    (multimodal), applyInPandasWithState (streaming), and the UDTF.

    The per-group logic (sort by time, shift, count adjacent pairs) is
    the kind of sequence op teams reach for pandas first; it is also
    exactly expressible with a lag window, which is what the oracle
    does — so this query doubles as an A/B proof that the escape hatch
    agrees with the JVM path. Output is all-integer (deterministic).
    Scale shape: one shuffle on user_id, Arrow-batched per-group
    Python; state is one group in memory at a time. The shuffle is an
    EXPLICIT repartition on the group key: AQE's byte-based partition
    coalescing sees a few MB and fuses the map into 2 partitions, which
    serializes the Python workers — bytes are the wrong cost model for
    a pandas stage (measured 7.1 s -> 1.9 s at sf0.1 from this alone).
    """
    import pandas as pd

    # identified timelines only: a NULL user_id is many users, not a
    # sequence, and a NULL event_type is not a transition endpoint —
    # pandas groupby would also silently drop NaN keys, so the rule is
    # made explicit here and mirrored in the oracle
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
    )

    def transitions(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts", "event_id"])
        pdf = pdf.assign(from_type=pdf["event_type"].shift(1))
        pdf = pdf.dropna(subset=["from_type"])
        out = (
            pdf.groupby(["user_id", "from_type", "event_type"])
            .size()
            .reset_index(name="n")
        )
        return out.rename(columns={"event_type": "to_type"})

    n_part = spark.sparkContext.defaultParallelism
    return (
        ev.repartition(n_part, "user_id")
        .groupBy("user_id")
        .applyInPandas(
            transitions,
            "user_id bigint, from_type string, to_type string, n bigint",
        )
        # no total sort (r11): driver compare is order-insensitive; the
        # range sampler re-ran this plan's tail once more just for bounds
    )


QUERIES = {
    "event_funnel_conversion": event_funnel_conversion,
    "retention_cohorts": retention_cohorts,
    "running_user_value": running_user_value,
    "top_bigrams_by_lang": top_bigrams_by_lang,
    "zipf_token_rank": zipf_token_rank,
    "doc_length_log_histogram": doc_length_log_histogram,
    "dedup_keep_canonical": dedup_keep_canonical,
    "user_value_trend": user_value_trend,
    "value_histogram_equiwidth": value_histogram_equiwidth,
    "user_event_transitions": user_event_transitions,
}

# single-copy DuckDB tokenizer (plans/oracle_text.py)
from streaming_data_pipeline_spark.plans.oracle_text import DUCK_TOKS as _TOKS

ORACLE = {
    "event_funnel_conversion": """
    WITH v AS (
      SELECT user_id, MIN(ts) AS view_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS click_ts
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts >= v.view_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
      GROUP BY e.user_id
    ),
    stages AS (
      SELECT '1_view' AS stage, COUNT(*) AS n FROM v
      UNION ALL SELECT '2_click', COUNT(*) FROM c
      UNION ALL SELECT '3_purchase', COUNT(*) FROM p
    )
    SELECT stage, CAST(n AS BIGINT) AS n_users,
           round(n / (SELECT CAST(COUNT(*) AS DOUBLE) FROM v), 6) + 0.0
             AS conversion
    FROM stages ORDER BY stage
    """,
    "retention_cohorts": """
    WITH cohort AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT DISTINCT e.user_id, c.cohort_week,
             CAST(date_diff('day', c.cohort_week,
                            date_trunc('week', e.ts)) / 7 AS INT)
               AS week_offset
      FROM events e JOIN cohort c USING (user_id)
    ),
    sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_size FROM cohort
      GROUP BY cohort_week
    )
    SELECT strftime(cells.cohort_week, '%Y-%m-%d') AS cohort_week, week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(ANY_VALUE(cohort_size) AS BIGINT) AS cohort_size,
           round(COUNT(*) / CAST(ANY_VALUE(cohort_size) AS DOUBLE), 6) + 0.0
             AS retention
    FROM cells JOIN sizes USING (cohort_week)
    GROUP BY cells.cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    "running_user_value": """
    WITH r AS (
      SELECT event_id, user_id,
             row_number() OVER w AS seq,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(seq AS BIGINT) AS seq, running_value
    FROM r WHERE seq <= 20 ORDER BY user_id, seq
    """,
    "top_bigrams_by_lang": f"""
    WITH t AS (SELECT lang, {_TOKS} AS toks FROM documents),
    big AS (
      SELECT lang, toks[CAST(i.i AS INT)] || ' ' ||
             toks[CAST(i.i AS INT) + 1] AS bigram
      FROM t, UNNEST(range(1, len(toks))) AS i(i)
      WHERE len(toks) >= 2
    ),
    counted AS (SELECT lang, bigram, COUNT(*) AS n FROM big GROUP BY 1, 2)
    SELECT lang, bigram, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER
            (PARTITION BY lang ORDER BY n DESC, bigram) AS rank
          FROM counted)
    WHERE rank <= 5 ORDER BY lang, rank
    """,
    "zipf_token_rank": f"""
    WITH tok AS (
      SELECT t.token FROM (
        SELECT UNNEST({_TOKS}) AS token FROM documents
      ) AS t(token)
    ),
    counted AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot FROM counted)
    SELECT CAST(rank AS BIGINT) AS rank, token, CAST(n AS BIGINT) AS n,
           round(n / tot, 6) + 0.0 AS share
    FROM (SELECT *, row_number() OVER (ORDER BY n DESC, token) AS rank
          FROM counted), tot
    WHERE rank <= 50 ORDER BY rank
    """,
    "user_event_transitions": """
    WITH seq AS (
      SELECT user_id, event_type AS to_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS from_type
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, from_type, to_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE from_type IS NOT NULL
    GROUP BY user_id, from_type, to_type
    ORDER BY user_id, from_type, to_type
    """,
    "user_value_trend": """
    WITH base AS (
      SELECT user_id,
             CAST(date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
                  AS DECIMAL(18,0)) AS x,
             CAST(value AS DECIMAL(18,2)) AS y
      FROM events
    ),
    agg AS (
      SELECT user_id,
             CAST(COUNT(*) AS DECIMAL(18,0)) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
             SUM(CAST(x * y AS DECIMAL(38,2))) AS sxy
      FROM base GROUP BY user_id
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(n AS BIGINT) AS n_events,
           round(CAST(CAST(n * sxy AS DECIMAL(38,2))
                      - CAST(sx * sy AS DECIMAL(38,2)) AS DOUBLE)
                 / CAST(CAST(n * sxx AS DECIMAL(38,0))
                        - CAST(sx * sx AS DECIMAL(38,0)) AS DOUBLE)
                 * 86400.0, 8) + 0.0 AS slope_per_day
    FROM agg ORDER BY user_id
    """,
    "value_histogram_equiwidth": """
    WITH bounds AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
    SELECT CAST(least(9, floor((value - lo) * 10 / (hi - lo))) AS INT)
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           round(MIN(value), 2) AS bucket_min,
           round(MAX(value), 2) AS bucket_max
    FROM events, bounds
    GROUP BY 1 ORDER BY bucket
    """,
    "doc_length_log_histogram": """
    SELECT source, CAST(length(bin(n_chars)) AS INT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY 1, 2 ORDER BY source, log2_bucket
    """,
}


def _clusters_sql() -> str:
    """Reuse the connected-components oracle (llm_queries) as the input
    CTE of the survivor aggregate — one source of truth for the cluster
    semantics on the oracle side, mirroring how the Spark plan reuses
    minhash_cluster_labels."""
    from streaming_data_pipeline_spark.plans.llm_queries import ORACLE as _LLM

    return _LLM["dedup_cluster_components"].rsplit("ORDER BY", 1)[0]


ORACLE["dedup_keep_canonical"] = f"""
WITH clusters AS ({_clusters_sql()})
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc,
       CAST(COUNT(*) AS BIGINT) AS cluster_size,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_removed
FROM clusters GROUP BY cluster_id ORDER BY cluster_id
"""



def hourly_dense_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification + gap fill: the raw event stream has
    hours with no traffic for a given event type; downstream dashboards
    and anomaly detectors need a DENSE series — every (type, hour) cell
    present, zero-filled counts, and the hourly average value carried
    forward from the last observed hour (LOCF).

    Shape: hash-agg to (type, hour) -> `sequence()` generates the full
    hour spectrum from the global bounds (one tiny broadcast row) ->
    explode x distinct types builds the dense scaffold -> left join the
    sparse agg -> LOCF is one `last(ignorenulls)` running-window pass
    per type. At 100 TB the scaffold is |types| x |hours| (tiny versus
    the fact table); everything heavy happens in the first map-side-
    combining aggregate, and the window state is one value per series.
    """
    ev = load_table(spark, sf_dir, "events")
    sparse = (
        ev.withColumn("hour_ts", F.date_trunc("hour", F.col("ts")))
        .groupBy("event_type", "hour_ts")
        .agg(
            F.count("*").alias("event_count"),
            int_halfup_avg_expr(
                "sum(cast(value as decimal(18,2)))", "count(*)"
            ).alias("avg_value"),
        )
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts")
    )
    scaffold = ev.select("event_type").distinct().crossJoin(F.broadcast(hours))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scaffold.join(sparse, ["event_type", "hour_ts"], "left")
        .select(
            "event_type",
            "hour_ts",
            F.coalesce("event_count", F.lit(0)).alias("event_count"),
            F.last("avg_value", ignorenulls=True).over(w).alias("avg_value_locf"),
        )
        .orderBy("event_type", "hour_ts")
    )


QUERIES["hourly_dense_locf"] = hourly_dense_locf
ORACLE["hourly_dense_locf"] = f"""
WITH sparse AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hour_ts,
         CAST(COUNT(*) AS BIGINT) AS event_count,
         {int_halfup_avg_sql("SUM(CAST(value AS DECIMAL(18,2)))", "COUNT(*)")}
           AS avg_value
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT DATE_TRUNC('hour', MIN(ts)) AS h0, DATE_TRUNC('hour', MAX(ts)) AS h1
  FROM events),
hours AS (
  SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts
  FROM bounds),
scaffold AS (
  SELECT t.event_type, h.hour_ts
  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN hours h)
SELECT s.event_type, s.hour_ts,
       COALESCE(sp.event_count, 0) AS event_count,
       LAST_VALUE(sp.avg_value IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.hour_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value_locf
FROM scaffold s
LEFT JOIN sparse sp
  ON sp.event_type = s.event_type AND sp.hour_ts = s.hour_ts
ORDER BY s.event_type, s.hour_ts
"""


def daily_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-drift monitor: total-variation distance between each day's
    event-type distribution and the previous day's — the screen a
    production pipeline runs to catch upstream mix shifts before they
    poison training data. TV distance instead of KL: TV = (1/2)
    sum_i |p_i - q_i| is a pure RATIONAL of the integer counts
    (|c_i*m - d_i*n| summed over types, over 2*n*m), so both engines
    compute it exactly — no libm log drift, no smoothing constants.
    Shape: one (day, type) hash-agg, a lag window over the tiny day
    table to pair adjacent days, a full-outer join of each pair's two
    count sets ON TYPE AS ROWS, and one sum — pure expressions end to
    end. No driver-side ``collect()`` anywhere: an earlier version
    enumerated the type domain on the driver and emitted one column
    expression per type, which made plan size grow with the data's key
    domain (fine for a 5-value enum, fatal for an open-ended one) and
    cost an extra job before the real one. The row shape is invariant
    to domain size: all joins/aggs key on the |days| x |types| table,
    which stays tiny no matter how big the fact table is.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    daily = ev.groupBy("event_date", "event_type").agg(
        F.count("*").alias("c")
    )
    w = Window.orderBy("event_date")
    days = daily.groupBy("event_date").agg(F.sum("c").alias("n"))
    pairs = days.select(
        "event_date",
        "n",
        F.lag("event_date").over(w).alias("prev_date"),
        F.lag("n").over(w).alias("m"),
    ).filter(F.col("prev_date").isNotNull())
    cur_k = pairs.join(daily, "event_date").select(
        "event_date", "n", "m", "event_type", "c"
    )
    prv_k = pairs.join(
        daily.select(
            F.col("event_date").alias("prev_date"),
            "event_type",
            F.col("c").alias("pc"),
        ),
        "prev_date",
    ).select("event_date", "n", "m", "event_type", "pc")
    # full outer on type within each day pair: types present only in
    # the current day contribute |c*m|, only in the previous day |pc*n|.
    # eqNullSafe on the type: NULL event_type is a real mix category,
    # and a plain equi-join would fail to pair the two days' NULL rows
    # (each then contributes its full count as if the other day had
    # none — overstating the drift); the oracle joins with the matching
    # IS NOT DISTINCT FROM.
    full = (
        cur_k.alias("cu")
        .join(
            prv_k.alias("pv"),
            (F.col("cu.event_date") == F.col("pv.event_date"))
            & F.col("cu.event_type").eqNullSafe(F.col("pv.event_type")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("cu.event_date"), F.col("pv.event_date")).alias(
                "event_date"
            ),
            F.coalesce(F.col("cu.n"), F.col("pv.n")).alias("n"),
            F.coalesce(F.col("cu.m"), F.col("pv.m")).alias("m"),
            F.col("cu.c").alias("c"),
            F.col("pv.pc").alias("pc"),
        )
    )
    folded = full.groupBy("event_date", "n", "m").agg(
        F.sum(
            F.abs(
                F.coalesce(F.col("c"), F.lit(0)) * F.col("m")
                - F.coalesce(F.col("pc"), F.lit(0)) * F.col("n")
            )
        ).alias("num")
    )
    return folded.select(
        F.col("event_date").cast("timestamp").alias("event_date"),
        F.col("n").cast("long").alias("day_events"),
        F.col("num").cast("long").alias("tv_numerator"),
        (2 * F.col("n") * F.col("m")).cast("long").alias("tv_denominator"),
        (
            F.round(F.col("num").cast("double") / (2 * F.col("n") * F.col("m")), 6)
            + F.lit(0.0)
        ).alias("tv_distance"),
    ).orderBy("event_date")


QUERIES["daily_distribution_drift"] = daily_distribution_drift
ORACLE["daily_distribution_drift"] = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS event_date, event_type,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
days AS (SELECT event_date, SUM(c) AS n FROM daily GROUP BY 1),
pairs AS (
  SELECT event_date, n,
         LAG(event_date) OVER (ORDER BY event_date) AS prev_date,
         LAG(n) OVER (ORDER BY event_date) AS m
  FROM days),
terms AS (
  SELECT p.event_date, p.n, p.m,
         ABS(COALESCE(cur.c, 0) * p.m - COALESCE(prv.c, 0) * p.n) AS term
  FROM pairs p
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
  LEFT JOIN daily cur
    ON cur.event_date = p.event_date
   AND cur.event_type IS NOT DISTINCT FROM t.event_type
  LEFT JOIN daily prv
    ON prv.event_date = p.prev_date
   AND prv.event_type IS NOT DISTINCT FROM t.event_type
  WHERE p.prev_date IS NOT NULL)
SELECT CAST(event_date AS TIMESTAMP) AS event_date,
       CAST(n AS BIGINT) AS day_events,
       CAST(SUM(term) AS BIGINT) AS tv_numerator,
       CAST(2 * n * m AS BIGINT) AS tv_denominator,
       ROUND(CAST(SUM(term) AS DOUBLE) / (2 * n * m), 6) + 0.0 AS tv_distance
FROM terms GROUP BY event_date, n, m
ORDER BY event_date
"""


def daily_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly monitor: flag days whose event count deviates
    more than two standard deviations from that type's daily mean. The
    2-sigma test is evaluated in PURE INTEGERS — (x*D - S)^2 > 4*(Q*D -
    S^2) with S = sum of daily counts, Q = sum of squares, D = number
    of days — so no float variance/sqrt ever enters and both engines
    agree bit-for-bit. One (type, day) hash-agg, one per-type stats
    window, one projection: the monitored table is |types| x |days|
    regardless of fact volume.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    daily = ev.groupBy("event_type", "event_date").agg(
        F.count("*").alias("x")
    )
    w = Window.partitionBy("event_type")
    # DECIMAL(38) per the file's exactness protocol: x*x and the
    # cross-multiplied 2-sigma test wrap int64 near 3e9 events/day
    # (non-ANSI wraps silently, ANSI throws); DuckDB's HUGEINT stays
    # exact, so raw longs diverge exactly at the 100 TB posture this
    # query advertises.
    dec = "decimal(38,0)"
    stats = daily.select(
        "event_type",
        "event_date",
        "x",
        F.sum("x").over(w).cast(dec).alias("s"),
        F.sum(F.col("x").cast(dec) * F.col("x")).over(w).cast(dec).alias("q"),
        F.count("*").over(w).cast(dec).alias("d"),
    )
    dev = F.col("x").cast(dec) * F.col("d") - F.col("s")
    lhs = dev * dev
    rhs = 4 * (F.col("q") * F.col("d") - F.col("s") * F.col("s"))
    return stats.select(
        "event_type",
        F.col("event_date").cast("timestamp").alias("event_date"),
        F.col("x").cast("long").alias("day_count"),
        (lhs > rhs).alias("is_anomaly"),
    ).orderBy("event_type", "event_date")


QUERIES["daily_volume_anomaly"] = daily_volume_anomaly
ORACLE["daily_volume_anomaly"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS event_date,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type, event_date, x,
         SUM(CAST(x AS HUGEINT)) OVER (PARTITION BY event_type) AS s,
         SUM(CAST(x AS HUGEINT) * x) OVER (PARTITION BY event_type) AS q,
         COUNT(*) OVER (PARTITION BY event_type) AS d
  FROM daily)
SELECT event_type, CAST(event_date AS TIMESTAMP) AS event_date,
       x AS day_count,
       (x * d - s) * (x * d - s) > 4 * (q * d - s * s) AS is_anomaly
FROM stats ORDER BY event_type, event_date
"""


def pagerank_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the event-type transition graph — graph
    analytics beyond connectivity (the CC operator family): nodes are
    event types, edge weights are counts of consecutive (prev -> next)
    transitions within each user's event sequence. Three damped power
    iterations in FIXED-POINT integer arithmetic (ranks in millionths;
    contribution = floor(rank * w / W_out), damping 0.85 as 17/20
    integer ratio) — every step is integer div/mod, so both engines
    iterate bit-identically with no float summation-order hazard. The
    oracle unrolls the same three iterations in SQL. At scale the
    iteration state is |nodes| and each step is one join + hash-agg on
    the edge list — the standard Pregel-style shape. The 1/N init and
    0.15/N teleport constants ride along as a broadcast 1-row
    aggregate (no ``nodes.count()`` driver action at plan-construction
    time), so the whole query is a single declarative job.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("next_type").alias("dst"))
        .agg(F.count("*").alias("weight"))
    )
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("w_out"))
    e = edges.join(out_w, "src")
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    # 1-row frame carrying N; broadcast-cross-joined so 1/N and 0.15/N
    # fold into the plan without a driver-side count() action
    nn = nodes.agg(F.count("*").cast("long").alias("n_nodes"))
    rank = nodes.crossJoin(F.broadcast(nn)).select(
        "node", "n_nodes", F.expr("1000000 div n_nodes").cast("long").alias("rank")
    )
    for _ in range(3):
        contrib = (
            e.join(rank.select("node", "rank"), e.src == F.col("node"))
            .select(
                "dst",
                F.expr("(rank * weight) div w_out").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        rank = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib, F.col("node") == contrib.dst, "left")
            .select(
                "node",
                "n_nodes",
                (
                    F.expr("150000 div n_nodes")
                    + F.expr("(17 * coalesce(inflow, 0L)) div 20")
                ).cast("long").alias("rank"),
            )
        )
    return rank.select("node", "rank").orderBy("node")


QUERIES["pagerank_event_transitions"] = pagerank_event_transitions
ORACLE["pagerank_event_transitions"] = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events),
edges AS (
  SELECT event_type AS src, next_type AS dst, CAST(COUNT(*) AS BIGINT) AS weight
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
outw AS (SELECT src, SUM(weight) AS w_out FROM edges GROUP BY src),
e AS (SELECT edges.*, outw.w_out FROM edges JOIN outw USING (src)),
nodes AS (SELECT DISTINCT event_type AS node FROM events),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, CAST(1000000 // n AS BIGINT) AS rank FROM nodes, nn),
r1 AS (
  SELECT n.node,
         CAST((SELECT 150000 // n FROM nn)
              + (17 * COALESCE(SUM((r.rank * e.weight) // e.w_out), 0)) // 20
           AS BIGINT) AS rank
  FROM nodes n LEFT JOIN e ON e.dst = n.node LEFT JOIN r0 r ON r.node = e.src
  GROUP BY n.node),
r2 AS (
  SELECT n.node,
         CAST((SELECT 150000 // n FROM nn)
              + (17 * COALESCE(SUM((r.rank * e.weight) // e.w_out), 0)) // 20
           AS BIGINT) AS rank
  FROM nodes n LEFT JOIN e ON e.dst = n.node LEFT JOIN r1 r ON r.node = e.src
  GROUP BY n.node),
r3 AS (
  SELECT n.node,
         CAST((SELECT 150000 // n FROM nn)
              + (17 * COALESCE(SUM((r.rank * e.weight) // e.w_out), 0)) // 20
           AS BIGINT) AS rank
  FROM nodes n LEFT JOIN e ON e.dst = n.node LEFT JOIN r2 r ON r.node = e.src
  GROUP BY n.node)
SELECT node, rank FROM r3 ORDER BY node
"""


def ab_test_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation analytics: users hash-split 50/50 into arms A/B
    (deterministic md5 bucket — the same assignment everywhere), outcome
    = whether the user ever purchased; the 2x2 contingency table is
    tested with the chi-square statistic evaluated EXACTLY — chi2 =
    N*(ad-bc)^2 / (row1*row2*col1*col2) is a pure rational of the
    counts, so the 95% significance comparison chi2 > 3.841 becomes an
    integer cross-multiplication with no libm, identical in both
    engines. Every product is evaluated in DECIMAL(38,0) — operands
    cast BEFORE any multiplication, so nothing ever passes through
    64-bit wraparound arithmetic; exact to ~1e7 users per cell, and
    past that Spark yields NULL (never a silently wrapped answer)
    while the HUGEINT oracle stays exact to ~1e9. The fixture's hash split
    carries no real effect, so `significant` is robustly FALSE — a
    well-randomized A/A-style check, which is itself the standard
    sanity screen an experimentation platform runs.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.col("event_type") == "purchase").alias("converted")
    )
    arms = per_user.withColumn(
        "arm",
        F.when(
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
            .cast("long")
            % 2
            == 0,
            "A",
        ).otherwise("B"),
    )
    cells = arms.groupBy("arm").agg(
        F.sum(F.when(F.col("converted"), 1).otherwise(0)).cast("long").alias("conv"),
        F.sum(F.when(F.col("converted"), 0).otherwise(1)).cast("long").alias("nonconv"),
    )
    wide = cells.groupBy().pivot("arm", ["A", "B"]).agg(
        F.first("conv").alias("conv"), F.first("nonconv").alias("non")
    )
    a, b = F.col("A_conv"), F.col("A_non")
    c, d = F.col("B_conv"), F.col("B_non")
    return wide.select(
        a.alias("a_conv"), b.alias("a_non"),
        c.alias("b_conv"), d.alias("b_non"),
        chi_square_significant_95(a, b, c, d).alias("significant_95"),
    )


def chi_square_significant_95(a, b, c, d):
    """chi2(a,b,c,d) > 3.841 as an exact integer cross-multiplication.

    All arithmetic in DECIMAL(38,0) from the first multiplication: the
    raw LongType product n*(ad-bc)^2*1000 would silently wrap in
    non-ANSI Spark once counts reach ~1e5 per cell (while DuckDB's
    BIGINT errors), diverging exactly when the statistic gets large.
    Decimal keeps the comparison exact to ~1e7 users per cell; beyond
    that Spark yields NULL (never a wrapped wrong answer).
    """
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    n = dec(a) + dec(b) + dec(c) + dec(d)
    diff = dec(a) * dec(d) - dec(b) * dec(c)
    lhs = n * diff * diff * F.lit(1000).cast("decimal(38,0)")
    rhs = (F.lit(3841).cast("decimal(38,0)")
           * ((dec(a) + dec(b)) * (dec(c) + dec(d)))
           * ((dec(a) + dec(c)) * (dec(b) + dec(d))))
    return lhs > rhs


QUERIES["ab_test_chi_square"] = ab_test_chi_square
ORACLE["ab_test_chi_square"] = """
WITH per_user AS (
  SELECT user_id, MAX(event_type = 'purchase') AS converted
  FROM events GROUP BY user_id),
arms AS (
  SELECT *, CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)
                           AS BIGINT) % 2 = 0
                 THEN 'A' ELSE 'B' END AS arm
  FROM per_user),
cells AS (
  SELECT arm,
         SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS conv,
         SUM(CASE WHEN converted THEN 0 ELSE 1 END) AS nonconv
  FROM arms GROUP BY arm),
wide AS (
  SELECT
    MAX(CASE WHEN arm = 'A' THEN conv END) AS a,
    MAX(CASE WHEN arm = 'A' THEN nonconv END) AS b,
    MAX(CASE WHEN arm = 'B' THEN conv END) AS c,
    MAX(CASE WHEN arm = 'B' THEN nonconv END) AS d
  FROM cells)
SELECT CAST(a AS BIGINT) AS a_conv, CAST(b AS BIGINT) AS a_non,
       CAST(c AS BIGINT) AS b_conv, CAST(d AS BIGINT) AS b_non,
       CAST(a + b + c + d AS HUGEINT)
         * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
         * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c) * 1000
         > 3841 * (CAST(a + b AS HUGEINT) * (c + d))
                * (CAST(a + c AS HUGEINT) * (b + d))
         AS significant_95
FROM wide
"""


def range_join_binned_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINNED RANGE JOIN — the technique for joining events to time
    INTERVALS when BOTH sides are too big to broadcast: a naive
    `ts BETWEEN start AND end` join has no equality key, so Spark
    falls back to a cartesian (BroadcastNestedLoop) plan that dies at
    scale. Binning restores an equality key: each interval explodes to
    the fixed-width time bins it covers (sequence()), each event maps
    to its single bin (date_trunc), the join runs on `bin` as a plain
    hash-shuffle join, and the exact containment predicate rides along
    as a join filter. Join size = |events| + |intervals x bins/interval|
    shuffled by bin — linear, skew-safe for bounded interval lengths.
    An event's single bin matches at most one exploded row per
    interval, so no post-join dedup is needed.

    Fixture semantics: two deterministic "incident windows" per day
    (03:17-05:43 and 14:00-15:30); the query reports per-incident
    event pressure. The oracle joins by raw containment — binning must
    change nothing."""
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    days = ev.select(F.col("ts").cast("date").alias("d")).distinct()
    iv = days.select(
        "d",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("idx"),
                    (F.col("d").cast("timestamp") + F.expr("INTERVAL '3:17' HOUR TO MINUTE")).alias("start"),
                    (F.col("d").cast("timestamp") + F.expr("INTERVAL '5:43' HOUR TO MINUTE")).alias("end"),
                ),
                F.struct(
                    F.lit(1).alias("idx"),
                    (F.col("d").cast("timestamp") + F.expr("INTERVAL '14:00' HOUR TO MINUTE")).alias("start"),
                    (F.col("d").cast("timestamp") + F.expr("INTERVAL '15:30' HOUR TO MINUTE")).alias("end"),
                ),
            )
        ).alias("w"),
    ).select("d", "w.idx", "w.start", "w.end")
    iv_binned = iv.select(
        "d",
        "idx",
        "start",
        "end",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("start")),
                F.date_trunc("hour", F.col("end")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bin"),
    )
    ev_binned = ev.withColumn("bin", F.date_trunc("hour", F.col("ts")))
    joined = ev_binned.join(iv_binned, "bin").filter(
        (F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end"))
    )
    return (
        joined.groupBy("d", "idx")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("d").cast("timestamp").alias("incident_date"),
            F.col("idx").cast("long").alias("incident_idx"),
            "n_events",
            "value_sum",
        )
        .orderBy("incident_date", "incident_idx")
    )


QUERIES["range_join_binned_incidents"] = range_join_binned_incidents
ORACLE["range_join_binned_incidents"] = """
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
iv AS (
  SELECT d, 0 AS idx,
         CAST(d AS TIMESTAMP) + INTERVAL 197 MINUTE AS s,
         CAST(d AS TIMESTAMP) + INTERVAL 343 MINUTE AS e
  FROM days
  UNION ALL
  SELECT d, 1,
         CAST(d AS TIMESTAMP) + INTERVAL 840 MINUTE,
         CAST(d AS TIMESTAMP) + INTERVAL 930 MINUTE
  FROM days)
SELECT CAST(iv.d AS TIMESTAMP) AS incident_date,
       CAST(iv.idx AS BIGINT) AS incident_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ev.value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM iv JOIN events ev ON ev.ts >= iv.s AND ev.ts < iv.e
GROUP BY iv.d, iv.idx ORDER BY incident_date, incident_idx
"""


def graph_triangle_counts(spark: SparkSession, sf_dir: str, k: int = 15) -> DataFrame:
    """Distributed triangle counting over the token co-occurrence graph
    (graph analytics beside `pagerank_event_transitions` /
    `dedup_cluster_components` — reference anchor: the event-graph
    analytics family of SURVEY §2.5/§2.12).

    Graph: nodes are lowercased tokens, undirected edges between
    adjacent tokens (bigrams) seen >= 3 times corpus-wide — the
    collocation graph; triangles are 3-cliques of mutually co-occurring
    terms (phrase templates / boilerplate cliques).

    Algorithm is the standard DEGREE-ORIENTED distributed count: orient
    every edge from the (degree, token)-smaller endpoint to the larger,
    build wedges by joining oriented edges on their source, and close
    each wedge with a semi-join back to the oriented edge set. Each
    triangle is counted exactly once (its unique minimum-order apex),
    and every join key is a token — no global rank, no single-partition
    window, wedge fan-out bounded by the oriented out-degree, which the
    orientation caps at O(sqrt(|E|)) for any degree distribution. This
    is THE shape that survives Zipf-skewed vocabularies at 100 TB; the
    naive triple self-join explodes on the stopword hub nodes.

    Output: top-k tokens by triangle participation (tie: token asc)
    with their degree. The oracle recomputes triangles by the naive
    lexicographic triple join — same triangle set, different algorithm,
    so the row is an algebraic cross-check of the orientation trick.
    """
    from streaming_data_pipeline_spark.plans.base import (
        plan_cached,
        release_plan_caches,
    )

    release_plan_caches()
    docs = load_table(spark, sf_dir, "documents")
    from streaming_data_pipeline_spark.functions.text import all_word_ngrams

    pair = F.split(F.col("bg"), " ")
    # edges is referenced five times downstream (deg twice via the
    # union, the two orientation joins, the wedge closer) — without the
    # cache each reference re-runs the full bigram explode + count
    # aggregate (the plan carried 50 Exchanges); cached, the explode
    # runs once and every branch reads the collapsed edge list.
    edges = plan_cached(
        docs.select(
            F.explode(all_word_ngrams(F.lower(F.col("text")), 2)).alias("bg")
        )
        .select(pair.getItem(0).alias("a"), pair.getItem(1).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .groupBy("u", "v")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 3)
        .select("u", "v")
    )
    deg = plan_cached(
        edges.select(F.col("u").alias("t"))
        .unionAll(edges.select(F.col("v").alias("t")))
        .groupBy("t")
        .agg(F.count("*").alias("deg"))
    )
    # Orient each edge from (deg, token)-min to (deg, token)-max; carry
    # the destination's order key so wedge endpoints can be ordered
    # without a global node ranking.
    # e feeds three branches (both wedge sides + the closer): cache the
    # oriented edge list too, so orientation runs once.
    e = plan_cached(
        edges.join(deg.withColumnRenamed("t", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("t", "v").withColumnRenamed("deg", "dv"), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(
                    F.col("u").alias("src"),
                    F.col("v").alias("dst"),
                    F.col("dv").alias("ddeg"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("v").alias("src"),
                    F.col("u").alias("dst"),
                    F.col("du").alias("ddeg"),
                )
            )
            .alias("o")
        )
        .select("o.src", "o.dst", "o.ddeg")
    )
    e1 = e.select(
        F.col("src"), F.col("dst").alias("y"), F.col("ddeg").alias("ydeg")
    )
    e2 = e.select(
        F.col("src"), F.col("dst").alias("z"), F.col("ddeg").alias("zdeg")
    )
    wedges = e1.join(e2, "src").filter(
        (F.col("ydeg") < F.col("zdeg"))
        | ((F.col("ydeg") == F.col("zdeg")) & (F.col("y") < F.col("z")))
    )
    closer = e.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    tris = wedges.join(closer, ["y", "z"]).select(
        F.col("src").alias("x"), "y", "z"
    )
    per_node = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("n_triangles"))
    )
    top = (
        per_node.join(deg, "t")
        .orderBy(F.desc("n_triangles"), F.asc("t"))
        .limit(k)
    )
    return top.select(
        F.col("t").alias("token"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
        F.col("deg").cast("long").alias("degree"),
    ).orderBy(F.desc("n_triangles"), F.asc("token"))


def value_histogram_equidepth(spark: SparkSession, sf_dir: str, b: int = 8) -> DataFrame:
    """EXACT equi-depth (equal-height) histogram of ``events.value`` in
    b bins — the partner of `value_histogram_equiwidth` and the layout
    primitive behind range partitioning and quantile-binned features.

    Scale-safe exact construction WITHOUT a global row_number: rows are
    ranked through their DISTINCT value's cumulative count (one hash
    agg to distinct values, one window over the distinct-value frame —
    cardinality |V| << |rows| for any real metric column), then each
    value's rank interval [cum-cnt+1, cum] is intersected with each
    bin's rank interval (ceil(b*N/B)+1 .. ceil((b+1)*N/B) — the exact
    ntile bounds) via a range join against the tiny 8-row bin frame.
    Ties are split across bins deterministically by the interval
    arithmetic itself — no per-row ordering, no single-partition
    exchange on the fact table, bin counts exactly N/B +- 1.
    """
    # NULL values are not observations (canonical stats rule; they
    # also sort to opposite ends of the rank window in the two engines)
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vals = ev.groupBy("value").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    ranked = vals.select(
        "value",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
    ).select(
        "value",
        "cnt",
        (F.col("cum") - F.col("cnt") + 1).alias("lo"),
        F.col("cum").alias("hi"),
    )
    total = ev.agg(F.count("*").alias("n"))
    bins = spark.range(b).select(F.col("id").alias("bin")).crossJoin(
        F.broadcast(total)
    ).select(
        "bin",
        # exact integer ceil-division (LongType `div`, never IEEE `/`)
        (F.expr(f"(bin * n + {b - 1}) div {b}") + 1).alias("blo"),
        F.expr(f"((bin + 1) * n + {b - 1}) div {b}").alias("bhi"),
    )
    joined = ranked.join(
        F.broadcast(bins),
        (F.col("lo") <= F.col("bhi")) & (F.col("hi") >= F.col("blo")),
    )
    overlap = F.least("hi", "bhi") - F.greatest("lo", "blo") + 1
    return (
        joined.groupBy("bin")
        .agg(
            F.sum(overlap).cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_distinct_values"),
            F.round(F.min("value"), 2).alias("value_min"),
            F.round(F.max("value"), 2).alias("value_max"),
        )
        .select(F.col("bin").cast("long").alias("bin"), "n_rows", "n_distinct_values", "value_min", "value_max")
        .orderBy("bin")
    )


QUERIES["graph_triangle_counts"] = graph_triangle_counts
ORACLE["graph_triangle_counts"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents),
bi AS (
  SELECT t[x.i] AS a, t[x.i + 1] AS b
  FROM toks, LATERAL unnest(range(1, len(t))) x(i)),
und AS (
  SELECT least(a, b) AS u, greatest(a, b) AS v
  FROM bi WHERE a <> b
  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
corners AS (
  SELECT x AS t FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri),
deg AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT u AS t FROM und UNION ALL SELECT v FROM und)
  GROUP BY t)
SELECT c.t AS token, CAST(COUNT(*) AS BIGINT) AS n_triangles, any_value(d.degree) AS degree
FROM corners c JOIN deg d ON d.t = c.t
GROUP BY c.t
ORDER BY n_triangles DESC, token ASC
LIMIT 15
"""

ORACLE["value_histogram_equidepth"] = """
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events
           WHERE value IS NOT NULL),
vals AS (
  SELECT value, CAST(COUNT(*) AS BIGINT) AS cnt FROM events
  WHERE value IS NOT NULL GROUP BY value),
ranked AS (
  SELECT value, cnt,
         SUM(cnt) OVER (ORDER BY value) - cnt + 1 AS lo,
         SUM(cnt) OVER (ORDER BY value) AS hi
  FROM vals),
bins AS (
  SELECT b.bin, ((b.bin * n.n + 7) // 8) + 1 AS blo,
         ((b.bin + 1) * n.n + 7) // 8 AS bhi
  FROM (SELECT unnest(range(8)) AS bin) b, n)
SELECT CAST(bins.bin AS BIGINT) AS bin,
       CAST(SUM(least(hi, bhi) - greatest(lo, blo) + 1) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_values,
       round(MIN(value), 2) AS value_min,
       round(MAX(value), 2) AS value_max
FROM ranked JOIN bins ON lo <= bhi AND hi >= blo
GROUP BY bins.bin ORDER BY bin
"""
QUERIES["value_histogram_equidepth"] = value_histogram_equidepth


def max_concurrent_shipments(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Peak interval concurrency: the k dates with the most lineitems
    simultaneously open (order placed, not yet shipped — the interval
    [o_orderdate, l_shipdate] inclusive) — the classic +1/-1
    boundary-sweep on intervals, the scalable alternative to an
    interval self-join for "max concurrent sessions" questions.

    Shape: a broadcast-able FK join attaches the order date; each
    interval then emits two delta rows (+1 at open, -1 the day AFTER
    close); one hash-agg collapses deltas per date; a running sum over
    date order turns deltas into concurrency. The only ordered stage
    runs on the per-DATE aggregate — the calendar domain (~2.5k dates,
    bounded regardless of row count) — so at 100 TB the wide work is
    the join plus one map-side-combined agg keyed by date, and the
    window is over a provably tiny frame. Final top-k by (concurrency
    desc, date) is a sort of that same tiny frame.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    spans = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # the synthetic fixture doesn't enforce the TPC-H order<=ship
        # invariant; the interval is only defined for valid spans
        .filter(F.col("o_orderdate") <= F.col("l_shipdate"))
        .select("o_orderdate", "l_shipdate")
    )
    deltas = spans.select(
        F.col("o_orderdate").cast("date").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(
            F.date_add(F.col("l_shipdate").cast("date"), 1).alias("d"),
            F.lit(-1).alias("delta"),
        )
    )
    per_day = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    conc = per_day.withColumn("in_transit", F.sum("net").over(w))
    ww = Window.orderBy(F.desc("in_transit"), F.asc("d"))
    return (
        conc.orderBy(F.desc("in_transit"), F.asc("d"))
        .limit(k)
        .withColumn("rank", F.row_number().over(ww))
        .select(
            F.col("rank").cast("long").alias("rank"),
            F.col("d").cast("timestamp_ntz").alias("peak_date"),
            F.col("in_transit").cast("long").alias("in_transit"),
        )
        .orderBy("rank")
    )


QUERIES["max_concurrent_shipments"] = max_concurrent_shipments
ORACLE["max_concurrent_shipments"] = """
WITH spans AS (
  SELECT o.o_orderdate, l.l_shipdate
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate <= l.l_shipdate),
deltas AS (
  SELECT o_orderdate AS d, 1 AS delta FROM spans
  UNION ALL
  SELECT l_shipdate + INTERVAL 1 DAY, -1 FROM spans),
per_day AS (SELECT CAST(d AS DATE) AS d, SUM(delta) AS net FROM deltas GROUP BY 1),
conc AS (
  SELECT d, SUM(net) OVER (ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS in_transit
  FROM per_day),
top AS (SELECT * FROM conc ORDER BY in_transit DESC, d LIMIT 10)
SELECT CAST(row_number() OVER (ORDER BY in_transit DESC, d) AS BIGINT) AS rank,
       CAST(d AS TIMESTAMP) AS peak_date,
       CAST(in_transit AS BIGINT) AS in_transit
FROM top ORDER BY rank
"""


def k_core_peel_rounds(spark: SparkSession, sf_dir: str, k: int = 3, rounds: int = 4) -> DataFrame:
    """k-core decomposition by iterative peeling over the token
    collocation graph (same edge set as `graph_triangle_counts`):
    each round removes nodes with degree < k and the edges touching
    them; the output is the (round, nodes, edges) trajectory — the
    standard connectivity-density screen for boilerplate clique mining.

    Fixed ``rounds`` unrolled iterations, fully declarative (the same
    loop discipline as `bpe_train_merges` / `kmeans_lloyd_iterations`):
    per round one degree hash-agg + two semi-joins, each keyed on a
    token — no global ordering anywhere, survives Zipf vocabularies.
    `localCheckpoint` between rounds keeps lineage linear. Honest
    bound: this reports the trajectory of the FIRST ``rounds`` peels
    (the fixpoint may need more rounds on other graphs; the trajectory
    makes convergence — or its absence — visible instead of assuming
    it).
    """
    docs = load_table(spark, sf_dir, "documents")
    from streaming_data_pipeline_spark.functions.text import all_word_ngrams

    pair = F.split(F.col("bg"), " ")
    edges = (
        docs.select(
            F.explode(all_word_ngrams(F.lower(F.col("text")), 2)).alias("bg")
        )
        .select(pair.getItem(0).alias("a"), pair.getItem(1).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 3)
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    outs = []
    for rnd in range(1, rounds + 1):
        deg = (
            edges.select(F.col("u").alias("n"))
            .unionByName(edges.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("n")
        edges = (
            edges.join(keep.withColumnRenamed("n", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("n", "v"), "v", "left_semi")
            .select("u", "v")
            # the surviving edge set only shrinks; fewer partitions cut
            # the per-round checkpoint + shuffle task overhead (the
            # count is collocation-graph-sized, not corpus-sized)
            .coalesce(8)
            .localCheckpoint(eager=True)
        )
        # No checkpoint on the per-round stats: each references the
        # round's ALREADY-checkpointed edge set, so deferring them to
        # the final union costs four tiny one-row aggs in ONE job
        # instead of four extra eager-checkpoint jobs (r11 — the
        # per-job fixed overhead was the dominant cost of this query
        # at small SF, and at scale four fewer driver round-trips).
        stats = (
            edges.select(F.col("u").alias("n"))
            .unionByName(edges.select(F.col("v").alias("n")))
            .agg(
                F.lit(rnd).cast("long").alias("round"),
                F.countDistinct("n").cast("long").alias("nodes"),
                (F.count("*") / 2).cast("long").alias("edges"),
            )
        )
        outs.append(stats)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("round")


def _sql_kcore_oracle(k: int = 3, rounds: int = 4) -> str:
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each
    # round references the previous one several times, so inlining
    # re-evaluates the whole chain exponentially (observed OOM at
    # sf0.1); materialization makes the oracle linear in rounds
    ctes = [
        "bg AS MATERIALIZED (SELECT toks[CAST(i.i AS INT)] AS a, toks[CAST(i.i AS INT)+1] AS b "
        "FROM (SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks "
        "FROM documents) t, UNNEST(range(1, len(toks))) AS i(i) WHERE len(toks) >= 2)",
        "e0 AS MATERIALIZED (SELECT least(a,b) AS u, greatest(a,b) AS v FROM bg WHERE a <> b "
        "GROUP BY 1,2 HAVING COUNT(*) >= 3)",
    ]
    finals = []
    for r in range(1, rounds + 1):
        p = f"e{r-1}"
        ctes.append(
            f"d{r} AS MATERIALIZED (SELECT n, COUNT(*) AS d FROM "
            f"(SELECT u AS n FROM {p} UNION ALL SELECT v FROM {p}) GROUP BY n)"
        )
        ctes.append(
            f"e{r} AS MATERIALIZED (SELECT u, v FROM {p} "
            f"WHERE u IN (SELECT n FROM d{r} WHERE d >= {k}) "
            f"AND v IN (SELECT n FROM d{r} WHERE d >= {k}))"
        )
        finals.append(
            f"SELECT CAST({r} AS BIGINT) AS round, "
            f"CAST(COUNT(DISTINCT n) AS BIGINT) AS nodes, "
            f"CAST(COUNT(*) / 2 AS BIGINT) AS edges FROM "
            f"(SELECT u AS n FROM e{r} UNION ALL SELECT v FROM e{r})"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(finals) + "\nORDER BY round"


QUERIES["k_core_peel_rounds"] = k_core_peel_rounds
ORACLE["k_core_peel_rounds"] = _sql_kcore_oracle(3, 4)


def ewma_user_value(spark: SparkSession, sf_dir: str, span: int = 16) -> DataFrame:
    """Per-user exponentially weighted moving average of event value
    (alpha = 1/2) over each user's last ``span`` events — the
    recency-weighted engagement score. Integer-exact cross-engine:
    weights are powers of two (2^(span-rn)), values are cents, and the
    final average is one integer division; no float accumulation at
    all.

    Shape: one per-user window ranks events newest-first
    (WindowGroupLimit-bounded to ``span`` rows of state per user),
    then a hash-agg folds weight*cents. Both stages key on user_id —
    embarrassingly parallel at 100 TB.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    recent = ev.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= span
    )
    return (
        recent.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.expr(
                f"sum(cents * shiftleft(1L, {span} - rn))"
                f" div sum(shiftleft(1L, {span} - rn))"
            )
            .cast("long")
            .alias("ewma_cents"),
        )
        .orderBy("user_id")
    )


QUERIES["ewma_user_value"] = ewma_user_value
ORACLE["ewma_user_value"] = """
WITH ranked AS (
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events),
recent AS (SELECT * FROM ranked WHERE rn <= 16)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents * (CAST(1 AS BIGINT) << (16 - rn)))
            // SUM(CAST(1 AS BIGINT) << (16 - rn)) AS BIGINT) AS ewma_cents
FROM recent GROUP BY user_id ORDER BY user_id
"""


def cumulative_unique_users_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-user growth curve: per day, new users (first
    seen that day) and the running total of users ever seen — the
    audience-growth chart every events product tracks.

    Scalable distinct-over-time shape: count-distinct-to-date is NOT
    computed as a windowed COUNT(DISTINCT) (quadratic re-scan); each
    user collapses to one (user, first_day) row via min-agg, a hash-agg
    counts first-appearances per day, and a running sum over the
    BOUNDED calendar domain turns news into cumulative totals. Two
    map-side-combined aggs + one tiny-frame window.
    """
    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d")
    )
    per_day = first_day.groupBy("d").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.col("d").cast("timestamp_ntz").alias("day"),
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    ).orderBy("day")


QUERIES["cumulative_unique_users_by_day"] = cumulative_unique_users_by_day
ORACLE["cumulative_unique_users_by_day"] = """
WITH first_day AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id),
per_day AS (SELECT d, COUNT(*) AS new_users FROM first_day GROUP BY d)
SELECT CAST(d AS TIMESTAMP) AS day,
       CAST(new_users AS BIGINT) AS new_users,
       CAST(SUM(new_users) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM per_day ORDER BY day
"""


def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: every purchase is credited to the
    event type that OPENED its session (>30-min gap sessionization,
    same boundaries as `sessionize_events_batch`), answering "which
    entry activity leads to purchases". Output per entry type:
    sessions opened, sessions converting, purchases, attributed cents.

    Shape: the two session-window passes reuse one (user_id, ts,
    event_id) sort; first_value rides the same window; the rollup is a
    single hash-agg. Nothing global — every stage keys on user_id then
    entry type.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # MICROSECOND epos, not truncated seconds: a long cast floors the
    # sub-second part while DuckDB's epoch() keeps it fractional, so a
    # true gap in (1800, 1801) s could open a session in one engine and
    # not the other. unix_micros/epoch_us is the integer-exact protocol
    # interarrival_gap_stats already uses.
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    numbered = ev.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    tagged = numbered.withColumn(
        "entry_type", F.first("event_type").over(ws)
    ).withColumn(
        "cents",
        F.when(
            F.col("event_type") == "purchase",
            (F.col("value").cast("decimal(18,2)") * 100).cast("long"),
        ).otherwise(F.lit(0)),
    )
    per_session = tagged.groupBy("user_id", "session_id", "entry_type").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "purchases"
        ),
        F.sum("cents").alias("cents"),
    )
    return (
        per_session.groupBy("entry_type")
        .agg(
            F.count("*").cast("long").alias("sessions"),
            F.sum(F.when(F.col("purchases") > 0, 1).otherwise(0))
            .cast("long")
            .alias("converting_sessions"),
            F.sum("purchases").cast("long").alias("purchases"),
            F.sum("cents").cast("long").alias("attributed_cents"),
        )
        .orderBy("entry_type")
    )


QUERIES["first_touch_attribution"] = first_touch_attribution
ORACLE["first_touch_attribution"] = """
WITH ordered AS (
  SELECT user_id, event_id, event_type, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) > 1800 * 1000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
numbered AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered),
tagged AS (
  SELECT *,
         first_value(event_type) OVER (PARTITION BY user_id, session_id
             ORDER BY ts, event_id) AS entry_type,
         CASE WHEN event_type = 'purchase'
              THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              ELSE 0 END AS cents
  FROM numbered),
per_session AS (
  SELECT user_id, session_id, entry_type,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS purchases,
         SUM(cents) AS cents
  FROM tagged GROUP BY 1, 2, 3)
SELECT entry_type,
       CAST(COUNT(*) AS BIGINT) AS sessions,
       CAST(SUM(CASE WHEN purchases > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS converting_sessions,
       CAST(SUM(purchases) AS BIGINT) AS purchases,
       CAST(SUM(cents) AS BIGINT) AS attributed_cents
FROM per_session GROUP BY entry_type ORDER BY entry_type
"""


def pmi_collocations(spark: SparkSession, sf_dir: str, k: int = 20, min_c: int = 5) -> DataFrame:
    """Top-k collocations by pointwise mutual information: bigrams
    whose joint frequency beats the independence prediction, the
    classic phrase-mining statistic (Church & Hanks 1990 — public).
    PMI's monotone core N*c12/(c1*c2) is computed as an exact
    integer ppm score (`c12*N*1e6 div (c1*c2)`) so the ranking is
    bit-identical cross-engine — no log, no doubles.

    Shape: one bigram explode + three hash-aggs (bigram, left unigram,
    right unigram — all from the same exploded frame), two narrow
    joins keyed on the unigram, TakeOrderedAndProject top-k. A min
    joint count floor keeps the rare-pair PMI blowup out.
    """
    from streaming_data_pipeline_spark.functions.text import all_word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    big = docs.select(
        F.explode(all_word_ngrams(F.lower(F.col("text")), 2)).alias("bg")
    ).select(
        F.expr("split_part(bg, ' ', 1)").alias("w1"),
        F.expr("split_part(bg, ' ', 2)").alias("w2"),
    )
    c12 = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = big.groupBy("w1").agg(F.count("*").alias("c1"))
    c2 = big.groupBy("w2").agg(F.count("*").alias("c2"))
    n = big.agg(F.count("*").alias("n"))
    scored = (
        c12.filter(F.col("c12") >= min_c)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.expr(
                "cast(c12 as decimal(38,0)) * n * 1000000"
                " div (cast(c1 as decimal(38,0)) * c2)"
            ).alias("pmi_ppm"),
        )
    )
    from pyspark.sql import Window

    top = scored.orderBy(F.desc("pmi_ppm"), "w1", "w2").limit(k)
    w = Window.orderBy(F.desc("pmi_ppm"), "w1", "w2")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "w1", "w2", "c12", F.col("pmi_ppm").cast("long"))
        # no final re-sort (r11): rank already labels the order
    )


QUERIES["pmi_collocations"] = pmi_collocations
ORACLE["pmi_collocations"] = f"""
WITH t AS (SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
           FROM documents),
big AS (
  SELECT toks[CAST(i.i AS INT)] AS w1, toks[CAST(i.i AS INT) + 1] AS w2
  FROM t, UNNEST(range(1, len(toks))) AS i(i)
  WHERE len(toks) >= 2),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY 1),
c2 AS (SELECT w2, COUNT(*) AS c2 FROM big GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM big),
scored AS (
  SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
         CAST(c12 AS HUGEINT) * n * 1000000
           // (CAST(c1 AS HUGEINT) * c2) AS pmi_ppm
  FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), n
  WHERE c12 >= 5),
top AS (SELECT * FROM scored ORDER BY pmi_ppm DESC, w1, w2 LIMIT 20)
SELECT CAST(row_number() OVER (ORDER BY pmi_ppm DESC, w1, w2) AS BIGINT)
         AS rank,
       w1, w2, c12, CAST(pmi_ppm AS BIGINT) AS pmi_ppm
FROM top ORDER BY rank
"""


def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized order-price statistics: clip o_totalprice at the
    exact p05/p95 empirical percentiles, then report per-priority
    counts, clip tallies, and the clipped integer-cents mean — the
    robust-mean pattern that keeps a fat tail from dominating a
    metric.

    Exact percentiles WITHOUT a global row sort: the same
    distinct-value cumulative-rank trick as the equi-depth histogram —
    one hash-agg to (cents, count), a running sum over the distinct
    VALUE frame, and the percentile is the least value whose
    cumulative rank reaches ceil(q*n). Clipping is then a broadcast
    join of two scalars; everything else is one hash-agg.
    """
    from pyspark.sql import Window

    # NULL prices are not observations (canonical stats rule: rank/
    # percentile operators exclude NULL measurements — they would also
    # sort to opposite ends of the cumulative-rank window in the two
    # engines); the oracle applies the identical predicate
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select(
            "o_orderpriority",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
    )
    per_v = orders.groupBy("cents").agg(F.count("*").alias("c"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.withColumn("cum", F.sum("c").over(w))
    n = orders.agg(F.count("*").alias("n"))
    cuts = (
        cum.crossJoin(F.broadcast(n))
        .select(
            "cents",
            "cum",
            F.expr("cast(ceil(n * 0.05) as long)").alias("lo_rank"),
            F.expr("cast(ceil(n * 0.95) as long)").alias("hi_rank"),
        )
        .agg(
            F.min(F.when(F.col("cum") >= F.col("lo_rank"), F.col("cents"))).alias(
                "p05"
            ),
            F.min(F.when(F.col("cum") >= F.col("hi_rank"), F.col("cents"))).alias(
                "p95"
            ),
        )
    )
    clipped = orders.crossJoin(F.broadcast(cuts)).select(
        "o_orderpriority",
        F.greatest(F.least(F.col("cents"), F.col("p95")), F.col("p05")).alias(
            "w_cents"
        ),
        (F.col("cents") < F.col("p05")).cast("int").alias("lo"),
        (F.col("cents") > F.col("p95")).cast("int").alias("hi"),
    )
    return (
        clipped.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("lo").cast("long").alias("clipped_low"),
            F.sum("hi").cast("long").alias("clipped_high"),
            F.expr("sum(w_cents) div count(*)").cast("long").alias(
                "winsorized_mean_cents"
            ),
        )
        .orderBy("o_orderpriority")
    )


QUERIES["winsorized_price_stats"] = winsorized_price_stats
ORACLE["winsorized_price_stats"] = """
WITH o AS (
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders WHERE o_totalprice IS NOT NULL),
per_v AS (SELECT cents, COUNT(*) AS c FROM o GROUP BY cents),
cum AS (
  SELECT cents, SUM(c) OVER (ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM per_v),
n AS (SELECT COUNT(*) AS n FROM o),
cuts AS (
  SELECT MIN(CASE WHEN cum >= CAST(ceil(n * 0.05) AS BIGINT)
             THEN cents END) AS p05,
         MIN(CASE WHEN cum >= CAST(ceil(n * 0.95) AS BIGINT)
             THEN cents END) AS p95
  FROM cum, n),
clipped AS (
  SELECT o_orderpriority,
         greatest(least(cents, p95), p05) AS w_cents,
         CASE WHEN cents < p05 THEN 1 ELSE 0 END AS lo,
         CASE WHEN cents > p95 THEN 1 ELSE 0 END AS hi
  FROM o, cuts)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(lo) AS BIGINT) AS clipped_low,
       CAST(SUM(hi) AS BIGINT) AS clipped_high,
       CAST(SUM(w_cents) // COUNT(*) AS BIGINT) AS winsorized_mean_cents
FROM clipped GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def basket_lift_pairs(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Market-basket lift between event types: treating each user's
    distinct event types as a basket, rank type pairs by lift =
    P(A,B)/(P(A)P(B)) — the co-occurrence statistic behind
    "users who X also Y". Exact integer ppm core `c_ab*n*1e6 div
    (c_a*c_b)` (same determinism trick as `pmi_collocations`, but
    set-valued per-user baskets instead of adjacent tokens).

    Shape: one distinct (user, type) collapse, a per-user self-join
    whose fan-out is bounded by the TYPE DOMAIN squared (never by
    events), two margin hash-aggs, TakeOrderedAndProject top-k.
    """
    # baskets belong to identified users with identified items: NULL
    # user_id has no basket (and COUNT(DISTINCT user_id) would skip it
    # anyway), NULL event_type is not an item
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    ut = ev.select("user_id", "event_type").distinct()
    n = ut.select("user_id").distinct().agg(F.count("*").alias("n"))
    margins = ut.groupBy("event_type").agg(F.count("*").alias("c"))
    pairs = (
        ut.alias("a")
        .join(ut.alias("b"), "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("c_ab"))
    )
    scored = (
        pairs.join(
            margins.select(
                F.col("event_type").alias("type_a"), F.col("c").alias("c_a")
            ),
            "type_a",
        )
        .join(
            margins.select(
                F.col("event_type").alias("type_b"), F.col("c").alias("c_b")
            ),
            "type_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.expr(
                "cast(c_ab as decimal(38,0)) * n * 1000000"
                " div (cast(c_a as decimal(38,0)) * c_b)"
            ).cast("long").alias(
                "lift_ppm"
            ),
        )
    )
    from pyspark.sql import Window

    top = scored.orderBy(F.desc("lift_ppm"), "type_a", "type_b").limit(k)
    w = Window.orderBy(F.desc("lift_ppm"), "type_a", "type_b")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "type_a", "type_b", "c_ab", "lift_ppm")
        .orderBy("rank")
    )


QUERIES["basket_lift_pairs"] = basket_lift_pairs
ORACLE["basket_lift_pairs"] = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events
            WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
n AS (SELECT COUNT(DISTINCT user_id) AS n FROM ut),
margins AS (SELECT event_type, COUNT(*) AS c FROM ut GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS c_ab
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2),
scored AS (
  SELECT type_a, type_b, CAST(c_ab AS BIGINT) AS c_ab,
         CAST(c_ab AS HUGEINT) * n * 1000000
           // (CAST(ma.c AS HUGEINT) * mb.c) AS lift_ppm
  FROM pairs
  JOIN margins ma ON ma.event_type = type_a
  JOIN margins mb ON mb.event_type = type_b, n),
top AS (SELECT * FROM scored ORDER BY lift_ppm DESC, type_a, type_b LIMIT 10)
SELECT CAST(row_number() OVER (ORDER BY lift_ppm DESC, type_a, type_b)
            AS BIGINT) AS rank,
       type_a, type_b, c_ab, CAST(lift_ppm AS BIGINT) AS lift_ppm
FROM top ORDER BY rank
"""


def interarrival_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival statistics: exact median and p95 of
    the per-user gap (seconds between a user's consecutive events of
    that type) — the cadence profile that sizes session timeouts and
    rate alarms.

    Gaps come from one lag() over the per-(user, type) ordering; the
    exact percentiles reuse the distinct-value cumulative-rank trick
    per TYPE (window partitioned by type over the distinct-gap frame,
    bounded by the gap-value domain) — no global row sort, no
    percentile_approx.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("epoch"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("epoch", "event_id")
    gaps = (
        ev.withColumn("gap", F.col("epoch") - F.lag("epoch").over(w))
        .filter(F.col("gap").isNotNull())
        .select("event_type", "gap")
    )
    per_v = gaps.groupBy("event_type", "gap").agg(F.count("*").alias("c"))
    wv = Window.partitionBy("event_type").orderBy("gap").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_v.withColumn("cum", F.sum("c").over(wv))
    n = gaps.groupBy("event_type").agg(F.count("*").alias("n"))
    return (
        cum.join(n, "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("n").cast("long").alias("n_gaps"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("cast(ceil(n * 0.5) as long)"),
                    F.col("gap"),
                )
            ).cast("long").alias("median_gap_us"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("cast(ceil(n * 0.95) as long)"),
                    F.col("gap"),
                )
            ).cast("long").alias("p95_gap_us"),
        )
        # no total sort (r11): driver compare is order-insensitive; the
        # range sampler re-ran this plan's tail once more just for bounds
    )


QUERIES["interarrival_gap_stats"] = interarrival_gap_stats
ORACLE["interarrival_gap_stats"] = """
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ep
  FROM events),
gaps AS (
  SELECT event_type,
         ep - lag(ep) OVER (PARTITION BY user_id, event_type
                            ORDER BY ep, event_id) AS gap
  FROM ev),
g AS (SELECT event_type, CAST(gap AS BIGINT) AS gap FROM gaps
      WHERE gap IS NOT NULL),
per_v AS (SELECT event_type, gap, COUNT(*) AS c FROM g GROUP BY 1, 2),
cum AS (
  SELECT event_type, gap,
         SUM(c) OVER (PARTITION BY event_type ORDER BY gap
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM per_v),
n AS (SELECT event_type, COUNT(*) AS n FROM g GROUP BY 1)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_gaps,
       CAST(MIN(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT)
                THEN gap END) AS BIGINT) AS median_gap_us,
       CAST(MIN(CASE WHEN cum >= CAST(ceil(n * 0.95) AS BIGINT)
                THEN gap END) AS BIGINT) AS p95_gap_us
FROM cum JOIN n USING (event_type)
GROUP BY event_type ORDER BY event_type
"""


def seasonal_residual_anomaly(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Seasonal-naive anomaly screen: each (date, hour) cell's event
    count vs the SAME HOUR one day earlier, ranked by absolute
    deviation ppm — the hour-of-day-aware twin of
    `daily_volume_anomaly` (daily totals miss intra-day shape shifts;
    the seasonal-naive baseline is the standard first differencer for
    strongly periodic series).

    One hash-agg to the (date, hour) grid (bounded by the calendar
    domain), a 1-day self-join on the grid, integer ppm deviation
    `|cur - prev| * 1e6 div prev`, TakeOrderedAndProject top-k.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("d"),
        F.hour(F.col("ts").cast("timestamp")).alias("h"),
    )
    grid = ev.groupBy("d", "h").agg(F.count("*").alias("c"))
    prev = grid.select(
        F.date_add("d", 1).alias("d"), "h", F.col("c").alias("c_prev")
    )
    scored = grid.join(prev, ["d", "h"]).select(
        F.col("d").cast("timestamp_ntz").alias("day"),
        F.col("h").cast("long").alias("hour"),
        F.col("c").cast("long").alias("n_events"),
        F.col("c_prev").cast("long").alias("n_prev"),
        F.expr("abs(c - c_prev) * 1000000 div c_prev").cast("long").alias(
            "deviation_ppm"
        ),
    )
    from pyspark.sql import Window

    top = scored.orderBy(F.desc("deviation_ppm"), "day", "hour").limit(k)
    w = Window.orderBy(F.desc("deviation_ppm"), "day", "hour")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "day", "hour", "n_events", "n_prev", "deviation_ppm")
        .orderBy("rank")
    )


QUERIES["seasonal_residual_anomaly"] = seasonal_residual_anomaly
ORACLE["seasonal_residual_anomaly"] = """
WITH grid AS (
  SELECT CAST(ts AS DATE) AS d, EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS h,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2),
scored AS (
  SELECT CAST(g.d AS TIMESTAMP) AS day, CAST(g.h AS BIGINT) AS hour,
         CAST(g.c AS BIGINT) AS n_events,
         CAST(p.c AS BIGINT) AS n_prev,
         abs(g.c - p.c) * 1000000 // p.c AS deviation_ppm
  FROM grid g JOIN grid p ON p.d = g.d - INTERVAL 1 DAY AND p.h = g.h),
top AS (SELECT * FROM scored
        ORDER BY deviation_ppm DESC, day, hour LIMIT 10)
SELECT CAST(row_number() OVER (ORDER BY deviation_ppm DESC, day, hour)
            AS BIGINT) AS rank,
       day, hour, n_events, n_prev,
       CAST(deviation_ppm AS BIGINT) AS deviation_ppm
FROM top ORDER BY rank
"""


def top_event_paths(spark: SparkSession, sf_dir: str, k: int = 15) -> DataFrame:
    """Path mining: the most frequent length-3 event-type sequences
    users actually walk (two lead() hops over each user's timeline) —
    the Sankey-diagram feed that extends pairwise
    `user_event_transitions` to real multi-step journeys.

    One per-user window sort shared by both lead() columns, one
    hash-agg on the path string, TakeOrderedAndProject top-k.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select(
            "user_id",
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        # all three steps must be observed: an unknown (NULL) type is
        # not a path step — and the engines disagree on rendering it
        # (concat_ws skips NULLs, SQL || nulls the whole string)
        .filter(
            F.col("e1").isNotNull()
            & F.col("e2").isNotNull()
            & F.col("e3").isNotNull()
        )
        .select(
            F.concat_ws(" > ", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
    )
    top = paths.orderBy(F.desc("n"), "path").limit(k)
    ww = Window.orderBy(F.desc("n"), "path")
    return (
        top.withColumn("rank", F.row_number().over(ww))
        .select("rank", "path", F.col("n").cast("long").alias("n"))
        .orderBy("rank")
    )


QUERIES["top_event_paths"] = top_event_paths
ORACLE["top_event_paths"] = """
WITH seq AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e3
  FROM events),
paths AS (
  SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path, COUNT(*) AS n
  FROM seq
  WHERE e1 IS NOT NULL AND e2 IS NOT NULL AND e3 IS NOT NULL
  GROUP BY 1),
top AS (SELECT * FROM paths ORDER BY n DESC, path LIMIT 15)
SELECT CAST(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS rank,
       path, CAST(n AS BIGINT) AS n
FROM top ORDER BY rank
"""


def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test statistic over the monthly revenue
    series (public nonparametric trend test: Mann 1945 / Kendall) —
    S = sum over month pairs i<j of sign(x_j - x_i), with the
    concordant/discordant/tied tallies. Pure integer arithmetic on
    cents, so the verdict is exact.

    Shape: one hash-agg folds the fact table to the BOUNDED monthly
    frame; the pair comparison is a self-join of that tiny frame with
    O(months^2) rows — the right trade at any fact-table scale because
    the series length is calendar-bounded, never row-bounded.
    """
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("timestamp"))
        .cast("timestamp_ntz")
        .alias("m")
    ).agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .alias("cents")
    )
    pairs = (
        monthly.alias("a")
        .join(monthly.alias("b"), F.col("a.m") < F.col("b.m"))
        .select(
            F.signum(
                (F.col("b.cents") - F.col("a.cents")).cast("double")
            ).cast("long").alias("sgn")
        )
    )
    return pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("sgn").cast("long").alias("s_statistic"),
        F.sum(F.when(F.col("sgn") > 0, 1).otherwise(0)).cast("long").alias(
            "concordant"
        ),
        F.sum(F.when(F.col("sgn") < 0, 1).otherwise(0)).cast("long").alias(
            "discordant"
        ),
        F.sum(F.when(F.col("sgn") == 0, 1).otherwise(0)).cast("long").alias(
            "tied"
        ),
    )


QUERIES["mann_kendall_trend"] = mann_kendall_trend
ORACLE["mann_kendall_trend"] = """
WITH monthly AS (
  SELECT date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS m,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS cents
  FROM orders GROUP BY 1),
pairs AS (
  SELECT CASE WHEN b.cents > a.cents THEN 1
              WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sgn
  FROM monthly a JOIN monthly b ON a.m < b.m)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(sgn) AS BIGINT) AS s_statistic,
       CAST(SUM(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
       CAST(SUM(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
       CAST(SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tied
FROM pairs
"""


def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of customer revenue concentration as an
    integer rational: with customers sorted by (revenue, custkey) and
    1-based rank i, G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)).
    Emitted as (numerator, denominator, ppm) so the oracle compare is
    exact — no float division anywhere.

    The rank window runs over the AGGREGATED customer frame (one row
    per customer after the first hash-agg), which is the standard
    concentration-curve shape: the fact table is never sorted, only
    the |customers| summary. Deterministic ties by custkey.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .alias("cents")
    )
    w = Window.orderBy("cents", "o_custkey")
    ranked = per_cust.withColumn("i", F.row_number().over(w))
    return ranked.agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        (
            2 * F.sum(F.col("i") * F.col("cents"))
            - (F.count("*") + 1) * F.sum("cents")
        ).cast("long").alias("gini_num"),
        (F.count("*") * F.sum("cents")).cast("long").alias("gini_den"),
        F.expr(
            "cast((cast(2 * sum(i * cents) - (count(*) + 1) * sum(cents)"
            " as decimal(38,0)) * 1000000)"
            " div (cast(count(*) as decimal(38,0)) * sum(cents)) as long)"
        ).alias("gini_ppm"),
    )


QUERIES["revenue_gini"] = revenue_gini
ORACLE["revenue_gini"] = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS cents
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_custkey) AS i
  FROM per_cust)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(2 * SUM(i * cents) - (COUNT(*) + 1) * SUM(cents) AS BIGINT)
         AS gini_num,
       CAST(COUNT(*) * SUM(cents) AS BIGINT) AS gini_den,
       CAST((CAST(2 * SUM(i * cents) - (COUNT(*) + 1) * SUM(cents)
                  AS HUGEINT) * 1000000)
            // (CAST(COUNT(*) AS HUGEINT) * SUM(cents)) AS BIGINT) AS gini_ppm
FROM ranked
"""


def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer revenue at decile resolution: for each
    decile of customers (poorest first), the exact cumulative revenue
    share in ppm — the plot behind `revenue_gini`, and the table a
    concentration dashboard renders.

    Same scalable shape as the Gini: rank over the AGGREGATED customer
    frame only; decile assignment is integer arithmetic on the rank
    (ceil(10*i/n)), shares are integer ppm of total cents.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .alias("cents")
    )
    w = Window.orderBy("cents", "o_custkey")
    ranked = per_cust.withColumn("i", F.row_number().over(w))
    tot = per_cust.agg(
        F.sum("cents").alias("tot"), F.count("*").alias("n")
    )
    deciled = ranked.crossJoin(F.broadcast(tot)).select(
        F.expr("cast(ceil(10 * i / n) as long)").alias("decile"),
        "cents",
        "tot",
    )
    per_dec = deciled.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("decile_cents"),
        F.any_value("tot").alias("tot"),
    )
    wd = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_dec.withColumn("cum_cents", F.sum("decile_cents").over(wd))
        .select(
            "decile",
            "n_customers",
            "decile_cents",
            F.expr(
                "cast(cast(cum_cents as decimal(38,0)) * 1000000 div tot as long)"
            ).alias(
                "cum_share_ppm"
            ),
        )
        .orderBy("decile")
    )


QUERIES["lorenz_curve_deciles"] = lorenz_curve_deciles
ORACLE["lorenz_curve_deciles"] = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS cents
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) AS i
  FROM per_cust),
tot AS (SELECT SUM(cents) AS tot, COUNT(*) AS n FROM per_cust),
per_dec AS (
  SELECT CAST(ceil(10.0 * i / n) AS BIGINT) AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS decile_cents
  FROM ranked, tot GROUP BY 1)
SELECT decile, n_customers, decile_cents,
       CAST(SUM(decile_cents) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000
            // (SELECT tot FROM tot) AS BIGINT) AS cum_share_ppm
FROM per_dec ORDER BY decile
"""


def theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend slope over monthly revenue (public
    estimator: Theil 1950 / Sen 1968): the MEDIAN of all pairwise
    slopes (cents per month), immune to the outlier months that wreck
    least squares. Pairs with `mann_kendall_trend` (that test's
    significance, this estimator's magnitude).

    Exact cross-engine protocol: each slope is the rational
    (dc = cents_j - cents_i, dm = months apart); ranking uses the
    DOUBLE quotient of those exact integers (identical in both
    engines) with (dc, dm) as the deterministic tie-break, and the
    median is reported as the exact integer pair plus a ppm quotient —
    no float ever reaches the verified value columns except the
    reproducible division. The pair frame is months^2-bounded (the
    fact table folds first), so the rank window is tiny at any scale.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("timestamp")).alias("m")
    ).agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .alias("cents")
    )
    idx = monthly.select(
        (
            F.year("m") * 12 + F.month("m")
        ).cast("long").alias("mi"),
        "cents",
    )
    slopes = (
        idx.alias("a")
        .join(idx.alias("b"), F.col("a.mi") < F.col("b.mi"))
        .select(
            (F.col("b.cents") - F.col("a.cents")).alias("dc"),
            (F.col("b.mi") - F.col("a.mi")).alias("dm"),
        )
        .withColumn("q", F.col("dc").cast("double") / F.col("dm").cast("double"))
    )
    w = Window.orderBy("q", "dc", "dm")
    n = slopes.agg(F.count("*").alias("n"))
    med = (
        slopes.withColumn("r", F.row_number().over(w))
        .crossJoin(F.broadcast(n))
        .filter(F.col("r") == F.expr("(n + 1) div 2"))
    )
    return med.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.col("dc").cast("long").alias("slope_num_cents"),
        F.col("dm").cast("long").alias("slope_den_months"),
        F.expr("dc * 1000000 div dm").cast("long").alias("slope_ppm"),
    )


QUERIES["theil_sen_slope"] = theil_sen_slope
ORACLE["theil_sen_slope"] = """
WITH monthly AS (
  SELECT date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS m,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS cents
  FROM orders GROUP BY 1),
idx AS (
  SELECT CAST(EXTRACT(year FROM m) * 12 + EXTRACT(month FROM m) AS BIGINT)
           AS mi, cents
  FROM monthly),
slopes AS (
  SELECT b.cents - a.cents AS dc, b.mi - a.mi AS dm,
         CAST(b.cents - a.cents AS DOUBLE) / (b.mi - a.mi) AS q
  FROM idx a JOIN idx b ON a.mi < b.mi),
n AS (SELECT COUNT(*) AS n FROM slopes),
ranked AS (
  SELECT dc, dm, row_number() OVER (ORDER BY q, dc, dm) AS r FROM slopes)
SELECT CAST(n AS BIGINT) AS n_pairs,
       CAST(dc AS BIGINT) AS slope_num_cents,
       CAST(dm AS BIGINT) AS slope_den_months,
       CAST(dc * 1000000 // dm AS BIGINT) AS slope_ppm
FROM ranked, n WHERE r = (n + 1) // 2
"""


def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between purchase and
    view event-value distributions — D = max |ECDF_a - ECDF_b|, the
    standard distribution-shift detector between segments. Reported as
    the exact rational: D_num = max |c_a*n_b - c_b*n_a|, D_den =
    n_a*n_b, plus the value where the maximum gap occurs and a ppm
    quotient — no float comparison anywhere.

    Shape: both ECDFs ride ONE distinct-value frame (full-outer merge
    of per-value counts, two running sums over the bounded
    distinct-cents domain), and the argmax is a lexicographic
    struct-max. The fact table is touched once per group; everything
    ordered runs on the distinct-value frame.
    """
    from pyspark.sql import Window

    # NULL values are not observations (canonical stats rule; they
    # would also sort to opposite window ends in the two engines)
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
    )
    a = ev.filter(F.col("event_type") == "purchase")
    b = ev.filter(F.col("event_type") == "view")
    ca = a.groupBy("cents").agg(F.count("*").alias("ca"))
    cb = b.groupBy("cents").agg(F.count("*").alias("cb"))
    merged = (
        ca.join(cb, "cents", "full_outer")
        .select(
            "cents",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "cents",
        F.sum("ca").over(w).alias("fa"),
        F.sum("cb").over(w).alias("fb"),
    )
    na = a.agg(F.count("*").alias("na"))
    nb = b.agg(F.count("*").alias("nb"))
    # fa*nb in DECIMAL(38): the cumulative counts scale with the fact
    # table, so the raw long product wraps past ~3e9 rows per side
    # (DuckDB's SUM already promotes to HUGEINT — raw longs here would
    # diverge engines exactly at scale).
    scored = cum.crossJoin(F.broadcast(na)).crossJoin(F.broadcast(nb)).select(
        "na",
        "nb",
        F.struct(
            F.abs(
                F.col("fa").cast("decimal(38,0)") * F.col("nb")
                - F.col("fb").cast("decimal(38,0)") * F.col("na")
            ).alias("gap"),
            (-F.col("cents")).alias("nc"),
        ).alias("st"),
    )
    return (
        scored.groupBy("na", "nb")
        .agg(F.max("st").alias("m"))
        .select(
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            F.col("m.gap").cast("long").alias("d_num"),
            (F.col("na") * F.col("nb")).cast("long").alias("d_den"),
            (-F.col("m.nc")).cast("long").alias("at_cents"),
            F.expr(
                "cast(cast(m.gap as decimal(38,0)) * 1000000"
                " div (cast(na as decimal(38,0)) * nb) as long)"
            ).alias("d_ppm"),
        )
    )


QUERIES["ks_two_sample"] = ks_two_sample
ORACLE["ks_two_sample"] = """
WITH ev AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
  WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL),
ca AS (SELECT cents, COUNT(*) AS ca FROM ev
       WHERE event_type = 'purchase' GROUP BY cents),
cb AS (SELECT cents, COUNT(*) AS cb FROM ev
       WHERE event_type = 'view' GROUP BY cents),
merged AS (
  SELECT COALESCE(ca.cents, cb.cents) AS cents,
         COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
  FROM ca FULL OUTER JOIN cb ON ca.cents = cb.cents),
cum AS (
  SELECT cents,
         SUM(ca) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fa,
         SUM(cb) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fb
  FROM merged),
n AS (SELECT
        (SELECT COUNT(*) FROM ev WHERE event_type = 'purchase') AS na,
        (SELECT COUNT(*) FROM ev WHERE event_type = 'view') AS nb),
scored AS (
  SELECT abs(fa * nb - fb * na) AS gap, cents, na, nb FROM cum, n),
best AS (
  SELECT gap, cents, na, nb,
         row_number() OVER (ORDER BY gap DESC, cents ASC) AS r
  FROM scored)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(gap AS BIGINT) AS d_num,
       CAST(na * nb AS BIGINT) AS d_den,
       CAST(cents AS BIGINT) AS at_cents,
       CAST((CAST(gap AS HUGEINT) * 1000000)
            // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS d_ppm
FROM best WHERE r = 1
"""


# Poisson(1) inverse-CDF thresholds (cumulative probabilities), written
# as literals so both engines compare the SAME doubles; weights capped
# at 6 (P(>6) ~ 1e-4 — the cap is part of the documented estimator).
_POIS_CUM = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
]


def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str, b_count: int = 100) -> DataFrame:
    """Distributed bootstrap 90% CI for the mean order price via the
    POISSON bootstrap (the resampling scheme that works in one pass on
    sharded data — each row draws an independent Poisson(1) replication
    count per resample, no global multinomial needed; public method,
    e.g. Chamandy et al., "Estimating Uncertainty for Massively
    Parallel Algorithms", Google 2012).

    Determinism: the per-(row, resample) uniform is the 13-hex md5
    fraction (bit-exact in both engines), weights come from comparing
    that double against literal Poisson CDF thresholds, resample means
    are integer cents divisions, and the CI bounds are exact rank
    statistics over the B-row mean frame. Shape: repartition the BASE
    rows, then the B-way explode — any operator that multiplies rows
    must redistribute, and redistributing before the explode is B
    times cheaper than after (the small parquet scan is one split;
    exploding first ran the amplified md5/weight work in a single
    task, 28 s of the whole bench) — then one map-side-combining
    hash-agg per resample and one tiny rank window; the amplified
    rows never cross the wire. The 90% CI rank cutoffs are derived
    from ``b_count`` (ceil(0.05 B) / ceil(0.95 B)), not hard-coded.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias(
            "cents"
        ),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot:"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("o_orderkey").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        / F.lit(float(16**13))
    )
    # The CASE ladder references u once per Poisson threshold; keep it
    # against a MATERIALIZED u column (withColumn below), not the inlined
    # md5/conv tree — codegen subexpression elimination does not collapse
    # the 7 copies (measured 5.0 s -> 1.3 s for the weight stage).
    w_expr = F.lit(6)
    for k in range(len(_POIS_CUM) - 1, -1, -1):
        w_expr = F.when(F.col("u") < F.lit(_POIS_CUM[k]), F.lit(k)).otherwise(w_expr)
    lo_rank = -(-5 * b_count // 100)   # ceil(0.05 * B)
    hi_rank = -(-95 * b_count // 100)  # ceil(0.95 * B)
    # Redistribute the BASE rows BEFORE the B-way explode: the small
    # parquet scan is one split, so exploding first would run the whole
    # amplified md5/weight compute in a single task (or pay a B-times
    # larger shuffle to spread it). Shuffling the un-amplified frame is
    # B-times cheaper and the per-resample hash-agg then combines
    # map-side, so the amplified rows never cross the wire.
    sampled = (
        spread_small_scan(orders, "o_orderkey")
        .select(
            "o_orderkey",
            "cents",
            F.explode(F.expr(f"sequence(1, {b_count})")).alias("b"),
        )
        .withColumn("u", u)
        .withColumn("w", w_expr)
    )
    means = sampled.groupBy("b").agg(
        F.expr("sum(w * cents) div sum(w)").alias("mean_cents")
    )
    wr = Window.orderBy("mean_cents", "b")
    ranked = means.withColumn("r", F.row_number().over(wr))
    point = orders.agg(F.expr("sum(cents) div count(*)").alias("point"))
    return (
        ranked.crossJoin(F.broadcast(point))
        .agg(
            F.count("*").cast("long").alias("n_resamples"),
            F.any_value("point").cast("long").alias("point_mean_cents"),
            F.min(F.when(F.col("r") == lo_rank, F.col("mean_cents")))
            .cast("long")
            .alias("ci_lo_cents"),
            F.min(F.when(F.col("r") == hi_rank, F.col("mean_cents")))
            .cast("long")
            .alias("ci_hi_cents"),
        )
    )


QUERIES["poisson_bootstrap_ci"] = poisson_bootstrap_ci
_POIS_W_SQL = "CASE " + " ".join(
    f"WHEN u < {c} THEN {k}" for k, c in enumerate(_POIS_CUM)
) + " ELSE 6 END"
ORACLE["poisson_bootstrap_ci"] = f"""
WITH o AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders),
sampled AS (
  SELECT o_orderkey, cents, CAST(g.b AS BIGINT) AS b,
         (CAST('0x' || substring(md5('boot:' || CAST(g.b AS VARCHAR) || ':'
               || CAST(o_orderkey AS VARCHAR)), 1, 13) AS BIGINT))
           / 4503599627370496.0 AS u
  FROM o, UNNEST(range(1, 101)) AS g(b)),
weighted AS (SELECT b, cents, {_POIS_W_SQL} AS w FROM sampled),
means AS (
  SELECT b, SUM(w * cents) // SUM(w) AS mean_cents
  FROM weighted GROUP BY b),
ranked AS (
  SELECT mean_cents, row_number() OVER (ORDER BY mean_cents, b) AS r
  FROM means),
point AS (SELECT SUM(cents) // COUNT(*) AS point FROM o)
SELECT CAST((SELECT COUNT(*) FROM means) AS BIGINT) AS n_resamples,
       CAST(point AS BIGINT) AS point_mean_cents,
       CAST((SELECT mean_cents FROM ranked WHERE r = 5) AS BIGINT)
         AS ci_lo_cents,
       CAST((SELECT mean_cents FROM ranked WHERE r = 95) AS BIGINT)
         AS ci_hi_cents
FROM point
"""


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point estimate over daily order revenue (public
    method: Page 1954 / the cumulative-deviation form): the day t
    maximizing |C_t| where C_t = sum_{i<=t} x_i - t*mean — the
    single-shift detector every metrics pipeline runs before alerting
    on a level change.

    Exact integers throughout: the deviation is cross-multiplied to
    C_num_t = n*cumsum_t - t*total (no rational mean materialized),
    the argmax is a lexicographic struct-max with the day as
    deterministic tie-break, and the statistic ships as the exact
    (numerator, denominator=n) pair plus the located day. One hash-agg
    folds the fact table to the bounded daily frame; the running sum
    and argmax run there.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias(
            "cents"
        ),
    )
    daily = orders.groupBy("d").agg(F.sum("cents").alias("x"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.orderBy("d")
    cum = daily.select(
        "d",
        F.sum("x").over(w).alias("cs"),
        F.row_number().over(wt).alias("t"),
    )
    tot = daily.agg(
        F.sum("x").alias("total"), F.count("*").alias("n")
    )
    scored = cum.crossJoin(F.broadcast(tot)).select(
        "n",
        F.struct(
            F.abs(
                F.col("n").cast("decimal(38,0)") * F.col("cs")
                - F.col("t").cast("decimal(38,0)") * F.col("total")
            ).alias("c_abs"),
            F.col("d").cast("timestamp_ntz").alias("nd"),
        ).alias("st"),
    )
    best = scored.groupBy("n").agg(F.max("st").alias("m"))
    return best.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("m.nd").alias("changepoint_day"),
        F.col("m.c_abs").cast("decimal(38,0)").cast("string").alias("c_num"),
        F.col("n").cast("long").alias("c_den_days"),
    )


QUERIES["cusum_changepoint"] = cusum_changepoint
ORACLE["cusum_changepoint"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS x
  FROM orders GROUP BY 1),
cum AS (
  SELECT d,
         SUM(x) OVER (ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
         row_number() OVER (ORDER BY d) AS t
  FROM daily),
tot AS (SELECT SUM(x) AS total, COUNT(*) AS n FROM daily),
scored AS (
  SELECT n, d, abs(CAST(n AS HUGEINT) * cs - CAST(t AS HUGEINT) * total)
           AS c_abs
  FROM cum, tot),
best AS (
  SELECT n, d, c_abs,
         row_number() OVER (ORDER BY c_abs DESC, d DESC) AS r
  FROM scored)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(d AS TIMESTAMP) AS changepoint_day,
       CAST(c_abs AS VARCHAR) AS c_num,
       CAST(n AS BIGINT) AS c_den_days
FROM best WHERE r = 1
"""


def permutation_test_mean_diff(spark: SparkSession, sf_dir: str, b_count: int = 100) -> DataFrame:
    """Randomization test for the purchase-vs-view mean value gap
    (public method: Fisher's permutation test, binomial-assignment
    variant — each row is independently relabeled with the empirical
    group probability per resample, the one-pass approximation that
    parallelizes like the Poisson bootstrap). p = fraction of
    relabelings whose |mean diff| reaches the observed one.

    Everything is exact: the relabel condition u < na/(na+nb) is the
    integer comparison k*(na+nb) < na*2^52 on the md5 hash integer k
    (no float ever decides a label), per-resample diffs are integer
    rationals (num = sa*nb' - sb*na', den = na'*nb'), and
    "more extreme" is the cross-multiplied DECIMAL(38) comparison
    |num_b|*den_obs >= |num_obs|*den_b. Shape: one B-way explode +
    one hash-agg per resample + a tiny final fold.
    """
    # NULL values are not observations (canonical stats rule, same as
    # the KS/MWU frames — a NULL cents row would shift na/nb but add
    # nothing to the sums, i.e. silently bias every mean)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
        & F.col("value").isNotNull()
    ).select(
        "event_id",
        (F.col("event_type") == "purchase").alias("is_a"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    obs = ev.agg(
        F.sum(F.when(F.col("is_a"), F.col("cents"))).alias("sa"),
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(~F.col("is_a"), F.col("cents"))).alias("sb"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("nb"),
    ).select(
        "na",
        "nb",
        (
            F.col("sa").cast("decimal(38,0)") * F.col("nb")
            - F.col("sb").cast("decimal(38,0)") * F.col("na")
        ).alias("obs_num"),
        (F.col("na").cast("decimal(38,0)") * F.col("nb")).alias("obs_den"),
    )
    k = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("perm:"),
                    F.col("b").cast("string"),
                    F.lit(":"),
                    F.col("event_id").cast("string"),
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    # Same repartition-before-amplification rule as poisson_bootstrap_ci:
    # the small scan is one split, so exploding first would run the md5
    # relabeling single-task; shuffling the base rows is B-times cheaper.
    perm = (
        spread_small_scan(ev, "event_id")
        .select(
            "event_id", "cents", F.explode(F.expr(f"sequence(1, {b_count})")).alias("b")
        )
        .crossJoin(F.broadcast(obs.select("na", "nb")))
        .withColumn(
            "to_a",
            k.cast("decimal(38,0)") * (F.col("na") + F.col("nb"))
            < F.col("na").cast("decimal(38,0)") * F.lit(2**52),
        )
    )
    per_b = perm.groupBy("b").agg(
        F.sum(F.when(F.col("to_a"), F.col("cents"))).alias("sa"),
        F.sum(F.when(F.col("to_a"), 1).otherwise(0)).alias("na2"),
        F.sum(F.when(~F.col("to_a"), F.col("cents"))).alias("sb"),
        F.sum(F.when(~F.col("to_a"), 1).otherwise(0)).alias("nb2"),
    ).filter((F.col("na2") > 0) & (F.col("nb2") > 0))
    scored = per_b.crossJoin(F.broadcast(obs)).select(
        "obs_num",
        "obs_den",
        (
            F.abs(
                F.col("sa").cast("decimal(38,0)") * F.col("nb2")
                - F.col("sb").cast("decimal(38,0)") * F.col("na2")
            ) * F.col("obs_den")
            >= F.abs(F.col("obs_num"))
            * (F.col("na2").cast("decimal(38,0)") * F.col("nb2"))
        ).cast("int").alias("extreme"),
    )
    return scored.groupBy("obs_num", "obs_den").agg(
        F.count("*").cast("long").alias("n_perms"),
        F.sum("extreme").cast("long").alias("n_more_extreme"),
        F.expr("sum(extreme) * 1000000 div count(*)").cast("long").alias("p_ppm"),
    ).select(
        F.col("obs_num").cast("string").alias("obs_num"),
        F.col("obs_den").cast("string").alias("obs_den"),
        "n_perms",
        "n_more_extreme",
        "p_ppm",
    )


QUERIES["permutation_test_mean_diff"] = permutation_test_mean_diff
ORACLE["permutation_test_mean_diff"] = """
WITH ev AS (
  SELECT event_id, event_type = 'purchase' AS is_a,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
  WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL),
obs AS (
  SELECT SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS na,
         SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS nb,
         CAST(SUM(CASE WHEN is_a THEN cents END) AS HUGEINT)
           * SUM(CASE WHEN is_a THEN 0 ELSE 1 END)
         - CAST(SUM(CASE WHEN is_a THEN 0 ELSE cents END) AS HUGEINT)
           * SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS obs_num,
         CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS HUGEINT)
           * SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS obs_den
  FROM ev),
perm AS (
  SELECT g.b, cents,
         CAST(CAST('0x' || substring(md5('perm:' || CAST(g.b AS VARCHAR)
              || ':' || CAST(event_id AS VARCHAR)), 1, 13) AS BIGINT)
              AS HUGEINT) * (obs.na + obs.nb)
           < CAST(obs.na AS HUGEINT) * 4503599627370496 AS to_a
  FROM ev, UNNEST(range(1, 101)) AS g(b), obs),
per_b AS (
  SELECT b,
         SUM(CASE WHEN to_a THEN cents END) AS sa,
         SUM(CASE WHEN to_a THEN 1 ELSE 0 END) AS na2,
         SUM(CASE WHEN to_a THEN 0 ELSE cents END) AS sb,
         SUM(CASE WHEN to_a THEN 0 ELSE 1 END) AS nb2
  FROM perm GROUP BY b
  HAVING SUM(CASE WHEN to_a THEN 1 ELSE 0 END) > 0
     AND SUM(CASE WHEN to_a THEN 0 ELSE 1 END) > 0),
scored AS (
  SELECT CASE WHEN abs(CAST(sa AS HUGEINT) * nb2
                       - CAST(sb AS HUGEINT) * na2) * obs.obs_den
              >= abs(obs.obs_num) * (CAST(na2 AS HUGEINT) * nb2)
         THEN 1 ELSE 0 END AS extreme,
         obs.obs_num, obs.obs_den
  FROM per_b, obs)
SELECT CAST(obs_num AS VARCHAR) AS obs_num,
       CAST(obs_den AS VARCHAR) AS obs_den,
       CAST(COUNT(*) AS BIGINT) AS n_perms,
       CAST(SUM(extreme) AS BIGINT) AS n_more_extreme,
       CAST(SUM(extreme) * 1000000 // COUNT(*) AS BIGINT) AS p_ppm
FROM scored GROUP BY obs_num, obs_den
"""


def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between purchase and view
    values (public test, Mann & Whitney 1947) — the rank-based
    location test beside the KS shape test, exact under ties: every
    rank is a midrank, kept integral by working at DOUBLE SCALE
    (rank2 = 2*count_below + count_equal + 1), so U ships as the
    exact scaled integer u2 = 2*U alongside its maximum na*nb*2.

    Same scalable frame as `ks_two_sample`: one merged distinct-value
    frame, one running sum for count-below, the group contribution
    folded per value — the fact table is never ranked row-by-row.
    """
    from pyspark.sql import Window

    # NULL values are not observations (canonical stats rule; they
    # would also sort to opposite window ends in the two engines)
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
    )
    # One conditional aggregation over the two groups replaces the old
    # two-aggregate + full-outer-join shape: rows grouped by value once
    # (one scan, one exchange instead of two of each + a join exchange);
    # the group keys are exactly the distinct cents present in either
    # group, and sum-of-indicator == the per-group counts with 0 where
    # a group is absent — identical to the old COALESCE(ca/cb, 0)
    # (guide §2.4 remove shuffles outright).
    merged = (
        ev.filter(F.col("event_type").isin("purchase", "view"))
        .groupBy("cents")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("ca"),
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("cb"),
        )
        .withColumn("eq", F.col("ca") + F.col("cb"))
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    cum = merged.withColumn(
        "below", F.coalesce(F.sum("eq").over(w), F.lit(0))
    )
    # rank2 of every element at value v = 2*below + eq + 1; group A's
    # scaled rank sum contribution at v = ca * rank2
    sums = cum.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(
            F.col("ca") * (2 * F.col("below") + F.col("eq") + 1)
        ).alias("r2a"),
    )
    return sums.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        # 2*U = 2*R_A - na(na+1)  (with R_A at double scale: r2a = 2*R_A)
        (F.col("r2a") - F.col("na") * (F.col("na") + 1)).cast("long").alias("u2"),
        (2 * F.col("na") * F.col("nb")).cast("long").alias("u2_max"),
        F.expr(
            "cast((cast(r2a - na * (na + 1) as decimal(38,0)) * 1000000)"
            " div (cast(2 as decimal(38,0)) * na * nb) as long)"
        ).alias("auc_ppm"),
    )


QUERIES["mann_whitney_u"] = mann_whitney_u
ORACLE["mann_whitney_u"] = """
WITH ev AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
  WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL),
ca AS (SELECT cents, COUNT(*) AS ca FROM ev
       WHERE event_type = 'purchase' GROUP BY cents),
cb AS (SELECT cents, COUNT(*) AS cb FROM ev
       WHERE event_type = 'view' GROUP BY cents),
merged AS (
  SELECT COALESCE(ca.cents, cb.cents) AS cents,
         COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb,
         COALESCE(ca, 0) + COALESCE(cb, 0) AS eq
  FROM ca FULL OUTER JOIN cb ON ca.cents = cb.cents),
cum AS (
  SELECT *, COALESCE(SUM(eq) OVER (ORDER BY cents
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM merged),
sums AS (
  SELECT SUM(ca) AS na, SUM(cb) AS nb,
         SUM(ca * (2 * below + eq + 1)) AS r2a
  FROM cum)
SELECT CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       CAST(r2a - na * (na + 1) AS BIGINT) AS u2,
       CAST(2 * na * nb AS BIGINT) AS u2_max,
       CAST((CAST(r2a - na * (na + 1) AS HUGEINT) * 1000000)
            // (CAST(2 AS HUGEINT) * na * nb) AS BIGINT) AS auc_ppm
FROM sums
"""


def acf_lag_profile(spark: SparkSession, sf_dir: str, max_lag: int = 7) -> DataFrame:
    """Autocorrelation profile of daily revenue at lags 1..7, reported
    in EXACT integer components: for each lag the Pearson numerator
    n*Sxy - Sx*Sy and the two variance numerators n*Sxx-(Sx)^2 /
    n*Syy-(Sy)^2 (r = num / sqrt(d1*d2), left to the consumer so no
    irrational sqrt enters the verified values). The weekly-cycle
    diagnostic every forecasting pipeline checks first.

    Shape: the fact table folds once to the bounded daily frame; each
    lag is an equi-join of that frame against itself shifted k days
    (generated by one explode over the 7 lags); one hash-agg per lag.
    All products run in DECIMAL(38) — daily sums of cents squared
    exceed int64.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias(
            "cents"
        ),
    )
    daily = orders.groupBy("d").agg(F.sum("cents").alias("x")).localCheckpoint(
        eager=True
    )
    lags = daily.select(
        "d", "x", F.explode(F.expr(f"sequence(1, {max_lag})")).alias("lag")
    )
    shifted = daily.select(
        F.col("d").alias("d2"), F.col("x").alias("y")
    )
    pairs = lags.join(
        shifted, F.expr("date_add(d, lag) = d2")
    ).select("lag", "x", "y")
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    return (
        pairs.groupBy("lag")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(dec("x") * dec("y")).alias("sxy"),
            F.sum(dec("x") * dec("x")).alias("sxx"),
            F.sum(dec("y") * dec("y")).alias("syy"),
        )
        .select(
            F.col("lag").cast("long").alias("lag"),
            F.col("n").cast("long").alias("n_pairs"),
            (F.col("n") * F.col("sxy") - dec("sx") * dec("sy"))
            .cast("decimal(38,0)").cast("string").alias("num"),
            (F.col("n") * F.col("sxx") - dec("sx") * dec("sx"))
            .cast("decimal(38,0)").cast("string").alias("den_x"),
            (F.col("n") * F.col("syy") - dec("sy") * dec("sy"))
            .cast("decimal(38,0)").cast("string").alias("den_y"),
        )
        .orderBy("lag")
    )


QUERIES["acf_lag_profile"] = acf_lag_profile
ORACLE["acf_lag_profile"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS x
  FROM orders GROUP BY 1),
pairs AS (
  SELECT g.lag, a.x, b.x AS y
  FROM daily a
  JOIN (SELECT CAST(l.l AS BIGINT) AS lag FROM UNNEST(range(1, 8)) AS l(l)) g
    ON TRUE
  JOIN daily b ON b.d = a.d + CAST(g.lag AS INT) * INTERVAL 1 DAY),
agg AS (
  SELECT lag, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM pairs GROUP BY lag)
SELECT CAST(lag AS BIGINT) AS lag,
       CAST(n AS BIGINT) AS n_pairs,
       CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS VARCHAR) AS num,
       CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS VARCHAR) AS den_x,
       CAST(n * syy - CAST(sy AS HUGEINT) * sy AS VARCHAR) AS den_y
FROM agg ORDER BY lag
"""


def spearman_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between each customer's order count
    and revenue (public statistic, Spearman 1904): Pearson on tie-
    midranks, with every component exact — midranks kept integral at
    double scale (rank2 = 2*below + eq + 1, as in `mann_whitney_u`),
    and the correlation shipped as the three DECIMAL(38) integers
    (num, den_x, den_y; rho = num/sqrt(den_x*den_y)) like
    `acf_lag_profile` — the monotone-association measure that Pearson
    misses when the relationship is nonlinear.

    Shape: one hash-agg to the customer frame, two distinct-value
    rank maps (window over each variable's bounded value domain)
    joined back, one final fold. The fact table is never ranked
    row-by-row.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("x"),
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .alias("y"),
    ).localCheckpoint(eager=True)

    def rank2_map(col):
        per_v = cust.groupBy(col).agg(F.count("*").alias("eq"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return per_v.withColumn(
            "below", F.coalesce(F.sum("eq").over(w), F.lit(0))
        ).select(
            col, (2 * F.col("below") + F.col("eq") + 1).alias(f"r2_{col}")
        )

    ranked = cust.join(rank2_map("x"), "x").join(rank2_map("y"), "y")
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    return ranked.agg(
        F.count("*").alias("n"),
        F.sum("r2_x").alias("sx"),
        F.sum("r2_y").alias("sy"),
        F.sum(dec("r2_x") * dec("r2_y")).alias("sxy"),
        F.sum(dec("r2_x") * dec("r2_x")).alias("sxx"),
        F.sum(dec("r2_y") * dec("r2_y")).alias("syy"),
    ).select(
        F.col("n").cast("long").alias("n_customers"),
        (F.col("n") * F.col("sxy") - dec("sx") * dec("sy"))
        .cast("decimal(38,0)").cast("string").alias("num"),
        (F.col("n") * F.col("sxx") - dec("sx") * dec("sx"))
        .cast("decimal(38,0)").cast("string").alias("den_x"),
        (F.col("n") * F.col("syy") - dec("sy") * dec("sy"))
        .cast("decimal(38,0)").cast("string").alias("den_y"),
    )


QUERIES["spearman_rank_correlation"] = spearman_rank_correlation
ORACLE["spearman_rank_correlation"] = """
WITH cust AS (
  SELECT o_custkey, COUNT(*) AS x,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS y
  FROM orders GROUP BY o_custkey),
rx AS (
  SELECT x, 2 * COALESCE(SUM(eq) OVER (ORDER BY x
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + eq + 1
         AS r2_x
  FROM (SELECT x, COUNT(*) AS eq FROM cust GROUP BY x)),
ry AS (
  SELECT y, 2 * COALESCE(SUM(eq) OVER (ORDER BY y
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + eq + 1
         AS r2_y
  FROM (SELECT y, COUNT(*) AS eq FROM cust GROUP BY y)),
ranked AS (
  SELECT r2_x, r2_y FROM cust JOIN rx USING (x) JOIN ry USING (y)),
agg AS (
  SELECT COUNT(*) AS n, SUM(r2_x) AS sx, SUM(r2_y) AS sy,
         SUM(CAST(r2_x AS HUGEINT) * r2_y) AS sxy,
         SUM(CAST(r2_x AS HUGEINT) * r2_x) AS sxx,
         SUM(CAST(r2_y AS HUGEINT) * r2_y) AS syy
  FROM ranked)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS VARCHAR) AS num,
       CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS VARCHAR) AS den_x,
       CAST(n * syy - CAST(sy AS HUGEINT) * sy AS VARCHAR) AS den_y
FROM agg
"""


def kaplan_meier_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier risk table for user lifetime (public estimator,
    Kaplan & Meier 1958): per observed lifetime t (days between a
    user's first and last event), the number at risk, the churn events
    d_t, and the right-censored count c_t — users still active on the
    corpus's final day are censored, not churned. The survival curve
    S(t) = prod(1 - d_i/n_i) is consumer-derived from these EXACT
    integer columns, so no rational product ever enters the verified
    values.

    Shape: one per-user hash-agg (first/last day), one per-duration
    hash-agg, and the at-risk count is a REVERSE running sum over the
    bounded duration domain — the standard life-table construction
    with nothing row-ordered.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    span = ev.groupBy("user_id").agg(
        F.min("d").alias("first_d"), F.max("d").alias("last_d")
    )
    horizon = ev.agg(F.max("d").alias("h"))
    per_user = span.crossJoin(F.broadcast(horizon)).select(
        F.datediff("last_d", "first_d").cast("long").alias("t"),
        (F.col("last_d") < F.col("h")).cast("int").alias("churned"),
    )
    per_t = per_user.groupBy("t").agg(
        F.sum("churned").alias("d_t"),
        F.sum(1 - F.col("churned")).alias("c_t"),
        F.count("*").alias("n_t"),
    )
    w = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_t.withColumn("at_risk", F.sum("n_t").over(w))
        .select(
            F.col("t").alias("lifetime_days"),
            F.col("at_risk").cast("long").alias("n_at_risk"),
            F.col("d_t").cast("long").alias("churn_events"),
            F.col("c_t").cast("long").alias("censored"),
        )
        .orderBy("lifetime_days")
    )


QUERIES["kaplan_meier_table"] = kaplan_meier_table
ORACLE["kaplan_meier_table"] = """
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
span AS (
  SELECT user_id, MIN(d) AS first_d, MAX(d) AS last_d
  FROM ev GROUP BY user_id),
horizon AS (SELECT MAX(d) AS h FROM ev),
per_user AS (
  SELECT CAST(date_diff('day', first_d, last_d) AS BIGINT) AS t,
         CASE WHEN last_d < h THEN 1 ELSE 0 END AS churned
  FROM span, horizon),
per_t AS (
  SELECT t, SUM(churned) AS d_t, SUM(1 - churned) AS c_t, COUNT(*) AS n_t
  FROM per_user GROUP BY t)
SELECT t AS lifetime_days,
       CAST(SUM(n_t) OVER (ORDER BY t DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_at_risk,
       CAST(d_t AS BIGINT) AS churn_events,
       CAST(c_t AS BIGINT) AS censored
FROM per_t ORDER BY lifetime_days
"""
