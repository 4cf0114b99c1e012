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
from streaming_data_pipeline_spark.sources.batch import load_table


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
            (F.round(F.col("n") / F.col("tot"), 6) + F.lit(0.0)).alias(
                "conversion"
            ),
        )
        .orderBy("stage")
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
        .orderBy("cohort_week", "week_offset")
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
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    bigrams = F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        )
    )
    counted = (
        docs.select("lang", F.explode(bigrams).alias("bigram"))
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


QUERIES = {
    "event_funnel_conversion": event_funnel_conversion,
    "retention_cohorts": retention_cohorts,
    "running_user_value": running_user_value,
    "top_bigrams_by_lang": top_bigrams_by_lang,
    "zipf_token_rank": zipf_token_rank,
    "doc_length_log_histogram": doc_length_log_histogram,
    "dedup_keep_canonical": dedup_keep_canonical,
}

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"

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

