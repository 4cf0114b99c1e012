"""SQL-surface widening: operator families beyond the reference's
GROUP-BY rollups (SURVEY.md §2.11 declared absences) that any warehouse
user reaches for next — grouping sets, pivot, exact percentiles, JSON
path extraction, collect/array aggregation, approximate distinct counts,
RANGE window frames, and rank-family analytics.

Oracle notes:
- percentiles: Spark ``percentile`` and DuckDB ``quantile_cont`` share
  the linear-interpolation definition; results are rounded at the
  comparison boundary.
- dayofweek: Spark is 1=Sunday..7=Saturday, DuckDB 0=Sunday..6=Saturday;
  the oracle adds 1.
- approx_count_distinct is engine-specific (HLL++ vs HLL) — that query
  is self-validating: it emits the exact count + a within-5%-of-exact
  boolean, and the oracle emits the exact count + literal TRUE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_pipeline_spark.sources.batch import load_table, register_views


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


_D2_SUM_SQL = "CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)"


def _d2_sum():
    return (
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("double")
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((status), (priority), ()) + grouping_id — the
    general form behind rollup/cube, via the SQL entry point. The
    ()-set grand-total row survives a zero-row input (standard
    semantics; see plans.base.with_empty_grouping_total)."""
    from streaming_data_pipeline_spark.plans.base import with_empty_grouping_total

    register_views(spark, sf_dir)
    rolled = spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS order_count,
               {_D2_SUM_SQL} AS revenue,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS grp
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )
    return with_empty_grouping_total(
        rolled,
        _t(spark, sf_dir, "orders"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        F.lit(0).cast("long").alias("order_count"),
        F.lit(None).cast("double").alias("revenue"),
        F.lit(3).cast("long").alias("grp"),
    )


def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority pivoted on the status values.
    Explicit value list keeps the plan a single pass (no distinct scan)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "o_orderpriority",
            F.col("F").cast("long").alias("cnt_f"),
            F.col("O").cast("long").alias("cnt_o"),
            F.col("P").cast("long").alias("cnt_p"),
        )
        .orderBy("o_orderpriority")
    )


def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median/p90/p99) per priority — Spark
    ``percentile``, matched by DuckDB ``quantile_cont``."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
            F.count("*").alias("order_count"),
        )
        .orderBy("o_orderpriority")
    )


def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over the events ``props`` payload
    (get_json_object -> typed column -> bucket aggregation)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(k.alias("k"), "value")
        .filter(F.col("k").isNotNull())
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("event_count"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("decimal(38,6)")
                .cast("double")
                / F.count("*"),
                6,
            ).alias("avg_value"),
        )
        .orderBy("k_bucket")
    )


def collect_sources_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: sorted distinct set of sources per language,
    rendered to a string so the cross-engine compare is canonical."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("source"))).alias("sources"),
            F.count("*").alias("doc_count"),
        )
        .orderBy("lang")
    )


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) validated against the exact count —
    the 100 TB-scale variant of SURVEY.md §2.5 A4. HLL sketch values are
    engine-specific, so the query is self-validating: it emits the exact
    count plus a boolean asserting the estimate lands within 5%, and the
    oracle emits the exact count plus literal TRUE. A drifting sketch
    turns the row red instead of being unverifiable."""
    ev = _t(spark, sf_dir, "events")
    # rsd=0.01: the default sketch's 5% relative standard deviation is
    # the same size as the 5% tolerance below, so ~1-sigma deviations
    # flipped the boolean at sf0.1 cardinalities (observed). A 1% rsd
    # sketch gives the check a 5-sigma margin at any scale.
    approx = F.approx_count_distinct("user_id", rsd=0.01)
    exact = F.countDistinct("user_id")
    return (
        ev.groupBy("event_type")
        .agg(
            exact.alias("exact_users"),
            (F.abs(approx - exact) <= 0.05 * exact).alias("approx_within_5pct"),
        )
        .orderBy("event_type")
    )


def rolling_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame over event-time: per order, revenue of all
    orders by the same customer within the preceding 7 days."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
               ) AS DECIMAL(38,2)) AS DOUBLE) AS weekly_revenue
        FROM orders
        ORDER BY o_orderkey
        """
    )


def customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank family: ntile quartiles + percent_rank + cume_dist over
    account balance within each market segment."""
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    # explicit NULLS LAST: Spark's ASC default is NULLS FIRST, DuckDB's
    # is NULLS LAST, so an unknown balance silently shifted every rank
    # in its segment; rank-family ordering must be pinned, not default
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc_nulls_last(), "c_custkey"
    )
    return (
        cust.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("c_custkey")
    )


def csv_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's CSV export sink (web-application.py:362-371, S4):
    enriched events written as header'd CSV, read back with an explicit
    schema (never inferSchema), aggregated. Oracle recomputes from the
    enriched CTE — proving the export is lossless for the exported cols."""
    import shutil
    import tempfile

    from streaming_data_pipeline_spark.plans.base import enriched_events

    enriched = enriched_events(spark, sf_dir).select(
        "id", "event_type", "value", "message_length", "data_quality_score"
    )
    base = tempfile.mkdtemp(prefix="spark_graft_csv_")
    try:
        enriched.write.mode("overwrite").option("header", True).csv(base)
        back = (
            spark.read.schema(
                "id string, event_type string, value double, "
                "message_length bigint, data_quality_score bigint"
            )
            .option("header", True)
            .csv(base)
        )
        out = (
            back.groupBy("event_type")
            .agg(
                F.count("*").alias("event_count"),
                F.sum("message_length").alias("total_msg_len"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
            .orderBy("event_type")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES = {
    "csv_export_roundtrip": csv_export_roundtrip,
    "grouping_sets_revenue": grouping_sets_revenue,
    "pivot_priority_by_status": pivot_priority_by_status,
    "order_price_percentiles": order_price_percentiles,
    "json_props_extract": json_props_extract,
    "collect_sources_per_lang": collect_sources_per_lang,
    "approx_distinct_users": approx_distinct_users,
    "rolling_weekly_revenue": rolling_weekly_revenue,
    "customer_balance_quartiles": customer_balance_quartiles,
}

from streaming_data_pipeline_spark.plans.base import ENRICHED_CTE  # noqa: E402

ORACLE = {
    "csv_export_roundtrip": ENRICHED_CTE
    + """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           CAST(SUM(message_length) AS BIGINT) AS total_msg_len,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM enriched GROUP BY event_type ORDER BY event_type
    """,
    "grouping_sets_revenue": f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS order_count,
           {_D2_SUM_SQL} AS revenue,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS grp
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY grp, o_orderstatus, o_orderpriority
    """,
    "pivot_priority_by_status": """
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS cnt_f,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS cnt_o,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS cnt_p
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "order_price_percentiles": """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
           CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "json_props_extract": """
    WITH k AS (SELECT CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS BIGINT) AS k, value
               FROM events
               WHERE json_extract_string(TRY_CAST(props AS JSON), '$.k') IS NOT NULL)
    SELECT k % 10 AS k_bucket,
           CAST(COUNT(*) AS BIGINT) AS event_count,
           round(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
                 / COUNT(*), 6) AS avg_value
    FROM k GROUP BY 1 ORDER BY 1
    """,
    "collect_sources_per_lang": """
    SELECT lang,
           COALESCE(array_to_string(list_sort(list(DISTINCT source)), ','), '') AS sources,
           CAST(COUNT(*) AS BIGINT) AS doc_count
    FROM documents GROUP BY lang ORDER BY lang
    """,
    "approx_distinct_users": """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "rolling_weekly_revenue": """
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
           ) AS DECIMAL(38,2)) AS DOUBLE) AS weekly_revenue
    FROM orders
    ORDER BY o_orderkey
    """,
    "customer_balance_quartiles": """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
}


def json_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source roundtrip (the reference's wire format as
    a batch surface): enriched events written as JSON, read back with an
    explicit schema (never inferSchema — SURVEY.md §1.3), aggregated.
    Oracle recomputes from the enriched CTE."""
    import shutil
    import tempfile

    from streaming_data_pipeline_spark.plans.base import enriched_events

    enriched = enriched_events(spark, sf_dir).select(
        "id", "event_type", "value", "message_length", "data_quality_score"
    )
    base = tempfile.mkdtemp(prefix="spark_graft_json_")
    try:
        enriched.write.mode("overwrite").json(base)
        back = spark.read.schema(
            "id string, event_type string, value double, "
            "message_length bigint, data_quality_score bigint"
        ).json(base)
        out = (
            back.groupBy("data_quality_score")
            .agg(
                F.count("*").alias("event_count"),
                F.round(F.avg("message_length"), 4).alias("avg_msg_len"),
                F.countDistinct("event_type").alias("event_types"),
            )
            .orderBy("data_quality_score")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES["json_export_roundtrip"] = json_export_roundtrip
ORACLE["json_export_roundtrip"] = ENRICHED_CTE + """
SELECT data_quality_score,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       round(AVG(message_length), 4) AS avg_msg_len,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS event_types
FROM enriched GROUP BY data_quality_score ORDER BY data_quality_score
"""


def orc_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source roundtrip — the columnar export twin of the CSV
    and JSON sinks (S4 family): enriched events written as ORC, read
    back with an explicit schema, aggregated; the oracle recomputes from
    the enriched CTE, proving the export is lossless."""
    import shutil
    import tempfile

    from streaming_data_pipeline_spark.plans.base import enriched_events

    enriched = enriched_events(spark, sf_dir).select(
        "id", "event_type", "value", "message_length", "data_quality_score"
    )
    base = tempfile.mkdtemp(prefix="spark_graft_orc_")
    try:
        enriched.write.mode("overwrite").orc(base)
        back = spark.read.schema(
            "id string, event_type string, value double, "
            "message_length bigint, data_quality_score bigint"
        ).orc(base)
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


QUERIES["orc_export_roundtrip"] = orc_export_roundtrip
ORACLE["orc_export_roundtrip"] = ENRICHED_CTE + """
SELECT event_type, data_quality_score,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       CAST(SUM(message_length) AS BIGINT) AS total_msg_len,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM enriched GROUP BY event_type, data_quality_score
ORDER BY event_type, data_quality_score
"""


def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide per-priority metric row — order count,
    DECIMAL-exact revenue, max price — folded into long (priority,
    metric, metric_value) form, the shape metric stores and plotting
    layers want. ``DataFrame.unpivot`` compiles to a generate/expand
    node (each input row fans out to one row per value column — no
    shuffle beyond the feeding aggregate); the oracle is the portable
    UNION ALL equivalent.
    """
    orders = _t(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n_orders"),
        _d2_sum().alias("revenue"),
        F.max(F.col("o_totalprice")).alias("max_price"),
    )
    return (
        wide.unpivot(
            ["o_orderpriority"],
            ["n_orders", "revenue", "max_price"],
            "metric",
            "metric_value",
        )
        .orderBy("o_orderpriority", "metric")
    )


QUERIES["unpivot_order_metrics"] = unpivot_order_metrics
ORACLE["unpivot_order_metrics"] = f"""
WITH wide AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS DOUBLE) AS n_orders,
         {_D2_SUM_SQL} AS revenue,
         MAX(o_totalprice) AS max_price
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, metric, metric_value FROM (
  SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS metric_value FROM wide
  UNION ALL
  SELECT o_orderpriority, 'revenue', revenue FROM wide
  UNION ALL
  SELECT o_orderpriority, 'max_price', max_price FROM wide
)
ORDER BY o_orderpriority, metric
"""


def variant_nested_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT semi-structured path: a nested JSON document is
    parsed ONCE into the binary VARIANT encoding (``parse_json``), then
    several typed ``variant_get`` path extractions — including a nested
    '$.user.id' — feed an aggregate. This is the modern engine's answer
    to repeated ``get_json_object`` calls, each of which re-parses the
    JSON text per path per row; VARIANT amortizes the parse and stores
    fields pre-tokenized, which is the difference that matters when the
    payload is KBs and the paths are many. (The event fixture's props is
    flat, so the nested document is synthesized deterministically from
    fixture columns; the oracle derives the same values from the columns
    directly — proving extraction, not JSON round-tripping.)
    """
    ev = _t(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_type").alias("type"),
            F.struct(
                F.col("user_id").alias("id"),
                F.col("value").alias("v"),
            ).alias("user"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
    )
    v = F.parse_json(doc)
    flat = ev.select(
        F.variant_get(v, "$.type", "string").alias("etype"),
        F.variant_get(v, "$.user.id", "bigint").alias("uid"),
        F.variant_get(v, "$.k", "bigint").alias("k"),
    )
    return (
        flat.groupBy("etype")
        .agg(
            F.count("*").alias("event_count"),
            F.sum("k").alias("k_sum"),
            F.countDistinct(F.pmod(F.col("uid"), F.lit(100))).alias(
                "uid_mod_groups"
            ),
        )
        .orderBy("etype")
    )


QUERIES["variant_nested_extract"] = variant_nested_extract
ORACLE["variant_nested_extract"] = """
SELECT event_type AS etype,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       CAST(SUM(CAST(json_extract(TRY_CAST(props AS JSON), '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(COUNT(DISTINCT user_id % 100) AS BIGINT) AS uid_mod_groups
FROM events
GROUP BY event_type
ORDER BY etype
"""


def xml_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + source roundtrip — Spark 4's built-in XML source as
    the document-interchange member of the S4 export family (CSV / JSON
    / ORC twins above): enriched events written one <event> element per
    row, read back with an explicit schema (never inferSchema — same
    discipline as the CSV reader), aggregated; the oracle recomputes
    from the enriched CTE, proving the export is lossless for the
    exported columns. Scale note: the XML writer emits one file per
    partition like every other file sink, so export parallelism is the
    frame's partitioning; rowTag streaming parse keeps the reader
    record-at-a-time (no whole-document DOM)."""
    import shutil
    import tempfile

    from streaming_data_pipeline_spark.plans.base import enriched_events

    enriched = enriched_events(spark, sf_dir).select(
        "id", "event_type", "value", "message_length", "data_quality_score"
    )
    base = tempfile.mkdtemp(prefix="spark_graft_xml_")
    try:
        (
            enriched.write.mode("overwrite")
            .format("xml")
            .option("rootTag", "events")
            .option("rowTag", "event")
            .save(base)
        )
        back = (
            spark.read.schema(
                "id string, event_type string, value double, "
                "message_length bigint, data_quality_score bigint"
            )
            .format("xml")
            .option("rowTag", "event")
            .load(base)
        )
        out = (
            back.groupBy("event_type")
            .agg(
                F.count("*").alias("event_count"),
                F.sum("message_length").alias("total_msg_len"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
                F.min("id").alias("min_id"),
            )
            .orderBy("event_type")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES["xml_export_roundtrip"] = xml_export_roundtrip
ORACLE["xml_export_roundtrip"] = ENRICHED_CTE + """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       CAST(SUM(message_length) AS BIGINT) AS total_msg_len,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
       MIN(id) AS min_id
FROM enriched GROUP BY event_type ORDER BY event_type
"""


def full_outer_activity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER equi-join — the last join type in the matrix (inner /
    left / semi / anti / as-of / range / broadcast-NLJ elsewhere): each
    user's purchase profile joined to their error profile, keeping
    users who only ever did one of the two. Null-side fills are made
    explicit with coalesce so the result is deterministic. Scale shape:
    both sides are pre-aggregated to one row per user before the join,
    so the full-outer shuffle moves two already-reduced tables keyed the
    same way (one exchange each, no expansion)."""
    ev = _t(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("purchase_count"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("purchase_value"),
        )
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count("*").alias("error_count"))
    )
    return (
        purchases.join(errors, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("purchase_count", F.lit(0)).alias("purchase_count"),
            F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"),
            F.coalesce("error_count", F.lit(0)).alias("error_count"),
        )
        .orderBy("user_id")
    )


QUERIES["full_outer_activity_join"] = full_outer_activity_join
ORACLE["full_outer_activity_join"] = """
WITH p AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS purchase_count,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
e AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS error_count
  FROM events WHERE event_type = 'error' GROUP BY user_id)
SELECT COALESCE(p.user_id, e.user_id) AS user_id,
       COALESCE(p.purchase_count, 0) AS purchase_count,
       COALESCE(p.purchase_value, 0.0) AS purchase_value,
       COALESCE(e.error_count, 0) AS error_count
FROM p FULL OUTER JOIN e ON p.user_id = e.user_id
ORDER BY user_id
"""


def udaf_median_mad_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Arrow UDAF (grouped-agg pandas_udf) — the custom-
    aggregate escape hatch on the §2.9 UDF surface, for statistics with
    no built-in (here: median absolute deviation, a robust spread
    measure quality screens use where stddev is outlier-dominated).

    Each group arrives as ONE Arrow batch per aggregate call, so the
    scale contract differs from built-in aggs: a group must fit an
    executor's Arrow buffer. That holds here (groups = event types);
    for high-cardinality keys the engine's approx_quantiles_check /
    order_price_percentiles paths are the scale-safe route. Median is
    computed on the DECIMAL(18,2)-quantized doubles (exact two-decimal
    values, midpoint of two exact values is exact in binary64), so the
    numpy and DuckDB interpolation formulas agree bit-for-bit.
    """
    from streaming_data_pipeline_spark.functions.udafs import mad_udaf, median_udaf

    ev = _t(spark, sf_dir, "events").withColumn(
        "v2", F.col("value").cast("decimal(18,2)").cast("double")
    )
    # Spark disallows mixing pandas UDAFs with built-in aggregates in
    # one agg(); the exact count rides a separate agg joined back (both
    # aggs share the event_type shuffle key — one exchange on a real
    # cluster, and the joined sides are a handful of rows).
    robust = ev.groupBy("event_type").agg(
        (F.round(median_udaf(F.col("v2")), 4) + F.lit(0.0)).alias("median_value"),
        (F.round(mad_udaf(F.col("v2")), 4) + F.lit(0.0)).alias("mad_value"),
    )
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    return (
        counts.join(robust, "event_type")
        .select("event_type", "n", "median_value", "mad_value")
        .orderBy("event_type")
    )


QUERIES["udaf_median_mad_by_type"] = udaf_median_mad_by_type
ORACLE["udaf_median_mad_by_type"] = """
WITH q AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS v2
  FROM events),
med AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         MEDIAN(v2) AS med
  FROM q GROUP BY event_type)
SELECT m.event_type, m.n,
       ROUND(m.med, 4) + 0.0 AS median_value,
       ROUND(MEDIAN(ABS(q.v2 - m.med)), 4) + 0.0 AS mad_value
FROM med m JOIN q ON q.event_type = m.event_type
GROUP BY m.event_type, m.n, m.med
ORDER BY m.event_type
"""


def order_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full rank-family analytic surface in one pass: rank /
    dense_rank / percent_rank / cume_dist over a TIE-PRONE key (price
    bucketed to thousands — these four depend only on key values, so
    ties are well-defined), plus ntile and nth_value over a fully
    deterministic total order (price, then key) since those two depend
    on physical row order. Top-5 rows per priority via row_number.
    percent_rank/cume_dist are exact small rationals — both engines
    compute the identical IEEE double, no rounding needed. One sort per
    window spec; both specs share the o_orderpriority partitioning, so
    a real cluster pays one exchange and two in-partition sorts.
    """
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").withColumn(
        "price_k", F.floor(F.col("o_totalprice") / 1000).cast("long")
    )
    tiesw = Window.partitionBy("o_orderpriority").orderBy(F.desc("price_k"))
    detw = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    full = detw.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "price_k",
            F.rank().over(tiesw).cast("long").alias("rnk"),
            F.dense_rank().over(tiesw).cast("long").alias("drnk"),
            F.percent_rank().over(tiesw).alias("prnk"),
            F.cume_dist().over(tiesw).alias("cdist"),
            F.ntile(4).over(detw).cast("long").alias("tile4"),
            F.nth_value("o_totalprice", 3).over(full).alias("third_price"),
            F.row_number().over(detw).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
        .select(
            "o_orderpriority",
            "o_orderkey",
            "price_k",
            "rnk",
            "drnk",
            "prnk",
            "cdist",
            "tile4",
            "third_price",
            F.col("rn").cast("long").alias("rn"),
        )
        .orderBy("o_orderpriority", "rn")
    )


QUERIES["order_rank_profile"] = order_rank_profile
ORACLE["order_rank_profile"] = """
WITH o AS (
  SELECT *, CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_k
  FROM orders),
r AS (
  SELECT o_orderpriority, o_orderkey, price_k,
         CAST(RANK() OVER tw AS BIGINT) AS rnk,
         CAST(DENSE_RANK() OVER tw AS BIGINT) AS drnk,
         PERCENT_RANK() OVER tw AS prnk,
         CUME_DIST() OVER tw AS cdist,
         CAST(NTILE(4) OVER dw AS BIGINT) AS tile4,
         NTH_VALUE(o_totalprice, 3) OVER
           (dw ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS third_price,
         CAST(ROW_NUMBER() OVER dw AS BIGINT) AS rn
  FROM o
  WINDOW tw AS (PARTITION BY o_orderpriority ORDER BY price_k DESC),
         dw AS (PARTITION BY o_orderpriority
                ORDER BY o_totalprice DESC, o_orderkey ASC))
SELECT * FROM r WHERE rn <= 5
ORDER BY o_orderpriority, rn
"""


def map_column_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: per-user event-type counts packed into a
    map<string,bigint> (map_from_entries over sorted entries), sized
    with map cardinality, then exploded back to rows — construction,
    introspection, and generation on the one container type the rest of
    the surface doesn't touch (arrays, structs, VARIANT, JSON all have
    dedicated queries). The explode proves packing was lossless; the
    oracle computes the flat counts plus the per-user type cardinality
    directly. Map columns are how a 100 TB feature store ships sparse
    per-entity features without a column per key.
    """
    ev = _t(spark, sf_dir, "events")
    # a map key cannot be NULL (NULL_MAP_KEY): a NULL event_type is not
    # a feature, so it is excluded from the per-user map — the oracle
    # applies the identical predicate
    counts = (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    packed = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    return (
        packed.select(
            "user_id",
            F.size("m").cast("long").alias("n_types"),
            F.explode("m").alias("event_type", "type_count"),
        )
        .orderBy("user_id", "event_type")
    )


QUERIES["map_column_roundtrip"] = map_column_roundtrip
ORACLE["map_column_roundtrip"] = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS type_count
  FROM events WHERE event_type IS NOT NULL GROUP BY user_id, event_type)
SELECT user_id,
       CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_types,
       event_type, type_count
FROM c
ORDER BY user_id, event_type
"""


def sql_udf_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference DoFn's quality score (SURVEY.md §2.3 E3,
    Streamingdag.py:214-225) as a DECLARATIVE SQL UDF — Spark 4's
    `CREATE FUNCTION ... RETURN <expr>`: the function body is inlined
    into the plan at analysis time and runs inside whole-stage codegen,
    so unlike a Python UDF this escape hatch costs NOTHING at 100 TB —
    it is pure reusable expression packaging. The score distribution it
    produces must equal the column-expression implementation the main
    ETL chain uses (the oracle recomputes the same rules inline).
    """
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION ref_quality_score(
            user_id STRING, message STRING, v DOUBLE, ts TIMESTAMP_NTZ)
        RETURNS BIGINT
        RETURN CAST(
            (CASE WHEN user_id IS NOT NULL AND user_id <> ''
                   AND user_id <> 'unknown' THEN 25 ELSE 0 END)
          + (CASE WHEN message IS NOT NULL AND message <> '' THEN 25 ELSE 0 END)
          + (CASE WHEN v > 0.0 THEN 25 ELSE 0 END)
          + (CASE WHEN ts IS NOT NULL THEN 25 ELSE 0 END) AS BIGINT)
        """
    )
    return spark.sql(
        """
        SELECT ref_quality_score(CAST(user_id AS STRING), props,
                                 COALESCE(value, 0.0), ts) AS data_quality_score,
               CAST(COUNT(*) AS BIGINT) AS message_count
        FROM events
        GROUP BY 1 ORDER BY data_quality_score DESC
        """
    )


QUERIES["sql_udf_quality_score"] = sql_udf_quality_score
ORACLE["sql_udf_quality_score"] = """
SELECT CAST(
      (CASE WHEN user_id IS NOT NULL AND CAST(user_id AS VARCHAR) <> ''
             AND CAST(user_id AS VARCHAR) <> 'unknown' THEN 25 ELSE 0 END)
    + (CASE WHEN props IS NOT NULL AND props <> '' THEN 25 ELSE 0 END)
    + (CASE WHEN COALESCE(value, 0.0) > 0.0 THEN 25 ELSE 0 END)
    + (CASE WHEN ts IS NOT NULL THEN 25 ELSE 0 END) AS BIGINT)
      AS data_quality_score,
    CAST(COUNT(*) AS BIGINT) AS message_count
FROM events
GROUP BY 1 ORDER BY data_quality_score DESC
"""


def recursive_cte_user_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4) — iterative queries in pure SQL: every
    distinct user walks its ancestry chain in the implicit binary-tree
    hierarchy parent = id DIV 2 until the root, emitting the chain
    depth. Recursion executes as a bounded loop of self-joins (depth
    here is log2(max id) ~ 11-21 levels), the same plan shape a
    recursive org-chart / BOM query takes at warehouse scale — each
    level is one hash join on the frontier, and the frontier shrinks
    monotonically. DuckDB runs the identical recursion as the oracle.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE chain (user_id, cur, depth) AS (
          SELECT user_id, user_id, 0
          FROM (SELECT DISTINCT user_id FROM events)
          UNION ALL
          SELECT user_id, cur DIV 2, depth + 1 FROM chain WHERE cur > 1
        )
        SELECT user_id, CAST(MAX(depth) AS BIGINT) AS depth
        FROM chain GROUP BY user_id ORDER BY user_id
        """
    )


QUERIES["recursive_cte_user_hierarchy"] = recursive_cte_user_hierarchy
ORACLE["recursive_cte_user_hierarchy"] = """
WITH RECURSIVE chain (user_id, cur, depth) AS (
  SELECT user_id, user_id, 0
  FROM (SELECT DISTINCT user_id FROM events)
  UNION ALL
  SELECT user_id, cur // 2, depth + 1 FROM chain WHERE cur > 1
)
SELECT user_id, CAST(MAX(depth) AS BIGINT) AS depth
FROM chain GROUP BY user_id ORDER BY user_id
"""


def sql_table_function_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative SQL TABLE function (Spark 4 `CREATE FUNCTION ...
    RETURNS TABLE`) — the set-returning twin of `sql_udf_quality_score`:
    a reusable calendar generator defined in pure SQL, consumed via
    LATERAL-style table reference to densify the per-type daily series
    (every (type, day) cell present, zero-filled). Like the scalar SQL
    UDF it inlines at analysis time — a zero-cost packaging of the
    sequence()/explode idiom, vs the Python UDTF path
    (`udtf_chunk_split`) which crosses the interpreter.
    """
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION day_seq(d0 DATE, d1 DATE)
        RETURNS TABLE (day DATE)
        RETURN SELECT explode(sequence(d0, d1, interval 1 day))
        """
    )
    return spark.sql(
        """
        WITH bounds AS (
          SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
          FROM events),
        cal AS (
          SELECT t.day FROM bounds b, LATERAL day_seq(b.d0, b.d1) t),
        daily AS (
          SELECT CAST(ts AS DATE) AS day, event_type,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2)
        SELECT CAST(c.day AS TIMESTAMP) AS day, t.event_type,
               COALESCE(d.n, 0) AS event_count
        FROM cal c
        CROSS JOIN (SELECT DISTINCT event_type FROM events) t
        LEFT JOIN daily d ON d.day = c.day AND d.event_type = t.event_type
        ORDER BY day, event_type
        """
    )


QUERIES["sql_table_function_calendar"] = sql_table_function_calendar
ORACLE["sql_table_function_calendar"] = """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events),
cal AS (
  SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
  FROM bounds),
daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2)
SELECT CAST(c.day AS TIMESTAMP) AS day, t.event_type,
       COALESCE(d.n, 0) AS event_count
FROM cal c
CROSS JOIN (SELECT DISTINCT event_type FROM events) t
LEFT JOIN daily d ON d.day = c.day AND d.event_type = t.event_type
ORDER BY day, t.event_type
"""


def null_safe_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): two
    daily aggregates keyed on a NULLABLE key (event_type with 'error'
    nulled out — the shape real dims take when a key is optional) are
    joined so the NULL group matches the NULL group instead of being
    silently dropped the way `=` drops it. The row counts prove the
    NULL-NULL match happened (a plain join would lose that row)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "k", F.nullif(F.col("event_type"), F.lit("error"))
    )
    first_half = (
        ev.filter(F.col("ts") < "2024-01-16")
        .groupBy("k")
        .agg(F.count("*").alias("n_first"))
    )
    second_half = (
        ev.filter(F.col("ts") >= "2024-01-16")
        .groupBy("k")
        .agg(F.count("*").alias("n_second"))
    )
    return (
        first_half.join(second_half, first_half.k.eqNullSafe(second_half.k))
        .select(
            F.coalesce(first_half.k, F.lit("<null-key>")).alias("join_key"),
            "n_first",
            "n_second",
        )
        .orderBy("join_key")
    )


QUERIES["null_safe_join_counts"] = null_safe_join_counts
ORACLE["null_safe_join_counts"] = """
WITH ev AS (
  SELECT NULLIF(event_type, 'error') AS k, ts FROM events),
f AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_first
  FROM ev WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY k),
s AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_second
  FROM ev WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY k)
SELECT COALESCE(f.k, '<null-key>') AS join_key, f.n_first, s.n_second
FROM f JOIN s ON f.k IS NOT DISTINCT FROM s.k
ORDER BY join_key
"""
