"""Join / analytic plans over the TPC-H-ish star schema.

The reference has NO joins, window functions, set ops, rollups, or
row-dedup (declared absences, SURVEY.md §2.11) — a user of a single
denormalized table outgrows that immediately, so the engine ships the
full relational surface, Spark-first:

- dimension joins carry explicit ``F.broadcast`` hints (small dims must
  never shuffle the fact table at 100 TB);
- fact-fact joins rely on AQE (skew-join splitting + partition
  coalescing) rather than hand-tuned shuffles;
- top-k is always ``orderBy().limit(k)`` -> TakeOrderedAndProject, with
  a unique tiebreak column so results are deterministic;
- every float aggregate goes through exact DECIMAL casts (order- and
  engine-independent) or round() at the comparison boundary.

Cross-engine float protocol: fixture prices are 2-decimal values stored
as doubles, so CAST(x AS DECIMAL(18,6)) is exact and identical in Spark
and DuckDB; products of two such decimals stay exact within DECIMAL(38).
The final conversion re-quantizes to DECIMAL(38,6) — a pure
representation change since <=6 decimals are meaningful (never a
downscale: DuckDB truncates where Spark rounds half-up) — and THEN casts
to double, keeping the scaled integer under 2^53 so the int/10^6
conversion is exactly rounded (a direct decimal(38,14)->double cast
double-rounds in DuckDB and diverges from Spark by 1 ULP).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# exact-decimal building blocks: single shared copy (plans/
# tpch_shared.py) — these constants define the cross-engine float
# protocol, so they must not fork between the three TPC-H modules
from streaming_data_pipeline_spark.plans.tpch_shared import (
    D6 as _D6,
    SQL_CHARGE as _SQL_CHARGE,
    SQL_DISC_PRICE as _SQL_DISC_PRICE,
    charge as _charge,
    disc_price as _disc_price,
    t as _t,
)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy partial+final hash aggregate; the
    shipdate filter is pushed to the parquet scan (PushedFilters)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(_D6)).cast("decimal(38,6)").cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(_D6)).cast("decimal(38,6)").cast("double").alias("sum_base_price"),
            F.sum(_disc_price()).cast("decimal(38,6)").cast("double").alias("sum_disc_price"),
            F.sum(_charge()).cast("decimal(38,6)").cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> agg -> top-10.
    customer is broadcast; orders|x|lineitem goes through AQE."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("decimal(38,6)").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join, three broadcast dims, one co-located
    fact-fact join; revenue per nation for one region-year."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("decimal(38,6)").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a fact aggregate feeding a join
    (aggregate-then-join keeps the shuffle on the pre-shrunk side)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_D6)).cast("decimal(38,6)").cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-chain enrichment rollup: orders joined up the customer ->
    nation -> region snowflake, all dims broadcast."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("order_count"),
            F.sum(F.col("o_totalprice").cast(_D6)).cast("decimal(38,6)").cast("double").alias("total_revenue"),
        )
        .orderBy("r_name")
    )


def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers having >=1 order."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


def top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window function: row_number over (customer, price desc)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    )


def monthly_revenue_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame + lag: monthly revenue, previous month, running total."""
    orders = _t(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month"))
        .agg(F.sum(F.col("o_totalprice").cast(_D6)).alias("rev_dec"))
    )
    w_ord = Window.orderBy("month")
    return (
        monthly.withColumn(
            "prev_revenue",
            F.lag("rev_dec").over(w_ord).cast("decimal(38,6)").cast("double"),
        )
        .withColumn(
            "running_revenue",
            F.sum("rev_dec")
            .over(w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("decimal(38,6)")
            .cast("double"),
        )
        .select(
            "month",
            F.col("rev_dec").cast("decimal(38,6)").cast("double").alias("revenue"),
            "prev_revenue",
            "running_revenue",
        )
        .orderBy("month")
    )


def nation_key_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer vs supplier nation keys,
    tagged into one relation."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    tag = lambda df, t: df.distinct().withColumn("op", F.lit(t))  # noqa: E731
    return (
        tag(cust.union(supp), "union")
        .union(tag(cust.intersect(supp), "intersect"))
        .union(tag(cust.subtract(supp), "except"))
        .orderBy("op", "nationkey")
    )


def rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP(status, priority) with grouping_id. The ()-set
    grand-total row survives a zero-row input (standard semantics;
    see plans.base.with_empty_grouping_total)."""
    from streaming_data_pipeline_spark.plans.base import with_empty_grouping_total

    orders = _t(spark, sf_dir, "orders")
    rolled = orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("order_count"),
        F.sum(F.col("o_totalprice").cast(_D6)).cast("decimal(38,6)").cast("double").alias("revenue"),
        F.grouping_id().cast("long").alias("grp"),
    )
    return with_empty_grouping_total(
        rolled,
        orders,
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        F.lit(0).cast("long").alias("order_count"),
        F.lit(None).cast("double").alias("revenue"),
        F.lit(3).cast("long").alias("grp"),
    ).orderBy("grp", "o_orderstatus", "o_orderpriority")


def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE(returnflag, linestatus). The ()-set grand-total
    row survives a zero-row input (standard semantics)."""
    from streaming_data_pipeline_spark.plans.base import with_empty_grouping_total

    li = _t(spark, sf_dir, "lineitem")
    cubed = li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("line_count"),
        F.sum(F.col("l_quantity").cast(_D6)).cast("decimal(38,6)").cast("double").alias("sum_qty"),
    )
    return with_empty_grouping_total(
        cubed,
        li,
        F.lit(None).cast("string").alias("l_returnflag"),
        F.lit(None).cast("string").alias("l_linestatus"),
        F.lit(0).cast("long").alias("line_count"),
        F.lit(None).cast("double").alias("sum_qty"),
    ).orderBy("l_returnflag", "l_linestatus")


def distinct_mktsegments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT as row-dedup (dropDuplicates)."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select("c_mktsegment").dropDuplicates().orderBy("c_mktsegment")


def sql_cte_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + scalar subquery via spark.sql over registered views —
    the pure-SQL entry point (one engine for DataFrame AND SQL)."""
    from streaming_data_pipeline_spark.sources.batch import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH order_rev AS (
          SELECT o_orderpriority,
                 CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
                 COUNT(*) AS order_count
          FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, revenue, order_count,
               round(revenue / (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) FROM orders), 6)
                 AS revenue_share
        FROM order_rev
        ORDER BY o_orderpriority
        """
    )


def asof_last_login_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF style operator (reference lacks it; SURVEY.md §2.11): for
    each event, the value of the same user's most recent prior 'signup'
    event. Expressed as a running last_value window — no join, no extra
    shuffle beyond the per-user repartition, scales linearly."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    signup_val = F.last(
        F.when(F.col("event_type") == "signup", F.col("value")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("last_signup_value", signup_val)
        .select("event_id", "user_id", "event_type", "last_signup_value")
        .orderBy("event_id")
    )


QUERIES = {
    "tpch_q1_pricing_summary": q1_pricing_summary,
    "tpch_q3_shipping_priority": q3_shipping_priority,
    "tpch_q5_local_supplier_volume": q5_local_supplier_volume,
    "tpch_q18_large_volume_customer": q18_large_volume_customer,
    "revenue_by_region": revenue_by_region,
    "customers_with_orders": customers_with_orders,
    "customers_without_orders": customers_without_orders,
    "top_order_per_customer": top_order_per_customer,
    "monthly_revenue_momentum": monthly_revenue_momentum,
    "nation_key_set_ops": nation_key_set_ops,
    "rollup_order_status": rollup_order_status,
    "cube_returnflag_status": cube_returnflag_status,
    "distinct_mktsegments": distinct_mktsegments,
    "sql_cte_priority_revenue": sql_cte_priority_revenue,
    "asof_last_login_value": asof_last_login_value,
}


ORACLE = {
    "tpch_q1_pricing_summary": f"""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM({_SQL_CHARGE}) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
           round(AVG(l_quantity), 4) AS avg_qty,
           round(AVG(l_extendedprice), 4) AS avg_price,
           round(AVG(l_discount), 4) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    "tpch_q3_shipping_priority": f"""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           CAST(CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "tpch_q5_local_supplier_volume": f"""
    SELECT n_name, CAST(CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    "tpch_q18_large_volume_customer": """
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM (
      SELECT l_orderkey,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
    ) big
    JOIN orders ON big.l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE total_qty > 150
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    "revenue_by_region": """
    SELECT r_name,
           CAST(COUNT(*) AS BIGINT) AS order_count,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
    "customers_with_orders": """
    SELECT c_custkey, c_name, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    "customers_without_orders": """
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    "top_order_per_customer": """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn = 1
    ORDER BY o_custkey
    """,
    "monthly_revenue_momentum": """
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
      FROM orders GROUP BY 1
    )
    SELECT month,
           CAST(CAST(rev_dec AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
           CAST(CAST(lag(rev_dec) OVER (ORDER BY month) AS DECIMAL(38,6)) AS DOUBLE) AS prev_revenue,
           CAST(CAST(SUM(rev_dec) OVER (ORDER BY month
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS DOUBLE)
             AS running_revenue
    FROM monthly
    ORDER BY month
    """,
    "nation_key_set_ops": """
    WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer),
         s AS (SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier)
    SELECT nationkey, 'union' AS op     FROM (SELECT nationkey FROM c UNION SELECT nationkey FROM s)
    UNION ALL
    SELECT nationkey, 'intersect' AS op FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
    UNION ALL
    SELECT nationkey, 'except' AS op    FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
    ORDER BY op, nationkey
    """,
    "rollup_order_status": """
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS order_count,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS grp
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    ORDER BY grp, o_orderstatus, o_orderpriority
    """,
    "cube_returnflag_status": """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS line_count,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY l_returnflag, l_linestatus
    """,
    "distinct_mktsegments": "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "sql_cte_priority_revenue": """
    WITH order_rev AS (
      SELECT o_orderpriority,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, revenue, order_count,
           round(revenue / (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) FROM orders), 6)
             AS revenue_share
    FROM order_rev
    ORDER BY o_orderpriority
    """,
    "asof_last_login_value": """
    SELECT event_id, user_id, event_type,
           last_value(CASE WHEN event_type = 'signup' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_signup_value
    FROM events
    ORDER BY event_id
    """,
}
