"""TPC-H-shaped coverage widening: the query archetypes the fixtures can
express beyond plans/tpch_queries.py — selective scan-aggregate (Q6),
nation-pair multi-join with derived year (Q7), EXISTS / correlated
subqueries (Q4, Q17-adapted, Q2-adapted), group-then-top-k on revenue
(Q10), conditional aggregation (Q14), CTE + scalar-subquery max (Q15),
and anti-join + exact-average threshold (Q22-adapted).

Adaptations (the fixture schema has no partsupp/shipmode/comment/phone):
- Q4's "late" predicate is l_shipdate > o_orderdate (commit/receipt dates
  don't exist); the EXISTS shape is preserved.
- Q17 keeps the correlated 0.2*avg(quantity) per part; l_quantity is
  integral so the avg is an exact double in both engines.
- Q2 becomes "cheapest part per (brand, size)" via a correlated MIN.
- Q22 groups idle above-average-balance customers by nation instead of
  phone prefix; the average threshold goes through an exact DECIMAL sum
  so the boundary compare is bit-identical cross-engine.

Float protocol follows plans/tpch_queries.py (exact DECIMAL sums, round()
only at comparison boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# single shared copy of the exact-decimal protocol (plans/tpch_shared.py)
from streaming_data_pipeline_spark.plans.tpch_shared import (
    D6 as _D6,
    SQL_DISC_PRICE as _SQL_DISC_PRICE,
    d38_double as _D38_DOUBLE,
    disc_price as _disc_price,
    t as _t,
)


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-aggregate; all three predicates reach the
    parquet scan as PushedFilters, no shuffle beyond the final agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _D38_DOUBLE(
                F.sum(
                    F.col("l_extendedprice").cast(_D6)
                    * F.col("l_discount").cast("decimal(8,6)")
                )
            ).alias("revenue"),
            F.count("*").alias("line_count"),
        )
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: two nation lookups on opposite sides of the fact chain
    (supplier nation vs customer nation), year derived from shipdate.
    Both dim chains broadcast; only the lineitem|x|orders join shuffles."""
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rev_pair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair | rev_pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(_D38_DOUBLE(F.sum(_disc_price())).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returns per customer, one quarter,
    top 20. Aggregate on the narrow join output, then broadcast-enrich."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(_D38_DOUBLE(F.sum(_disc_price())).alias("revenue"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "revenue")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional aggregation — promo revenue share for one
    month. part is broadcast into the lineitem scan."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
        F.lit(0).cast("decimal(24,8)")
    )
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.round(
            F.lit(100.0)
            * _D38_DOUBLE(F.sum(promo))
            / _D38_DOUBLE(F.sum(_disc_price())),
            6,
        ).alias("promo_revenue_pct")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: revenue view + scalar-subquery max. The max comparison
    happens on EXACT decimals (never doubles), so ties and equality are
    engine-independent."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(_disc_price()).alias("total_rev_dec")
    )
    max_rev = revenue.agg(F.max("total_rev_dec").alias("m"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_rev_dec == F.col("m"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            _D38_DOUBLE(F.col("total_rev_dec")).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery -> left-semi join;
    'late' is l_shipdate > o_orderdate (fixture has no commit/receipt)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar AVG per part — lineitems below
    20% of their part's average quantity. l_quantity is integral, so
    SUM is exact in a double and avg*0.2 is bit-identical cross-engine."""
    li = _t(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * (F.sum("l_quantity") / F.count("*"))).alias("qty_threshold")
    )
    return (
        li.join(part_avg, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                _D38_DOUBLE(F.sum(F.col("l_extendedprice").cast(_D6))) / 7.0, 6
            ).alias("avg_yearly"),
            F.count("*").alias("line_count"),
        )
    )


def q2_cheapest_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery — parts priced at the
    minimum retail price within their (brand, size). MIN involves no
    arithmetic, so double comparison is exact."""
    part = _t(spark, sf_dir, "part")
    min_price = part.groupBy(
        F.col("p_brand").alias("b"), F.col("p_size").alias("s")
    ).agg(F.min("p_retailprice").alias("min_price"))
    return (
        part.join(
            F.broadcast(min_price),
            (part.p_brand == F.col("b"))
            & (part.p_size == F.col("s"))
            & (part.p_retailprice == F.col("min_price")),
        )
        .select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
        .orderBy("p_brand", "p_size", "p_partkey")
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    orders (anti join against a filtered fact), grouped by nation. The
    threshold is an exact DECIMAL sum divided once, identical in both
    engines. (Every fixture customer has >=1 lifetime order, so the
    original "no orders at all" variant is vacuous here.)"""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
    )
    nation = _t(spark, sf_dir, "nation")
    thr = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("decimal(38,2)")
                .cast("double")
                / F.count("*").cast("double")
            ).alias("avg_bal")
        )
    )
    return (
        cust.join(F.broadcast(thr), F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("n_name")
    )


QUERIES = {
    "tpch_q6_forecast_revenue": q6_forecast_revenue,
    "tpch_q7_volume_shipping": q7_volume_shipping,
    "tpch_q10_returned_items": q10_returned_items,
    "tpch_q14_promo_effect": q14_promo_effect,
    "tpch_q15_top_supplier": q15_top_supplier,
    "tpch_q4_order_priority": q4_order_priority,
    "tpch_q17_small_quantity_revenue": q17_small_quantity_revenue,
    "tpch_q2_cheapest_part_per_brand": q2_cheapest_part_per_brand,
    "tpch_q22_idle_customers": q22_idle_customers,
}

ORACLE = {
    "tpch_q6_forecast_revenue": """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS line_count
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    "tpch_q7_volume_shipping": f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    "tpch_q10_returned_items": f"""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           CAST(CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "tpch_q14_promo_effect": f"""
    SELECT round(100.0
           * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_SQL_DISC_PRICE}
                                ELSE CAST(0 AS DECIMAL(24,8)) END) AS DECIMAL(38,6)) AS DOUBLE)
           / CAST(CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    "tpch_q15_top_supplier": f"""
    WITH revenue AS (
      SELECT l_suppkey, SUM({_SQL_DISC_PRICE}) AS total_rev_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(CAST(total_rev_dec AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue
    FROM revenue JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM revenue)
    ORDER BY s_suppkey
    """,
    "tpch_q4_order_priority": """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "tpch_q17_small_quantity_revenue": """
    WITH part_avg AS (
      SELECT l_partkey AS pk,
             0.2 * (SUM(l_quantity) / COUNT(*)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) / 7.0, 6) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS line_count
    FROM lineitem JOIN part_avg ON l_partkey = pk
    WHERE l_quantity < qty_threshold
    """,
    "tpch_q2_cheapest_part_per_brand": """
    SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
    FROM part p
    WHERE p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2
                           WHERE p2.p_brand = p.p_brand AND p2.p_size = p.p_size)
    ORDER BY p_brand, p_size, p_partkey
    """,
    "tpch_q22_idle_customers": """
    WITH thr AS (
      SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS totacctbal
    FROM customer, thr
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY n_name
    ORDER BY n_name
    """,
}
