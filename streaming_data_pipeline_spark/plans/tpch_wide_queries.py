"""TPC-H-shaped coverage, third tranche: the remaining classic query
archetypes the fixtures can express — market-share ratio by year (Q8),
profit by nation x year (Q9), value-concentration HAVING over a global
scalar (Q11), late-shipment conditional counts (Q12), order-count
histogram via left join + double aggregation (Q13), distinct-supplier
counts per part group with NOT-IN exclusion (Q16), OR-of-ANDs predicate
revenue (Q19), semi-join supplier promotion screen (Q20), and the
multi-exists "only late supplier in a multi-supplier order" shape (Q21).

Adaptations (fixture schema lacks partsupp / shipmode / commit and
receipt dates / comments — `TESTDATA.md`):
- Q8/Q9 profit has no ps_supplycost term -> revenue = disc_price.
- Q12's "late" predicate is l_shipdate > o_orderdate + 60 days, and
  l_returnflag stands in for l_shipmode as the grouping column.
- Q16/Q20 use lineitem as the part<->supplier link instead of partsupp.
- Q21 defines "late" as shipping >60 days after order date; the
  exists(other supplier) / not-exists(other LATE supplier) structure is
  preserved but expressed as one order-level aggregation (count of
  distinct suppliers vs distinct late suppliers) — at 100 TB the
  double-EXISTS correlated form would rescan lineitem twice, while the
  aggregate form is a single shuffle on l_orderkey.

Float protocol follows plans/tpch_queries.py (exact DECIMAL sums; round
only at comparison boundaries). All dims broadcast; fact-fact joins rely
on AQE. Reference has no joins at all (SURVEY.md §2.11) — this module is
part of the engine's relational-completeness surface.
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


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_3-supplier share of AMERICA's ECONOMY-part
    revenue per order year. The share is a conditional-sum ratio over
    one aggregate pass; both nation chains broadcast."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n_cust = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    vol = F.col("volume")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _disc_price().alias("volume"),
            F.col("supp_nation"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                _D38_DOUBLE(
                    F.sum(F.when(F.col("supp_nation") == "NATION_3", vol))
                )
                / _D38_DOUBLE(F.sum(vol)),
                6,
            ).alias("mkt_share"),
            _D38_DOUBLE(F.sum(vol)).alias("total_volume"),
        )
        .orderBy("o_year")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit per supplier nation per year for parts whose
    name contains 'red' (no ps_supplycost in fixtures -> profit =
    discounted revenue). part+supplier+nation broadcast."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(_D38_DOUBLE(F.sum(_disc_price())).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q11_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part shipped value, kept iff above 0.01% of the
    global total — HAVING against a broadcast scalar subquery. One
    aggregate feeds both sides, so the fact table is scanned once."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_disc_price()).cast("decimal(38,6)").alias("value_dec")
    )
    total = per_part.agg(
        (F.sum("value_dec") * F.lit(0.0001).cast("decimal(10,6)"))
        .cast("decimal(38,6)")
        .alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("threshold"))
        .select(
            "l_partkey", F.col("value_dec").cast("double").alias("part_value")
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional counts of high/low order priority among
    late shipments (>60 days after order date), grouped by returnflag
    (fixtures have no shipmode). Single shuffle on l_orderkey."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q13_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: orders-per-customer distribution — LEFT OUTER join
    then two cascading aggregations (per-customer count, then histogram
    of counts). The second agg input is already customer-sized."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers per (brand, type, size) for three
    sizes, excluding one brand — lineitem stands in for partsupp as the
    part<->supplier association. countDistinct after a broadcast join."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(9, 19, 49)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q19_or_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunction of brand/size/quantity conjunctions —
    Catalyst keeps the common join key conjunct and evaluates the OR
    post-join on the broadcast part dim."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            _D38_DOUBLE(F.sum(_disc_price())).alias("revenue"),
            F.count("*").alias("line_count"),
        )
    )


def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers who shipped >500 total units of 'blue'
    parts — aggregate-then-semi-join (the HAVING screen shrinks before
    touching the supplier dim; partsupp absent so lineitem is the link)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("blue"))
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    qualified = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_D6)).alias("qty_dec"))
        .filter(F.col("qty_dec").cast("double") > 500.0)
    )
    return (
        supp.join(qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the ONLY late shipper in a
    multi-supplier order. The correlated EXISTS/NOT-EXISTS pair becomes
    one order-level aggregate (distinct suppliers vs distinct late
    suppliers) — a single shuffle on l_orderkey instead of two
    self-join rescans of lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    tagged = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("late"),
    )
    order_stats = tagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    late_pairs = (
        tagged.filter(F.col("late"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        late_pairs.join(
            order_stats.filter(
                (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
            ),
            "l_orderkey",
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


QUERIES = {
    "tpch_q8_market_share": q8_market_share,
    "tpch_q9_product_profit": q9_product_profit,
    "tpch_q11_part_value_concentration": q11_part_value_concentration,
    "tpch_q12_late_shipment_priority": q12_late_shipment_priority,
    "tpch_q13_customer_order_histogram": q13_customer_order_histogram,
    "tpch_q16_supplier_count_by_part": q16_supplier_count_by_part,
    "tpch_q19_or_predicate_revenue": q19_or_predicate_revenue,
    "tpch_q20_promotion_suppliers": q20_promotion_suppliers,
    "tpch_q21_waiting_suppliers": q21_waiting_suppliers,
}


ORACLE = {
    "tpch_q8_market_share": f"""
    WITH vol AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             {_SQL_DISC_PRICE} AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           round(CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume END) AS DECIMAL(38,6)) AS DOUBLE)
                 / CAST(CAST(SUM(volume) AS DECIMAL(38,6)) AS DOUBLE), 6) AS mkt_share,
           CAST(CAST(SUM(volume) AS DECIMAL(38,6)) AS DOUBLE) AS total_volume
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
    "tpch_q9_product_profit": f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
    "tpch_q11_part_value_concentration": f"""
    WITH per_part AS (
      SELECT l_partkey, CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS value_dec
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM per_part
    WHERE value_dec > (
      -- round() before the downscale cast: Spark's precision-loss
      -- decimal multiply rounds HALF_UP to scale 6, while DuckDB's
      -- CAST(DECIMAL(38,12) AS DECIMAL(38,6)) TRUNCATES — without the
      -- round the two thresholds differ by 1e-6 whenever the exact
      -- product's 1e-7 digit is >= 5 (values are positive, so round
      -- half-away-from-zero == HALF_UP)
      SELECT CAST(round(SUM(value_dec) * CAST(0.0001 AS DECIMAL(10,6)), 6)
                  AS DECIMAL(38,6))
      FROM per_part
    )
    ORDER BY part_value DESC, l_partkey
    """,
    "tpch_q12_late_shipment_priority": """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "tpch_q13_customer_order_histogram": """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_q16_supplier_count_by_part": """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (9, 19, 49)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "tpch_q19_or_predicate_revenue": f"""
    SELECT CAST(CAST(SUM({_SQL_DISC_PRICE}) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS line_count
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q20_promotion_suppliers": """
    SELECT s_suppkey, s_name, n_name AS nation
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%blue%'
      GROUP BY l_suppkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 500.0
    )
    ORDER BY s_suppkey
    """,
    "tpch_q21_waiting_suppliers": """
    WITH tagged AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    order_stats AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
      FROM tagged GROUP BY l_orderkey
    ),
    late_pairs AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM tagged WHERE late
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late_pairs
    JOIN order_stats USING (l_orderkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE n_supp >= 2 AND n_late_supp = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
}
