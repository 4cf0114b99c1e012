"""Shared TPC-H exact-decimal building blocks — the single copy.

The three TPC-H plan modules (tpch_queries / tpch_extra_queries /
tpch_wide_queries) previously re-declared the parity-critical
disc_price formula and its DuckDB SQL twin verbatim; these constants
DEFINE the cross-engine float protocol, so an edit that landed in one
copy and missed the others would silently desynchronize a module's
Spark plans from its oracles (the exact wrongness class the round-7
de-triplication removes — same treatment as the Gopher rules in
functions/quality_rules.py and the banding SQL in plans/oracle_text.py).

Protocol recap (see tpch_queries module docstring for the full story):
monetary folds run in exact decimal — extendedprice at scale 6 times
(1 ± rate) at DECIMAL(8,6) — and only the FINAL aggregate is cast to
double via DECIMAL(38,6), so both engines sum identical exact values
in any order. The helpers are functions (not module-level Columns)
because Column construction needs an active SparkContext.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from streaming_data_pipeline_spark.sources.batch import load_table

D6 = "decimal(18,6)"


def t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def disc_price() -> Column:
    return F.col("l_extendedprice").cast(D6) * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(8,6)")


def charge() -> Column:
    return disc_price().cast("decimal(24,8)") * (
        F.lit(1.0) + F.col("l_tax")
    ).cast("decimal(8,6)")


SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(8,6))"
)
SQL_CHARGE = (
    f"CAST({SQL_DISC_PRICE} AS DECIMAL(24,8)) * CAST(1.0 + l_tax AS DECIMAL(8,6))"
)


def d38_double(c: Column) -> Column:
    """The final-aggregate cast of the protocol: exact decimal sum ->
    DECIMAL(38,6) -> double (both engines produce the identical IEEE
    value because the decimal is identical)."""
    return c.cast("decimal(38,6)").cast("double")
