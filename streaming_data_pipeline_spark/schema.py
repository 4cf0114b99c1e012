"""Declared schemas — never inferred (reference enforces schema at write:
``autodetect: False`` + ``ignoreUnknownValues: True``, Streamingdag.py:318-321).

The 19-column enriched event schema mirrors the reference's triple-declared
BigQuery schema (Streamingdag.py:113-135, Streamingdag.py:239-263,
README.md:212-232). Spark type mapping per SURVEY.md §1.3:
STRING->StringType, TIMESTAMP->TimestampNTZType (fixtures are tz-naive
parquet; NTZ matches the DuckDB oracle's naive TIMESTAMP bit-for-bit),
FLOAT->DoubleType, INTEGER->LongType.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Wire-format / producer schema (reference web-application.py:79-89): the six
# always-present fields every producer event carries.
# ---------------------------------------------------------------------------
BASE_EVENT_FIELDS = ["id", "timestamp", "message", "user_id", "event_type", "value"]

# The five REQUIRED-on-ingest keys (validation filter, Streamingdag.py:175-181).
REQUIRED_FIELDS = ["id", "timestamp", "message", "user_id", "event_type"]

# Nine optional pass-through STRING fields (Streamingdag.py:198-199).
OPTIONAL_FIELDS = [
    "source",
    "ip_address",
    "user_agent",
    "page",
    "referrer",
    "product_id",
    "currency",
    "device_id",
    "location",
]

# Schema for parsing the inbound JSON payload. Parsing with an explicit
# schema gives `ignoreUnknownValues` semantics by construction: unknown keys
# are dropped, absent keys yield NULL (SURVEY.md §2.2 T8/T9).
WIRE_JSON_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("timestamp", T.StringType()),  # ISO-8601 text on the wire
        T.StructField("message", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
    + [T.StructField(f, T.StringType()) for f in OPTIONAL_FIELDS]
)

# ---------------------------------------------------------------------------
# Enriched 19-column warehouse schema (the BigQuery sink table analog).
# ---------------------------------------------------------------------------
ENRICHED_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        # NULLABLE by reference semantics (E2): a required-KEY check
        # passes any non-null timestamp STRING, and an unparseable one
        # (try_to_timestamp -> NULL) is KEPT with event_hour's
        # 0-fallback, not dropped — so the typed column can be NULL and
        # such rows land in the null date partition. Declaring it
        # non-null here would misstate the wire contract.
        T.StructField("timestamp", T.TimestampNTZType(), nullable=True),
        T.StructField("message", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("processed_at", T.TimestampNTZType(), nullable=False),
    ]
    + [T.StructField(f, T.StringType()) for f in OPTIONAL_FIELDS]
    + [
        T.StructField("message_length", T.LongType()),
        T.StructField("event_hour", T.LongType()),
        T.StructField("data_quality_score", T.LongType()),
    ]
)

ENRICHED_COLUMNS = [f.name for f in ENRICHED_EVENT_SCHEMA.fields]

# ---------------------------------------------------------------------------
# Fixture schemas (/root/testdata/sf*/; FIXTURES.md). The raw events table is
# the pre-enrichment shape: props is a JSON string exercising the
# optional-field parse path.
# ---------------------------------------------------------------------------
RAW_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
]

LLM_TABLES = ["documents", "embeddings"]

ALL_TABLES = TPCH_TABLES + ["events"] + LLM_TABLES
