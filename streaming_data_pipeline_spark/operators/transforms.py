"""The core ETL transform chain (SURVEY.md §2.2-2.3, T1-T9 + E1-E4).

Reference: the ``ParsePubSubMessage`` DoFn (Streamingdag.py:159-236) — a
per-record parse/validate/coerce/enrich/filter. Here each step is a pure
DataFrame->DataFrame function built from Column expressions, so:

- Catalyst folds the whole chain into one whole-stage-codegen'd project +
  filter over the scan (no Python on the hot path, ~10-100x the DoFn's
  row-at-a-time throughput);
- the SAME functions apply to ``spark.read`` and ``spark.readStream``
  (batch/streaming symmetry, SURVEY.md §7);
- filters composed here are pushed down to the parquet scan by Catalyst.

Determinism: the reference stamps ``processed_at = utcnow()``
(Streamingdag.py:183-184). Every function takes an optional fixed ``as_of``
wall-clock injection point; `None` means real processing time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streaming_data_pipeline_spark.functions.scalars import (
    data_quality_score,
    event_hour_lenient,
    message_length,
    truthy_str,
)
from streaming_data_pipeline_spark.schema import (
    ENRICHED_COLUMNS,
    OPTIONAL_FIELDS,
    REQUIRED_FIELDS,
    WIRE_JSON_SCHEMA,
)

# Parse only the optional pass-through fields out of a JSON props payload.
_OPTIONAL_JSON_SCHEMA = ", ".join(f"{f} STRING" for f in OPTIONAL_FIELDS)


def _processed_at(as_of: str | None) -> Column:
    if as_of is None:
        return F.current_timestamp().cast("timestamp_ntz")
    return F.lit(as_of).cast("timestamp_ntz")


def parse_wire(df: DataFrame, value_col: str = "value") -> DataFrame:
    """T1-T4: bytes/string payload -> parsed struct columns.

    ``from_json`` with the declared schema gives, by construction:
    malformed JSON -> NULL struct (dropped by :func:`validate_required`),
    unknown keys dropped (`ignoreUnknownValues`), absent keys -> NULL
    (Streamingdag.py:166-172, 187-203, 318-321).
    """
    payload = F.col(value_col).cast("string")
    parsed = F.from_json(payload, WIRE_JSON_SCHEMA).alias("e")
    return df.select(parsed).select("e.*")


def validate_required(df: DataFrame) -> DataFrame:
    """T5: drop records missing any required field (Streamingdag.py:175-181).

    Key-presence in the reference == NULL-ness after schema'd from_json.
    (Divergence note: a key explicitly present with JSON null passes the
    reference's presence check but is dropped here; the reference would then
    stringify it to 'None' — we treat that as a bug, not a behavior.)
    """
    cond = F.lit(True)
    for f in REQUIRED_FIELDS:
        cond = cond & F.col(f).isNotNull()
    return df.filter(cond)


def coerce_types(df: DataFrame, as_of: str | None = None) -> DataFrame:
    """T6-T7: stamp processed_at; str() casts + value default 0.0
    (Streamingdag.py:183-195). The wire `timestamp` string is also parsed to
    a real TIMESTAMP_NTZ (lenient: unparseable -> NULL, caught by E2's
    hour fallback)."""
    return (
        df.withColumn("processed_at", _processed_at(as_of))
        .withColumn("id", F.col("id").cast("string"))
        .withColumn("user_id", F.col("user_id").cast("string"))
        .withColumn("event_type", F.col("event_type").cast("string"))
        .withColumn("message", F.col("message").cast("string"))
        .withColumn("value", F.coalesce(F.col("value").cast("double"), F.lit(0.0)))
        .withColumn("event_time_str", F.col("timestamp").cast("string"))
        .withColumn(
            "timestamp",
            F.try_to_timestamp(
                F.regexp_replace(F.col("timestamp").cast("string"), "Z$", "+00:00")
            ).cast("timestamp_ntz"),
        )
    )


def enrich(df: DataFrame) -> DataFrame:
    """E1-E3: message_length, event_hour, data_quality_score
    (Streamingdag.py:206-225). Expects the post-coercion column set; the
    lenient hour parse runs over the original wire string so the
    parse-failure->0 fallback is preserved."""
    return (
        df.withColumn("message_length", message_length(F.col("message")))
        .withColumn("event_hour", event_hour_lenient(F.col("event_time_str")))
        .withColumn(
            "data_quality_score",
            data_quality_score(
                F.col("user_id"),
                F.col("message"),
                F.col("value"),
                # reference scores the RAW wire string's truthiness, not
                # parse success (Streamingdag.py:222)
                truthy_str(F.col("event_time_str")),
            ),
        )
    )


def quality_filter(df: DataFrame, min_score: int = 50) -> DataFrame:
    """E4: keep iff data_quality_score >= 50 (Streamingdag.py:227-231)."""
    return df.filter(F.col("data_quality_score") >= F.lit(min_score))


def wire_pipeline(
    df: DataFrame,
    value_col: str = "value",
    as_of: str | None = None,
    observe_quality: str | None = None,
) -> DataFrame:
    """The full reference chain over a wire-format (JSON text) stream/batch:
    parse -> validate -> coerce -> enrich -> [observe] -> quality-filter ->
    19-col select. Works identically on ``spark.read.json`` batches and
    ``readStream``.

    ``observe_quality``: when set, attaches the health-check
    ``observe()`` node (streaming/pipeline.py) under this metric name
    BETWEEN enrich and the quality filter — the only placement where
    ``low_quality_rows`` measures anything: attached downstream of the
    filter the metric is structurally zero because every sub-50 row is
    already gone."""
    df = parse_wire(df, value_col)
    df = validate_required(df)
    df = coerce_types(df, as_of=as_of)
    df = enrich(df)
    if observe_quality:
        from streaming_data_pipeline_spark.streaming.pipeline import (
            with_quality_observation,
        )

        df = with_quality_observation(df, observe_quality)
    df = quality_filter(df)
    return df.select(*ENRICHED_COLUMNS)


def enrich_raw_events(df: DataFrame, as_of: str | None = None) -> DataFrame:
    """The same chain over the *fixture* raw events table
    (event_id, ts, user_id, event_type, value, props — FIXTURES.md §1).

    Canonical mapping: id=str(event_id), timestamp=ts, message=props (the
    JSON payload text doubles as the message body), user_id=str(user_id);
    the nine optional fields parse out of props (absent -> NULL, unknown
    keys like 'k' dropped — exercising T8/T9).

    CONTRACT DIFFERENCE vs wire_pipeline: no validate_required stage.
    The wire path validates required KEYS of an untrusted JSON payload;
    the fixture table's columns are schema-typed and non-null by the
    generator's invariant (FIXTURES.md), so there is nothing to
    validate — but a fixture regeneration that introduced NULL ts/props
    would surface here as rows the wire path drops (they score <=75 and
    mostly survive the >=50 gate). If that invariant ever changes, add
    the same null-drop to BOTH this chain and the ENRICHED_CTE oracle.
    """
    e = (
        df.withColumn("id", F.col("event_id").cast("string"))
        .withColumn("timestamp", F.col("ts"))
        .withColumn("message", F.col("props"))
        .withColumn("user_id", F.col("user_id").cast("string"))
        .withColumn("value", F.coalesce(F.col("value").cast("double"), F.lit(0.0)))
        .withColumn("processed_at", _processed_at(as_of))
        .withColumn("opt", F.from_json(F.col("props"), _OPTIONAL_JSON_SCHEMA))
    )
    for f in OPTIONAL_FIELDS:
        e = e.withColumn(f, F.col("opt").getField(f))
    e = (
        e.withColumn("message_length", message_length(F.col("message")))
        .withColumn("event_hour", F.coalesce(F.hour("timestamp"), F.lit(0)).cast("long"))
        .withColumn(
            "data_quality_score",
            data_quality_score(
                F.col("user_id"),
                F.col("message"),
                F.col("value"),
                F.col("timestamp").isNotNull(),
            ),
        )
    )
    e = quality_filter(e)
    return e.select(*ENRICHED_COLUMNS)
