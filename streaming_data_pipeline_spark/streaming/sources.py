"""Streaming sources (SURVEY.md §2.4 / §2.1 S1, W4).

The reference consumes JSON text messages from Pub/Sub
(Streamingdag.py:288-294). The Spark-native analogs:

- ``text_message_stream``: a drop-directory of JSON-lines files — each
  line is one message payload, exactly the Pub/Sub byte-message model.
  (In production this would be ``format("kafka")`` with the same
  downstream chain; the transform functions don't care.)
- ``events_fixture_stream``: the events fixture replayed through the
  streaming engine (parquet streaming source over the existing file).
- ``synthetic_event_stream``: rate-source-driven generator mirroring the
  producer app's distributions (web-application.py:432-471) — the
  streaming twin of sources/generator.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_data_pipeline_spark.session import apply_runtime_confs

# Raw fixture schema with ts as LongType. The fixture has shipped with
# ts as either TIMESTAMP(NANOS) (surfaced as int64 nanos under the
# nanosAsLong conf) or TIMESTAMP(MICROS); declaring LongType surfaces
# the raw int64 in both cases, and the unit is probed per-file from the
# batch reader's footer-derived dtype (see events_fixture_stream).
_RAW_LONG_TS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

EVENT_TYPES = ["login", "logout", "purchase", "page_view", "click", "error", "signup"]


def text_message_stream(spark: SparkSession, drop_dir: str) -> DataFrame:
    """One JSON message per line, column named ``value`` (Pub/Sub analog)."""
    apply_runtime_confs(spark)
    return spark.readStream.format("text").load(drop_dir)


def kafka_message_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """S1 production wiring: the Kafka analog of the reference's
    ReadFromPubSub(subscription=...) (Streamingdag.py:288-294), surfaced
    as the same one-string-column ``value`` frame as
    :func:`text_message_stream`, so the identical
    ``wire_pipeline`` transform chain consumes either source unchanged.

    Requires the spark-sql-kafka connector on the classpath (not bundled
    with a bare pyspark install); without it ``load()`` raises Spark's
    data-source-not-found AnalysisException — callers deploy with
    ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<version>``.

    ``options`` passes connector knobs straight through — most
    importantly ``maxOffsetsPerTrigger`` (per-micro-batch record cap:
    without it, the FIRST batch of a backfill from ``earliest`` tries to
    drain the whole retained topic in one trigger) and
    ``failOnDataLoss`` / ``kafka.security.protocol``-style settings.
    Keys the explicit parameters own (servers, topic, offsets) are
    REJECTED in ``options`` with a ValueError rather than silently
    overridden (ADVICE r10): a caller passing ``startingOffsets`` via
    options would otherwise get 'earliest' with no signal.
    """
    apply_runtime_confs(spark)
    owned = {
        "kafka.bootstrap.servers": "bootstrap_servers",
        "subscribe": "topic",
        "startingoffsets": "starting_offsets",
    }
    conflicts = {
        k: owned[k.lower()] for k in (options or {}) if k.lower() in owned
    }
    if conflicts:
        raise ValueError(
            "kafka_message_stream: these connector options are owned by "
            f"explicit parameters — pass them there instead: {conflicts} "
            "(option key -> parameter name)"
        )
    reader = spark.readStream.format("kafka")
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    raw = (
        reader.option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return kafka_frame_to_wire(raw)


# The wire schema Spark's kafka source emits per record — fixed by the
# connector, restated here so the contract projection below can be
# driven end-to-end by a broker-free stand-in stream (a parquet/file
# stream carrying these exact columns) in tests: everything except the
# socket layer then runs the REAL code path.
KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_frame_to_wire(raw: DataFrame) -> DataFrame:
    """Kafka record frame -> the one-string-column ``value`` wire
    contract. Kafka frames carry (key, value binary, topic, partition,
    offset, timestamp, ...); the wire contract is just the payload text
    — shared by :func:`kafka_message_stream` and the broker-free parity
    test so the projection under test IS the production one."""
    return raw.select(F.col("value").cast("string").alias("value"))


def events_fixture_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay events.parquet through the micro-batch engine with the
    same canonical (ts -> TIMESTAMP_NTZ) conversion as the batch path."""
    apply_runtime_confs(spark)
    # The unit decision is owned by sources/batch.py (one probe shared
    # with load_table, clear error on a missing fixture). The stream
    # schema reads ts as LONG either way; only the nanos case divides.
    from streaming_data_pipeline_spark.sources.batch import events_ts_is_nanos

    micros = (
        F.expr("ts DIV 1000") if events_ts_is_nanos(spark, sf_dir) else F.col("ts")
    )
    # the file-stream source wants a directory: point it at sf_dir and
    # glob-filter to the events file
    raw = (
        spark.readStream.schema(_RAW_LONG_TS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn(
        "ts", F.timestamp_micros(micros).cast("timestamp_ntz")
    )


def synthetic_event_stream(
    spark: SparkSession,
    rows_per_second: int = 100,
    rows_per_batch: int | None = None,
) -> DataFrame:
    """Rate-source generator producing wire-format JSON payloads with the
    producer app's field distributions (purchase rows gain product_id/
    currency, page_view rows gain page/referrer). Deterministic given the
    rate source's monotonically increasing ``value``.

    ``rows_per_batch`` switches to the ``rate-micro-batch`` source:
    batch b carries exactly values [b*N, (b+1)*N) with no wall-clock
    pacing — the oracle-checkable variant (every derived field except
    the event timestamp is a pure function of the value index).
    """
    apply_runtime_confs(spark)
    if rows_per_batch is not None:
        rate = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", rows_per_batch)
            .load()
        )
    else:
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second)
            .load()
        )
    i = F.col("value")
    etype = F.element_at(
        F.array(*[F.lit(t) for t in EVENT_TYPES]), (F.pmod(i, F.lit(len(EVENT_TYPES))) + 1).cast("int")
    )
    base = rate.select(
        F.md5(F.concat(F.lit("evt-"), i.cast("string"))).alias("id"),
        F.date_format(F.col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias("event_ts"),
        F.concat(F.lit("message #"), i.cast("string")).alias("message"),
        F.concat(F.lit("user_"), F.pmod(i, F.lit(50)).cast("string")).alias("user_id"),
        etype.alias("event_type"),
        F.round(F.pmod(i * F.lit(7919) + F.lit(13), F.lit(49999)) / 100.0, 2).alias("value"),
        F.lit("rate_generator").alias("source"),
    )
    payload = F.to_json(
        F.struct(
            F.col("id"),
            F.col("event_ts").alias("timestamp"),
            "message",
            "user_id",
            "event_type",
            "value",
            "source",
            F.when(F.col("event_type") == "purchase", F.lit("prod_42")).alias("product_id"),
            F.when(F.col("event_type") == "purchase", F.lit("USD")).alias("currency"),
            F.when(F.col("event_type") == "page_view", F.lit("/home")).alias("page"),
            F.when(F.col("event_type") == "page_view", F.lit("google")).alias("referrer"),
        )
    )
    return base.select(payload.alias("value"))
