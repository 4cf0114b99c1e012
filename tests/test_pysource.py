"""Spark 4 Python DataSource producer (sources/pysource.py): batch
partitioning, determinism, filter pushdown, bounded streaming, and the
driver-style oracle parity for all three plans/pysource_queries.py
queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR, assert_query_matches_oracle

from streaming_data_pipeline_spark.sources import pysource


def _read(spark, **opts):
    pysource.register(spark)
    r = spark.read.format("event_synth")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_shape_and_partitions(spark):
    df = _read(spark, num_rows=700, num_partitions=5)
    assert df.count() == 700
    assert df.rdd.getNumPartitions() == 5
    assert [f.name for f in df.schema.fields] == [
        "event_id", "event_type", "user_id", "message", "value", "event_ts",
    ]


def test_batch_read_deterministic(spark):
    a = _read(spark, num_rows=300, num_partitions=3).orderBy("event_id").collect()
    b = _read(spark, num_rows=300, num_partitions=7).orderBy("event_id").collect()
    assert a == b  # partitioning must not change content
    r5 = a[5]
    assert r5.event_type == pysource.EVENT_TYPES[5 % 7]
    assert r5.user_id == "user_%d" % (1 + (5 * 31 + 7) % 50)
    assert r5.value == ((5 * 7919 + 13) % 9900) / 100.0 + 1.0


def test_filter_pushdown_prunes_generation(spark):
    full = _read(spark, num_rows=2100, num_partitions=4)
    pushed = full.filter(
        (F.col("event_type") == "error") & (F.col("event_id") >= 700) & (F.col("event_id") < 1400)
    )
    rows = pushed.collect()
    # error is index 5 of the 7-cycle: indices 5, 12, 19, ... in [700, 1400)
    want = [i for i in range(700, 1400) if i % 7 == 5]
    assert sorted(r.event_id for r in rows) == want
    assert all(r.event_type == "error" for r in rows)
    # The reader clamps the index range before planning partitions, so
    # the scan's input partitions cover only the surviving range.
    reader = pysource._SynthReader({"num_rows": "2100", "num_partitions": "4"})
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

    leftover = list(
        reader.pushFilters(
            [
                EqualTo(("event_type",), "error"),
                GreaterThanOrEqual(("event_id",), 700),
                LessThan(("event_id",), 1400),
            ]
        )
    )
    assert leftover == []  # everything accepted
    parts = reader.partitions()
    assert parts[0].start == 700 and parts[-1].end == 1400
    got = sorted(i for p in parts for (i, *_rest) in reader.read(p))
    assert got == want


def test_unpushable_filter_returned_to_spark(spark):
    reader = pysource._SynthReader({"num_rows": "100"})
    from pyspark.sql.datasource import EqualTo

    leftover = list(reader.pushFilters([EqualTo(("user_id",), "user_9")]))
    assert len(leftover) == 1  # Spark re-applies it post-scan
    # And end-to-end the unpushed predicate still evaluates correctly.
    n = _read(spark, num_rows=500).filter(F.col("user_id") == "user_9").count()
    assert n == sum(1 for i in range(500) if 1 + (i * 31 + 7) % 50 == 9)


def test_stream_reader_offsets_bounded():
    r = pysource._SynthStreamReader({"num_rows": "1000", "rows_per_batch": "300"})
    assert r.initialOffset() == {"index": 0}
    seen = [r.latestOffset()["index"] for _ in range(6)]
    assert seen == [300, 600, 900, 1000, 1000, 1000]  # monotone, capped
    parts = r.partitions({"index": 300}, {"index": 600})
    covered = sorted(i for p in parts for (i, *_rest) in r.read(p))
    assert covered == list(range(300, 600))


@pytest.mark.parametrize(
    "name",
    ["pysource_batch_rollup", "pysource_pushdown_purchases", "pysource_stream_rollup"],
)
def test_pysource_queries_match_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name, SF_DIR)
