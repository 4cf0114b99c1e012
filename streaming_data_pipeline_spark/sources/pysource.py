"""Spark 4 Python DataSource: the producer app as a first-class source.

The reference generates synthetic wire events in a driver loop and
publishes them one at a time (web-application.py:400-460: event_type
drawn from a fixed list, ``user_id = f"user_{{1..50}}"``, a counter-stamped
message, ``value`` in [1, 100)). Re-expressed Spark-first, the producer
is not a loop — it is a *table*: a custom ``DataSource``
(pyspark.sql.datasource) whose batch reader splits the row-index range
across ``num_partitions`` input partitions and whose stream reader
advances an index offset per microbatch. Every field is a pure function
of the global row index, so:

- the source is **deterministic** (same options -> bit-identical table),
  which makes it oracle-checkable: DuckDB regenerates the identical rows
  from ``range(n)`` with the same integer mixer;
- executors generate their slice **independently** (no driver loop, no
  collect) — at 100 TB this is exactly how you'd synthesize load, one
  partition per task, linear scale-out;
- the stream reader's offset log is just ``{"index": n}``, so
  exactly-once replay after failure is trivial (re-reading a committed
  range regenerates the same rows).

Filter pushdown: the reader accepts ``EqualTo("event_type", ...)`` and
numeric bounds on ``event_id`` via ``pushFilters`` and applies them
*inside the generator loop* — a pushed equality on event_type skips 6/7
of row construction before Spark ever sees a row, the DataSource-API
analog of parquet predicate pushdown (SURVEY.md §4; sources/batch.py
PushedFilters discipline).

Field formulas (shared with the DuckDB oracles in
plans/pysource_queries.py — integer arithmetic only, so Python and
DuckDB produce identical doubles):

    event_type = EVENT_TYPES[i % 7]
    user_id    = 'user_' || (1 + (i * 31 + 7) % 50)
    value      = ((i * 7919 + 13) % 9900) / 100.0 + 1.0
    message    = 'synthetic event #' || i
    event_ts   = TIMESTAMP '2026-01-01 00:00:00' + i seconds
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_TYPES = ["login", "logout", "purchase", "page_view", "click", "error", "signup"]

_BASE_TS = datetime(2026, 1, 1, 0, 0, 0)

SCHEMA = StructType(
    [
        StructField("event_id", LongType(), nullable=False),
        StructField("event_type", StringType(), nullable=False),
        StructField("user_id", StringType(), nullable=False),
        StructField("message", StringType(), nullable=False),
        StructField("value", DoubleType(), nullable=False),
        StructField("event_ts", TimestampType(), nullable=False),
    ]
)


def _row(i: int) -> tuple:
    """One wire event, a pure function of the global index ``i``."""
    return (
        i,
        EVENT_TYPES[i % 7],
        "user_%d" % (1 + (i * 31 + 7) % 50),
        "synthetic event #%d" % i,
        ((i * 7919 + 13) % 9900) / 100.0 + 1.0,
        _BASE_TS + timedelta(seconds=i),
    )


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


class _SynthReaderBase(DataSourceReader):
    """Batch reader: splits [0, n) into even index ranges, generates
    each range executor-side. This base class deliberately does NOT
    implement pushFilters — Spark rejects a reader that advertises
    pushdown while spark.sql.python.filterPushdown.enabled is off, so
    the DataSource picks the pushdown subclass only when the flag is
    set (filters are then applied inside the generator; otherwise
    Spark evaluates them post-scan — same results, more rows built)."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("num_rows", 1000))
        self.p = max(1, int(options.get("num_partitions", 8)))
        # Pushed-filter state: a contiguous surviving event_id range and
        # an optional event_type equality.
        self.lo = 0
        self.hi = self.n
        self.event_type: str | None = None

    def partitions(self) -> list[_RangePartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        span = max(1, (hi - lo + self.p - 1) // self.p)
        return [
            _RangePartition(s, min(s + span, hi)) for s in range(lo, hi, span)
        ] or [_RangePartition(lo, lo)]

    def read(self, partition: _RangePartition):
        # r11 (guide §4.1): the range is generated as Arrow RecordBatches
        # (Spark 4 Python DataSource readers may yield pyarrow batches
        # instead of tuples), so 2 of the 3 per-row costs — Python tuple
        # construction and row pickling across the worker boundary —
        # vanish and the numeric columns are built vectorized. Values
        # are bit-identical to the old per-row generator: same integer
        # formulas in int64, the same IEEE double division, timestamps
        # as microseconds-since-the-naive-base (exactly what the
        # datetime path serialized).
        import numpy as np
        import pyarrow as pa

        want = self.event_type
        if want is None:
            idx = np.arange(partition.start, partition.end, dtype=np.int64)
        else:
            # Pushed event_type equality: the type cycles with period 7,
            # so step straight over the 6/7 non-matching indices.
            try:
                r = EVENT_TYPES.index(want)
            except ValueError:
                return
            first = partition.start + (r - partition.start) % 7
            idx = np.arange(first, partition.end, 7, dtype=np.int64)
        base_us = int(
            (_BASE_TS - datetime(1970, 1, 1)).total_seconds() * 1_000_000
        )
        types = pa.array(EVENT_TYPES, type=pa.string())
        for s in range(0, len(idx), 65536):
            i = idx[s : s + 65536]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(i, type=pa.int64()),
                    types.take(pa.array(i % 7, type=pa.int64())),
                    pa.array(["user_%d" % u for u in 1 + (i * 31 + 7) % 50]),
                    pa.array(["synthetic event #%d" % v for v in i]),
                    pa.array((i * 7919 + 13) % 9900 / 100.0 + 1.0),
                    pa.array(base_us + i * 1_000_000, type=pa.timestamp("us")),
                ],
                names=[
                    "event_id",
                    "event_type",
                    "user_id",
                    "message",
                    "value",
                    "event_ts",
                ],
            )


class _SynthReader(_SynthReaderBase):
    """The pushdown-capable reader (used when the conf allows it)."""

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            col = f.attribute[0] if isinstance(f.attribute, tuple) else f.attribute
            if isinstance(f, EqualTo) and col == "event_type":
                if self.event_type is None or f.value == self.event_type:
                    self.event_type = f.value
                else:
                    # A SECOND, conflicting equality: the reader scans on
                    # the first one it consumed, so this one must go back
                    # to Spark for post-scan re-application (the
                    # conjunction is unsatisfiable -> correctly empty).
                    # Consuming both and keeping only the last would
                    # silently return the last type's rows instead.
                    yield f
            elif isinstance(f, GreaterThanOrEqual) and col == "event_id":
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, GreaterThan) and col == "event_id":
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, LessThan) and col == "event_id":
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual) and col == "event_id":
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f  # not pushed; Spark re-applies it post-scan


class _SynthStreamReader(DataSourceStreamReader):
    """Stream reader: offset = {"index": next_unread}; each microbatch
    admits ``rows_per_batch`` more indices until ``num_rows`` is
    exhausted, then the offset stops advancing (a bounded stream).

    Restart safety: after a checkpoint restart Spark constructs a FRESH
    reader, so any admission counter kept only in instance memory would
    restart at 0 and ``latestOffset`` could return a value below the
    committed position — the engine would then plan a regressed batch
    and later re-emit committed index ranges (duplicates). Two guards
    make the reader restart-safe without any external state:

    * ``_floor``: updated ONLY from INVERTED ``partitions`` calls
      (start > end). An inverted plan is the unique signature of a
      regressed offset — a fresh reader's first ``latestOffset``
      returned a value below the engine's logged frontier, and the
      engine planned (frontier, regressed_latest). That call's START is
      the engine's own committed/logged frontier, so nothing below it
      may ever be re-emitted; every later range is clamped to it.
      Forward calls (start < end) never move the floor — the engine
      plans the same range repeatedly (a (end,end) probe on restart,
      plan + execute, retries), and any per-call advancing clamp
      swallows the legitimate replay of the in-flight batch (found the
      hard way, twice: the replayed batch emitted 0 rows). This rule
      keeps ``partitions`` idempotent for any call sequence.
    * ``latestOffset`` advances from the largest index the engine has
      confirmed through any callback (planned starts/ends, commits), so
      a fresh reader jumps forward to the checkpointed frontier instead
      of recounting admission from 0.

    The two in-memory guards make a SINGLE restart exactly-once. A
    second restart constructs yet another fresh reader whose ``_floor``
    is 0 while the engine's offset log may hold a regressed entry from
    the first restart — the re-emission would then arrive as a normal
    forward plan that no in-memory signal can distinguish. For
    multi-restart exactly-once, pass ``frontier_dir`` (a per-query
    directory, same uniqueness contract as ``checkpointLocation``):
    ``commit`` then persists the confirmed frontier atomically
    (tmp + rename) and every fresh reader resumes ``_latest`` and
    ``_floor`` from it, so the first ``latestOffset`` after any number
    of restarts is >= the committed frontier and committed ranges are
    never re-planned forward. Without the option the behavior is the
    documented single-restart guarantee.
    """

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("num_rows", 1000))
        self.per_batch = int(options.get("rows_per_batch", 250))
        self.p = max(1, int(options.get("num_partitions", 4)))
        self._latest = 0  # largest index seen via any engine callback
        self._floor = 0  # committed frontier evidenced by inverted plans
        self._frontier_path: str | None = None
        frontier_dir = options.get("frontier_dir")
        if frontier_dir:
            import os

            os.makedirs(frontier_dir, exist_ok=True)
            self._frontier_path = os.path.join(frontier_dir, "frontier.json")
            # Crash-window hygiene: a crash between the tmp write and
            # os.replace in _persist_frontier leaves a stray .tmp whose
            # content was never committed (the engine may not have
            # logged that offset). The committed frontier is ONLY ever
            # frontier.json (atomic rename), so the stray is discarded
            # — resuming from it could skip ranges the engine plans to
            # replay; resuming from frontier.json is always >= the last
            # truly committed frontier.
            try:
                os.remove(self._frontier_path + ".tmp")
            except FileNotFoundError:
                pass
            persisted = self._read_frontier()
            self._latest = self._floor = persisted

    def _read_frontier(self) -> int:
        """Durable committed frontier, 0 when absent/unreadable."""
        import json

        if not self._frontier_path:
            return 0
        try:
            with open(self._frontier_path) as fh:
                return max(0, int(json.load(fh)["index"]))
        except (OSError, ValueError, KeyError):
            return 0

    def _persist_frontier(self, index: int) -> None:
        """Atomic monotone write (tmp + rename) of the committed frontier."""
        import json
        import os

        if not self._frontier_path:
            return
        index = max(index, self._read_frontier())
        tmp = self._frontier_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"index": index}, fh)
        os.replace(tmp, self._frontier_path)

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # Monotone admission capped at the configured table size,
        # resumed from the engine-confirmed frontier after a restart.
        self._latest = min(self._latest + self.per_batch, self.n)
        return {"index": self._latest}

    def partitions(self, start: dict, end: dict) -> list[_RangePartition]:
        lo, hi = start["index"], end["index"]
        if lo > hi:
            # Regressed plan: only happens when a fresh reader's first
            # latestOffset fell below the engine's logged frontier (lo).
            self._floor = max(self._floor, lo)
        self._latest = max(self._latest, lo, hi)
        lo = max(lo, self._floor)  # never re-emit below the restart frontier
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        span = max(1, (hi - lo + self.p - 1) // self.p)
        return [_RangePartition(s, min(s + span, hi)) for s in range(lo, hi, span)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end: dict) -> None:
        # Note the committed frontier so admission stays monotone
        # relative to it, and (when frontier_dir is set) persist it so
        # a fresh reader after ANY number of restarts resumes at or
        # above it instead of 0.
        self._latest = max(self._latest, end["index"])
        self._persist_frontier(end["index"])


class EventSynthDataSource(DataSource):
    """``spark.read.format("event_synth")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "event_synth"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> _SynthReaderBase:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        enabled = (
            spark is not None
            and spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
            == "true"
        )
        return (_SynthReader if enabled else _SynthReaderBase)(self.options)

    def streamReader(self, schema: StructType) -> _SynthStreamReader:
        return _SynthStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is safe).

    Also flips the runtime confs (notably
    spark.sql.python.filterPushdown.enabled) so a caller-provided
    session — e.g. the verify driver's — gets the pushdown path too.
    """
    from streaming_data_pipeline_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    spark.dataSource.register(EventSynthDataSource)
