"""Spark 4 ``transformWithStateInPandas`` stateful operator (gated).

``streaming_stateful_user_totals`` (plans/streaming_queries.py) covers
the custom-stateful surface with ``applyInPandasWithState``; this module
carries the same operator on the successor API — ``StatefulProcessor``
with typed ValueState + MapState over the RocksDB state store, the shape
Spark 4 positions for arbitrary stateful logic at scale (per-key state
lives in RocksDB off-heap, not executor memory, so 100 TB keyspaces
spill gracefully).

Environment gate: the TWS driver worker requires the ``protobuf``
package (its state-server protocol is proto-encoded). This container
does not ship it, so ``tws_available()`` probes the import and callers
(tests, future driver rows) skip cleanly when absent — same stub
protocol as the multimodal codec (operators/multimodal.py).

Reference anchor: the reference's only stateful surface is window
batching (Streamingdag.py:302-308); per-user running state is north-star
territory (SURVEY.md SS2.11 "stateful streaming ops — none").
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """True iff the transformWithStateInPandas protocol deps exist."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        return False
    return True


def user_type_stats_tws(stream: DataFrame) -> DataFrame:
    """Per-user running event count (ValueState) + per-event-type counts
    (MapState) via transformWithStateInPandas. Output: one Update-mode
    row per (user, batch) with the running ``n_events`` / ``n_types``;
    both are monotone, so the final answer per user is the max row —
    deterministic under any batch split.

    Caller must set ``spark.sql.streaming.stateStore.providerClass`` to
    ROCKSDB_PROVIDER before starting the query (TWS refuses the default
    HDFS-backed provider).
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class UserTypeStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._cnt = handle.getValueState("cnt", "cnt bigint")
            self._types = handle.getMapState(
                "types", "event_type string", "n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            total = self._cnt.get()[0] if self._cnt.exists() else 0
            for pdf in rows:
                total += len(pdf)
                for et, c in pdf.groupby("event_type").size().items():
                    cur = (
                        self._types.getValue((et,))[0]
                        if self._types.containsKey((et,))
                        else 0
                    )
                    self._types.updateValue((et,), (cur + int(c),))
            self._cnt.update((total,))
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [total],
                    "n_types": [n_types],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTypeStats(),
        outputStructType="user_id bigint, n_events bigint, n_types bigint",
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# transformWithState-shaped entry point over applyInPandasWithState
# (r8 verdict task 7): the SAME StatefulProcessor subclass runs on the
# real Spark 4 state-v2 runtime when the environment allows it, and on
# an emulated handle over applyInPandasWithState's GroupState here.
# ---------------------------------------------------------------------------


class _EmValueState:
    """ValueState emulated over one entry of the per-key JSON store.
    Mirrors pyspark.sql.streaming.ValueState: get() returns the stored
    TUPLE (or None), update() takes a tuple, exists()/clear()."""

    def __init__(self, store: dict, name: str):
        self._store, self._name = store, name

    def exists(self) -> bool:
        return self._name in self._store

    def get(self):
        v = self._store.get(self._name)
        return tuple(v) if v is not None else None

    def update(self, value) -> None:
        self._store[self._name] = list(value)

    def clear(self) -> None:
        self._store.pop(self._name, None)


class _EmMapState:
    """MapState emulated over one entry of the per-key JSON store
    (entries as [key_list, value_list] pairs — JSON objects can't key
    on tuples). Mirrors the native MapState surface the processors use:
    containsKey/getValue/updateValue/keys/values/iterator/removeKey."""

    def __init__(self, store: dict, name: str):
        self._entries = store.setdefault(name, [])

    def _find(self, key):
        k = list(key)
        for e in self._entries:
            if e[0] == k:
                return e
        return None

    def exists(self) -> bool:
        return bool(self._entries)

    def containsKey(self, key) -> bool:
        return self._find(key) is not None

    def getValue(self, key):
        e = self._find(key)
        return tuple(e[1]) if e is not None else None

    def updateValue(self, key, value) -> None:
        e = self._find(key)
        if e is None:
            self._entries.append([list(key), list(value)])
        else:
            e[1] = list(value)

    def keys(self):
        for e in self._entries:
            yield tuple(e[0])

    def values(self):
        for e in self._entries:
            yield tuple(e[1])

    def iterator(self):
        for e in self._entries:
            yield tuple(e[0]), tuple(e[1])

    def removeKey(self, key) -> None:
        e = self._find(key)
        if e is not None:
            self._entries.remove(e)

    def clear(self) -> None:
        del self._entries[:]


class _EmListState:
    """ListState emulated over one entry of the per-key JSON store
    (a list of value-tuples-as-lists). Mirrors the native ListState
    surface: get (iterator of tuples), put (replace), appendValue,
    appendList, exists, clear."""

    def __init__(self, store: dict, name: str):
        self._entries = store.setdefault(name, [])

    def exists(self) -> bool:
        return bool(self._entries)

    def get(self):
        for e in self._entries:
            yield tuple(e)

    def put(self, new_state) -> None:
        del self._entries[:]
        self._entries.extend(list(v) for v in new_state)

    def appendValue(self, new_state) -> None:
        self._entries.append(list(new_state))

    def appendList(self, new_state) -> None:
        self._entries.extend(list(v) for v in new_state)

    def clear(self) -> None:
        del self._entries[:]


class EmulatedStatefulProcessorHandle:
    """StatefulProcessorHandle over a plain dict (JSON-serialized into
    the applyInPandasWithState GroupState between micro-batches). State
    type/TTL arguments are accepted for signature parity and ignored —
    values round-trip through JSON, so they must be tuples of JSON
    primitives (ints/floats/strings/bools), which every schema the
    native API accepts ('cnt bigint', 'event_type string', ...) is."""

    def __init__(self, store: dict):
        self._store = store

    def getValueState(self, state_name: str, schema=None, ttl_duration_ms=None):
        return _EmValueState(self._store, f"v:{state_name}")

    def getMapState(
        self, state_name: str, user_key_schema=None, value_schema=None,
        ttl_duration_ms=None,
    ):
        return _EmMapState(self._store, f"m:{state_name}")

    def getListState(self, state_name: str, schema=None, ttl_duration_ms=None):
        return _EmListState(self._store, f"l:{state_name}")


def _prune_registration_residue(store: dict) -> None:
    """Match the native runtime's storage semantics: cleared or
    never-written state is DROPPED, not persisted (ADVICE r9). The
    handle's map/list accessors setdefault([]) their slot on mere
    registration, so without pruning every key that ever appears would
    carry a JSON blob forever — unbounded state-store growth on a
    long-running stream. Value states ("v:") are exempt: they only
    occupy the store after an explicit update(), and an updated
    empty-tuple value legitimately exists."""
    for k in [k for k, v in store.items() if v == [] and not k.startswith("v:")]:
        del store[k]


def transform_with_state_in_pandas(
    stream: DataFrame,
    key_cols: list[str],
    processor,
    output_struct_type: str,
    output_mode: str = "Update",
    time_mode: str = "None",
    backend: str = "auto",
) -> DataFrame:
    """Named transformWithStateInPandas entry point with a fallback
    runtime (r8 verdict task 7).

    backend='native' dispatches to the real Spark 4 state-v2 operator
    (requires the protobuf state-server protocol — ``tws_available()``);
    'emulated' runs the SAME ``StatefulProcessor`` subclass over
    ``applyInPandasWithState``, with the handle emulated on a single
    JSON-blob GroupState per key (ValueState + MapState + ListState);
    'auto' picks native when available.

    Documented mapping (emulated vs native semantics):
    - ``init(handle)`` runs once per (key, micro-batch) instead of once
      per processor instance — the API contract already requires init to
      be pure state REGISTRATION, which is idempotent, so this is
      observationally equivalent.
    - ``handleInputRows(key, rows, timerValues)`` receives
      ``timerValues=None``: only ``time_mode='None'`` is supported
      (timers need the native runtime's timer service); anything else
      raises rather than silently dropping timers.
    - ``close()`` runs after each key group (native: at task end).
    - State values round-trip through JSON (tuples of primitives) —
      exactly the value shapes the native typed-schema states accept.
    """
    if backend == "auto":
        backend = "native" if tws_available() else "emulated"
    if backend == "native":
        return stream.groupBy(*key_cols).transformWithStateInPandas(
            statefulProcessor=processor,
            outputStructType=output_struct_type,
            outputMode=output_mode,
            timeMode=time_mode,
        )
    if backend != "emulated":
        raise ValueError(f"backend must be auto|native|emulated, got {backend!r}")
    if time_mode != "None":
        raise NotImplementedError(
            "emulated transformWithState supports time_mode='None' only "
            "(timers require the native state-v2 runtime)"
        )

    import json

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter, state: GroupState):
        store = json.loads(state.get[0]) if state.exists else {}
        handle = EmulatedStatefulProcessorHandle(store)
        processor.init(handle)
        try:
            yield from processor.handleInputRows(key, pdf_iter, None)
            _prune_registration_residue(store)
            if store:
                state.update((json.dumps(store),))
            elif state.exists:
                state.remove()
        finally:
            processor.close()

    mode = {"Update": "update", "Append": "append"}.get(output_mode)
    if mode is None:
        raise ValueError(f"unsupported output mode {output_mode!r}")
    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=output_struct_type,
        stateStructType="state string",
        outputMode=mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
