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
