"""Spark 4 Python DataSource SINK: the producer's publish side as a
``format("wire_sink")`` with a real two-phase commit.

The reference publishes wire events one JSON message at a time from the
driver (web-application.py publish_to_pubsub; Streamingdag.py:288-294 is
the consuming end). Re-expressed Spark-first, publishing is a *sink*:
each task serializes its partition to JSON lines and stages it under
``_staging/`` with a unique name; the driver's ``commit()`` promotes the
staged files and appends them to ``_manifest`` in one pass. Readers
(:func:`read_committed`) list the manifest, not the directory — so a
task that ran twice (speculation, retry) or a batch that aborted leaves
stragglers in ``_staging/`` that are never visible: exactly-once output
from at-least-once task execution, the same ledger discipline as
Spark's own FileStreamSink and the foreachBatch upsert sink
(plans/streaming_queries.py).

Both the batch writer and the stream writer reuse one staging core; the
stream commit stamps the epoch's batchId into the manifest line, so a
replayed microbatch (restart between sink-commit and source-commit)
overwrites its own entry idempotently instead of double-publishing.

At scale: tasks write independently (no driver data path), commit is
O(tasks) driver metadata work, and the manifest is append-only — the
pattern holds at any fan-in.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _Staged(WriterCommitMessage):
    filename: str
    rows: int


def _stage_partition(path: str, iterator) -> _Staged:
    """Task side: serialize the partition to one staged JSONL file."""
    staging = os.path.join(path, "_staging")
    os.makedirs(staging, exist_ok=True)
    name = f"part-{uuid.uuid4().hex}.jsonl"
    n = 0
    with open(os.path.join(staging, name), "w") as f:
        for row in iterator:
            d = row.asDict(recursive=True)
            for k, v in d.items():
                if hasattr(v, "isoformat"):
                    d[k] = v.isoformat()
            f.write(json.dumps(d, sort_keys=True) + "\n")
            n += 1
    return _Staged(filename=name, rows=n)


def _promote(path: str, messages, ledger_key: str) -> None:
    """Driver side: move staged files into place and record them under
    ``ledger_key`` in the manifest (idempotent per key — a replayed
    streaming batch replaces its own entry)."""
    manifest = os.path.join(path, "_manifest")
    entries: dict[str, list[str]] = {}
    if os.path.exists(manifest):
        with open(manifest) as f:
            for line in f:
                e = json.loads(line)
                entries[e["key"]] = e["files"]
    files = []
    for m in messages:
        if m is None:
            continue
        src = os.path.join(path, "_staging", m.filename)
        dst = os.path.join(path, m.filename)
        os.replace(src, dst)
        files.append(m.filename)
    entries[ledger_key] = files
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        for k, v in entries.items():
            f.write(json.dumps({"key": k, "files": v}) + "\n")
    os.replace(tmp, manifest)


def _discard(path: str, messages) -> None:
    for m in messages:
        if m is None:
            continue
        try:
            os.remove(os.path.join(path, "_staging", m.filename))
        except FileNotFoundError:
            pass


class _WireBatchWriter(DataSourceWriter):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator) -> _Staged:
        return _stage_partition(self.path, iterator)

    def commit(self, messages) -> None:
        _promote(self.path, messages, ledger_key="batch")

    def abort(self, messages) -> None:
        _discard(self.path, messages)


class _WireStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator) -> _Staged:
        return _stage_partition(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:
        _promote(self.path, messages, ledger_key=f"epoch-{batchId}")

    def abort(self, messages, batchId: int) -> None:
        _discard(self.path, messages)


class WireSinkDataSource(DataSource):
    """``df.write.format("wire_sink").option("path", dir).save()`` /
    ``df.writeStream.format("wire_sink")...`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "wire_sink"

    def writer(self, schema, overwrite: bool) -> _WireBatchWriter:
        return _WireBatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> _WireStreamWriter:
        return _WireStreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(WireSinkDataSource)


def committed_files(path: str) -> list[str]:
    """Absolute paths of every manifest-committed file (staged/orphaned
    files are invisible by construction)."""
    manifest = os.path.join(path, "_manifest")
    if not os.path.exists(manifest):
        return []
    out = []
    with open(manifest) as f:
        for line in f:
            for name in json.loads(line)["files"]:
                out.append(os.path.join(path, name))
    return out


def read_committed(spark, path: str, schema: str):
    """Read back ONLY manifest-committed output, with a declared schema
    (never inferSchema — sources/batch.py discipline)."""
    files = committed_files(path)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
