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
supersedes its own entry idempotently instead of double-publishing.

Ledger discipline: the manifest is APPEND-ONLY — each commit appends
exactly one JSON line via a single ``O_APPEND`` write (never a
read-modify-write of the whole file), and readers resolve it
last-key-wins. Consequences:

* batch ``mode("append")`` commits carry a fresh ``batch-<uuid>`` key,
  so successive appends to one path ACCUMULATE entries;
* batch ``mode("overwrite")`` appends a line flagged ``truncate`` that
  invalidates every earlier entry at read time (old data files linger
  but are unreachable, like an overwritten table snapshot);
* a replayed streaming epoch re-appends its fixed ``epoch-<batchId>``
  key and last-key-wins keeps exactly one copy visible;
* two concurrent writers to one path cannot drop each other's entries —
  each appends its own line. (POSIX ``O_APPEND`` single-write lines on
  a local/NFS-coherent filesystem; on object stores you'd swap this
  file for a log table, the protocol is unchanged.)

Concurrency model (single path, multiple writers) — what IS and IS NOT
defined:

* DEFINED: concurrent commits. Each commit is one ``O_APPEND`` write of
  one whole line, so interleaved committers produce a manifest that is
  some serialization of intact lines — no torn lines, no lost entries
  (tests/test_round5_surface.py exercises 2x50 interleaved committers).
  Data-file name collisions cannot occur: every staged file is named
  ``part-<uuid4>``, so two writers never ``os.replace`` the same target.
* DEFINED: concurrent readers. ``read_committed`` resolves whatever
  prefix of the manifest exists at open time — always a consistent
  committed snapshot (commits promote data files BEFORE appending the
  manifest line).
* UNDEFINED ORDER (but never corrupt): a ``truncate`` (overwrite)
  commit racing an ``append`` commit — whichever line lands second
  decides whether the append survives, exactly as two racing jobs
  against any table with snapshot-overwrite semantics.
* NOT ALLOWED concurrently: :func:`vacuum`. Compaction rewrites the
  manifest and deletes unreferenced data files, so it requires a quiet
  window with no in-flight writers (the same operational contract as a
  table-format VACUUM); a commit racing a vacuum can lose its entry.

Retention: without :func:`vacuum`, the manifest grows one line per
commit forever and a ``truncate`` leaves superseded data files on disk
unreachable — acceptable for fixture-scale paths, but long-lived paths
should vacuum on a maintenance cadence.
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


def _promote(path: str, messages, ledger_key: str, truncate: bool = False) -> None:
    """Driver side: move staged files into place and APPEND one manifest
    line recording them under ``ledger_key``. Idempotent per key via
    last-key-wins at read time (a replayed streaming epoch supersedes
    its own entry); ``truncate`` marks an overwrite commit that
    invalidates all earlier entries."""
    manifest = os.path.join(path, "_manifest")
    files = []
    for m in messages:
        if m is None:
            continue
        src = os.path.join(path, "_staging", m.filename)
        dst = os.path.join(path, m.filename)
        os.replace(src, dst)
        files.append(m.filename)
    entry: dict = {"key": ledger_key, "files": files}
    if truncate:
        entry["truncate"] = True
    # One O_APPEND write per commit: concurrent committers interleave
    # whole lines instead of clobbering each other's read-modify-write.
    fd = os.open(manifest, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
    try:
        os.write(fd, (json.dumps(entry) + "\n").encode())
    finally:
        os.close(fd)


def _manifest_entries(path: str) -> dict[str, list[str]]:
    """Resolve the append-only manifest: last key wins; a ``truncate``
    line (overwrite commit) discards everything before it."""
    manifest = os.path.join(path, "_manifest")
    entries: dict[str, list[str]] = {}
    if not os.path.exists(manifest):
        return entries
    with open(manifest) as f:
        for line in f:
            e = json.loads(line)
            if e.get("truncate"):
                entries.clear()
            entries[e["key"]] = e["files"]
    return entries


def _discard(path: str, messages) -> None:
    for m in messages:
        if m is None:
            continue
        try:
            os.remove(os.path.join(path, "_staging", m.filename))
        except FileNotFoundError:
            pass


class _WireBatchWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options["path"]
        self.overwrite = overwrite
        # Fresh key per job: successive mode("append") saves accumulate
        # manifest entries instead of silently replacing a fixed key.
        self.job_key = f"batch-{uuid.uuid4().hex}"

    def write(self, iterator) -> _Staged:
        return _stage_partition(self.path, iterator)

    def commit(self, messages) -> None:
        _promote(
            self.path, messages, ledger_key=self.job_key, truncate=self.overwrite
        )

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
        return _WireBatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> _WireStreamWriter:
        return _WireStreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(WireSinkDataSource)


def committed_files(path: str) -> list[str]:
    """Absolute paths of every manifest-committed file (staged/orphaned
    files are invisible by construction)."""
    out = []
    for names in _manifest_entries(path).values():
        for name in names:
            out.append(os.path.join(path, name))
    return out


def vacuum(path: str) -> dict:
    """Compact the append-only manifest and delete unreachable data.

    Rewrites ``_manifest`` to exactly its RESOLVED entries (last key
    wins, truncate applied) via an atomic tmp+rename — readers racing
    the rewrite see either the old or the new file, and both resolve to
    the same committed set — then deletes every data file no resolved
    entry references (superseded epochs, pre-truncate snapshots) plus
    any abandoned ``_staging`` stragglers. Requires a quiet window with
    no in-flight writers (see the module docstring's concurrency model).

    Returns counts: ``{"manifest_lines_before", "manifest_lines_after",
    "data_files_deleted", "staging_files_deleted"}``.
    """
    manifest = os.path.join(path, "_manifest")
    lines_before = 0
    if os.path.exists(manifest):
        with open(manifest) as f:
            lines_before = sum(1 for _ in f)
    entries = _manifest_entries(path)
    referenced = {name for names in entries.values() for name in names}

    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        for key, files in entries.items():
            f.write(json.dumps({"key": key, "files": files}) + "\n")
    os.replace(tmp, manifest)

    data_deleted = 0
    for name in os.listdir(path):
        if name in ("_manifest", "_staging") or name in referenced:
            continue
        if name.startswith("part-") and name.endswith(".jsonl"):
            os.remove(os.path.join(path, name))
            data_deleted += 1
    staging_deleted = 0
    staging = os.path.join(path, "_staging")
    if os.path.isdir(staging):
        for name in os.listdir(staging):
            os.remove(os.path.join(staging, name))
            staging_deleted += 1
    return {
        "manifest_lines_before": lines_before,
        "manifest_lines_after": len(entries),
        "data_files_deleted": data_deleted,
        "staging_files_deleted": staging_deleted,
    }


def read_committed(spark, path: str, schema: str):
    """Read back ONLY manifest-committed output, with a declared schema
    (never inferSchema — sources/batch.py discipline)."""
    files = committed_files(path)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
