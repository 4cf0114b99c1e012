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
* DEFINED: a commit racing :func:`vacuum`. Both sides cooperate
  through an advisory ``flock`` on the manifest inode — each commit
  appends under a shared lock and re-opens if the manifest was
  rewritten underneath it (inode check), while ``vacuum`` holds the
  exclusive lock across its read -> rewrite -> rename. A racing commit
  therefore lands either before the compaction (and is carried into
  the rewritten manifest) or after it (appended to the new file);
  it is never lost. Enforced by an interleaved writer-during-vacuum
  test, not just contract prose.
* READERS vs :func:`vacuum`: the manifest swap itself is safe (atomic
  rename — a reader resolves either snapshot), but ``read_committed``
  lists files eagerly while ``spark.read.json`` consumes them lazily:
  a reader that resolved a pre-truncate (or superseded-epoch) snapshot
  before vacuum runs can have its DATA FILES deleted mid-read. The
  operational contract is therefore: vacuum's quiet window must cover
  in-flight READERS of superseded snapshots, or pass
  ``min_age_seconds`` >= the longest reader duration — which is a true
  guarantee because the window is measured from SUPERSESSION (the
  tombstone a vacuum records the first time it sees a file
  unreferenced), not from file creation: any reader that resolved the
  file while it was referenced started before its tombstone, so it
  finishes inside the window (the table-format retention discipline).

Retention: without :func:`vacuum`, the manifest grows one line per
commit forever and a ``truncate`` leaves superseded data files on disk
unreachable — acceptable for fixture-scale paths, but long-lived paths
should vacuum on a maintenance cadence.
"""

from __future__ import annotations

import fcntl
import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)


@dataclass
class _Staged(WriterCommitMessage):
    filename: str
    rows: int


def _open_staged(path: str) -> tuple[str, str]:
    staging = os.path.join(path, "_staging")
    os.makedirs(staging, exist_ok=True)
    name = f"part-{uuid.uuid4().hex}.jsonl"
    return name, os.path.join(staging, name)


def _wire_line(d: dict) -> str:
    for k, v in d.items():
        if hasattr(v, "isoformat"):
            d[k] = v.isoformat()
    return json.dumps(d, sort_keys=True) + "\n"


def _stage_partition(path: str, iterator) -> _Staged:
    """Task side: serialize the partition to one staged JSONL file
    (pickled-Row iterator form — kept for direct callers/tests; the
    writers use the Arrow form below)."""
    name, full = _open_staged(path)
    n = 0
    with open(full, "w") as f:
        for row in iterator:
            f.write(_wire_line(row.asDict(recursive=True)))
            n += 1
    return _Staged(filename=name, rows=n)


def _stage_partition_arrow(path: str, batches) -> _Staged:
    """Arrow-batch twin of :func:`_stage_partition`: rows cross the
    JVM->Python boundary as Arrow record batches (no per-row pickle /
    Row construction), then serialize through the SAME `_wire_line`
    encoder — `RecordBatch.to_pylist` yields the same Python values
    (int/float/str/None/datetime) as the pickled-Row `asDict` path, so
    the staged JSONL bytes are identical."""
    name, full = _open_staged(path)
    n = 0
    with open(full, "w") as f:
        for batch in batches:
            rows = batch.to_pylist()
            f.writelines(_wire_line(d) for d in rows)
            n += len(rows)
    return _Staged(filename=name, rows=n)


def _locked_manifest_fd(manifest: str, exclusive: bool) -> int:
    """Open the LIVE manifest and ``flock`` it; caller ``os.close``-s
    the fd to release. The inode re-check loop is what composes commits
    with :func:`vacuum`: vacuum rewrites the manifest to a NEW inode
    under the exclusive lock, so a waiter whose fd points at the dead
    inode re-opens the live path instead of writing into the discarded
    file. Advisory ``flock`` is sufficient because every manifest
    mutation in this module goes through this helper (local/NFS-
    coherent filesystem, same caveat as the O_APPEND line discipline)."""
    flag = fcntl.LOCK_EX if exclusive else fcntl.LOCK_SH
    while True:
        fd = os.open(manifest, os.O_RDWR | os.O_CREAT | os.O_APPEND, 0o644)
        keep = False
        try:
            fcntl.flock(fd, flag)
            st_fd = os.fstat(fd)
            try:
                st_path = os.stat(manifest)
            except FileNotFoundError:
                continue  # swapped+unlinked under us; retry on the live path
            if (st_fd.st_ino, st_fd.st_dev) == (st_path.st_ino, st_path.st_dev):
                keep = True
                return fd
            # vacuum swapped the inode while we waited; reopen
        finally:
            if not keep:
                os.close(fd)  # releases the flock


def _promote(path: str, messages, ledger_key: str, truncate: bool = False) -> None:
    """Driver side: move staged files into place and APPEND one manifest
    line recording them under ``ledger_key``. Idempotent per key via
    last-key-wins at read time (a replayed streaming epoch supersedes
    its own entry); ``truncate`` marks an overwrite commit that
    invalidates all earlier entries.

    The whole promote (data-file renames + the single O_APPEND line
    write) runs under the SHARED manifest lock: concurrent committers
    interleave whole lines instead of clobbering each other, and
    :func:`vacuum` (exclusive lock) can never observe the half-state
    where a data file is promoted but its manifest line not yet
    appended — which is what makes vacuum's unreferenced-file deletion
    safe against racing commits."""
    manifest = os.path.join(path, "_manifest")
    fd = _locked_manifest_fd(manifest, exclusive=False)
    try:
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


class _WireBatchWriter(DataSourceArrowWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options["path"]
        self.overwrite = overwrite
        # Fresh key per job: successive mode("append") saves accumulate
        # manifest entries instead of silently replacing a fixed key.
        self.job_key = f"batch-{uuid.uuid4().hex}"

    def write(self, iterator) -> _Staged:
        return _stage_partition_arrow(self.path, iterator)

    def commit(self, messages) -> None:
        _promote(
            self.path, messages, ledger_key=self.job_key, truncate=self.overwrite
        )

    def abort(self, messages) -> None:
        _discard(self.path, messages)


class _WireStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator) -> _Staged:
        return _stage_partition_arrow(self.path, iterator)

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


def vacuum(path: str, min_age_seconds: float = 0.0) -> dict:
    """Compact the append-only manifest and delete unreachable data.

    Rewrites ``_manifest`` to exactly its RESOLVED entries (last key
    wins, truncate applied) via an atomic tmp+rename — readers racing
    the rewrite see either the old or the new file, and both resolve to
    the same committed set — then deletes every data file no resolved
    entry references (superseded epochs, pre-truncate snapshots) plus
    any abandoned ``_staging`` stragglers.

    Writer exclusion is ENFORCED, not contractual: the read -> listing
    -> rewrite -> rename happens under the EXCLUSIVE manifest ``flock``
    while every commit runs its promote+append under the SHARED lock
    (:func:`_promote`), so a racing commit serializes either entirely
    before the compaction snapshot (its line is carried into the
    rewritten manifest, its data file is referenced) or entirely after
    the rename (its line appends to the new file, its data file never
    appears in vacuum's under-lock listing) — no committed batch can be
    dropped and no just-promoted data file can be swept. Concurrent
    vacuums serialize the same way (the second re-reads the first's
    output via the inode loop).

    ``min_age_seconds`` is the reader/straggler-retention window, and
    for DATA files it is measured from **supersession, not creation**:
    the first vacuum that observes a file unreferenced records a
    tombstone (``_tombstones``, rewritten under the same exclusive
    lock), and the file is deleted only once ``min_age_seconds`` has
    elapsed since that first observation. Creation mtime is the wrong
    clock — ``os.replace`` preserves the staging-write mtime, so a
    file superseded an hour after it was written would look "old"
    immediately. With tombstone age, ``min_age_seconds`` >= the
    longest reader duration is a TRUE guarantee: any reader that
    resolved a snapshot while the file was still referenced started
    before the tombstone was recorded, so it finishes inside the
    window. STAGING stragglers keep mtime age (their relevant clock IS
    creation: a staging file older than the longest write-JOB duration
    cannot still be promoted). 0 deletes immediately — only safe when
    the quiet window covers readers and whole write JOBS, not just
    commits.

    Returns counts: ``{"manifest_lines_before", "manifest_lines_after",
    "data_files_deleted", "staging_files_deleted",
    "data_files_retained", "staging_files_retained"}``.
    """
    manifest = os.path.join(path, "_manifest")
    staging = os.path.join(path, "_staging")
    tombstones = os.path.join(path, "_tombstones")
    fd = _locked_manifest_fd(manifest, exclusive=True)
    try:
        with open(manifest) as f:
            lines_before = sum(1 for _ in f)
        entries = _manifest_entries(path)
        referenced = {name for names in entries.values() for name in names}
        # Deletion candidates are listed UNDER the lock: no promote is
        # mid-flight here, so unreferenced == truly unreachable.
        candidates = [
            name
            for name in os.listdir(path)
            if name not in ("_manifest", "_staging", "_tombstones")
            and name not in referenced
            and name.startswith("part-")
            and name.endswith(".jsonl")
        ]
        staging_candidates = os.listdir(staging) if os.path.isdir(staging) else []

        now = time.time()
        # Tombstone ledger: name -> first time a vacuum saw it
        # unreferenced. Pruned to current candidates (uuid file names
        # are never re-referenced), rewritten atomically under the
        # exclusive lock so concurrent vacuums serialize on it too.
        tomb: dict[str, float] = {}
        if os.path.exists(tombstones):
            try:
                with open(tombstones) as f:
                    tomb = json.load(f)
            except (ValueError, OSError):
                # A corrupt/truncated sidecar (external edit, non-atomic
                # backup restore) must not brick every future vacuum;
                # treating it as empty only RESETS first-seen clocks,
                # which errs toward retaining files longer — safe.
                tomb = {}
        first_seen = {name: tomb.get(name, now) for name in candidates}
        data_deleted = data_retained = 0
        for name in candidates:
            if now - first_seen[name] < min_age_seconds:
                data_retained += 1
                continue
            try:
                os.remove(os.path.join(path, name))
            except FileNotFoundError:
                pass
            data_deleted += 1
            del first_seen[name]
        tmp = tombstones + ".tmp"
        with open(tmp, "w") as f:
            json.dump(first_seen, f)
        os.replace(tmp, tombstones)

        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            for key, files in entries.items():
                f.write(json.dumps({"key": key, "files": files}) + "\n")
        os.replace(tmp, manifest)
    finally:
        os.close(fd)

    staging_deleted = staging_retained = 0
    for name in staging_candidates:
        full = os.path.join(staging, name)
        try:
            if now - os.stat(full).st_mtime < min_age_seconds:
                staging_retained += 1
                continue
            os.remove(full)
            staging_deleted += 1
        except FileNotFoundError:
            pass
    return {
        "manifest_lines_before": lines_before,
        "manifest_lines_after": len(entries),
        "data_files_deleted": data_deleted,
        "staging_files_deleted": staging_deleted,
        "data_files_retained": data_retained,
        "staging_files_retained": staging_retained,
    }


def read_committed(spark, path: str, schema: str):
    """Read back ONLY manifest-committed output, with a declared schema
    (never inferSchema — sources/batch.py discipline)."""
    files = committed_files(path)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
