"""Warehouse maintenance operators: small-file compaction.

A streaming append sink (streaming/pipeline.py) writes one parquet file
per task per trigger, so a 60-second cadence (the reference's window
batching, Streamingdag.py:302-308) produces ~1,440 files per partition
per day. At 100 TB the resulting file explosion dominates query planning
(footer reads, task scheduling) long before data volume does; periodic
bin-packing compaction is the standard fix (Delta OPTIMIZE / Iceberg
rewrite_data_files do exactly this).

``compact_partitioned_sink`` rewrites each day-partition of a
date-partitioned parquet sink into ``ceil(partition_bytes /
target_bytes)`` files: read the partition, ``repartition(n)``, write to
a hidden scratch dir, swap directories (two renames with a
crash-recovery pre-pass — see :func:`_recover_crashed_compactions`). Only partitions whose file
count exceeds their target are touched, so steady-state runs are cheap;
the rewrite itself is an executor-parallel scan+write with no shuffle
besides the explicit round-robin repartition.

Local-filesystem note: directory listing and the swap use ``os`` /
``shutil``, which is correct for local[*] and any POSIX-mounted store.
On HDFS/object stores the same listing/rename calls go through the
Hadoop FileSystem API instead (object stores need a commit-marker
protocol since rename is non-atomic there); the compaction *plan* —
per-partition read, repartition(n), write, swap — is unchanged.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def _partition_dirs(base: str, partition_col: str) -> list[str]:
    return sorted(
        d
        for d in os.listdir(base)
        if d.startswith(f"{partition_col}=")
        and os.path.isdir(os.path.join(base, d))
    )


def _data_files(path: str) -> list[str]:
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def _recover_crashed_compactions(base: str, partition_col: str) -> None:
    """Heal the two crash windows of a previous compaction run. Scratch
    dirs are DOT-prefixed (``.date=...compact_tmp|old``) so neither
    Spark's partition discovery nor :func:`_partition_dirs` can mistake
    them for live partitions — a bare ``date=...compact_old`` leftover
    would be read as a bogus partition value and duplicate every row in
    it. A crash between the two swap renames leaves the partition
    ABSENT with its data in ``.compact_old`` → restore it; a crash
    after the swap leaves a fully superseded ``.compact_old`` → drop
    it; an aborted rewrite leaves ``.compact_tmp`` → drop it.

    Upgrade safety: a pre-dot-prefix release named its scratch dirs
    BARE (``date=X.compact_old``), and a crash under that naming
    leaves dirs that DO match :func:`_partition_dirs` and Spark's
    partition discovery — read back as a bogus partition value, every
    row in them duplicated. Sweep those legacy names with the same
    restore/drop rules before any partition listing happens."""
    for d in os.listdir(base):
        legacy = d.startswith(f"{partition_col}=") and (
            d.endswith(".compact_old") or d.endswith(".compact_tmp")
        )
        if not d.startswith(f".{partition_col}=") and not legacy:
            continue
        full = os.path.join(base, d)
        if not os.path.isdir(full):
            continue
        if d.endswith(".compact_old"):
            stem = d[1:] if d.startswith(".") else d
            pdir = os.path.join(base, stem[: -len(".compact_old")])
            if os.path.isdir(pdir):
                shutil.rmtree(full)
            else:
                os.rename(full, pdir)
        elif d.endswith(".compact_tmp"):
            shutil.rmtree(full)


def compact_partitioned_sink(
    spark: SparkSession,
    base: str,
    partition_col: str,
    target_bytes: int = 128 << 20,
) -> list[dict]:
    """Bin-pack every oversized partition of ``base`` down to
    ``ceil(bytes / target_bytes)`` parquet files.

    Returns a per-partition report: ``{partition, files_before,
    files_after, bytes}`` — the manifest a maintenance job logs.
    """
    report: list[dict] = []
    _recover_crashed_compactions(base, partition_col)
    for part in _partition_dirs(base, partition_col):
        pdir = os.path.join(base, part)
        files = _data_files(pdir)
        nbytes = sum(os.path.getsize(os.path.join(pdir, f)) for f in files)
        n_target = max(1, math.ceil(nbytes / target_bytes))
        if len(files) <= n_target:
            report.append(
                {
                    "partition": part,
                    "files_before": len(files),
                    "files_after": len(files),
                    "bytes": nbytes,
                }
            )
            continue
        tmp = os.path.join(base, f".{part}.compact_tmp")
        old = os.path.join(base, f".{part}.compact_old")
        # The partition column is encoded in the directory name, not the
        # files, so read/write the bare partition directory.
        (
            spark.read.parquet(pdir)
            .repartition(n_target)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        success = os.path.join(tmp, "_SUCCESS")
        if os.path.exists(success):
            os.remove(success)
        # Two renames cannot be one atomic exchange on POSIX; the crash
        # window between them leaves the partition absent with its data
        # intact in the dot-prefixed old dir, which the recovery pre-pass
        # above restores on the next run. A reader racing the swap sees
        # the old copy, the new copy, or — between the two renames — NO
        # partition at all (the old copy is dot-hidden by then); callers
        # needing read-during-compact isolation must retry an absent
        # partition or schedule compaction off-peak. A true atomic
        # exchange needs renameat2(RENAME_EXCHANGE), not exposed by
        # os.rename.
        os.rename(pdir, old)
        os.rename(tmp, pdir)
        shutil.rmtree(old)
        report.append(
            {
                "partition": part,
                "files_before": len(files),
                "files_after": len(_data_files(pdir)),
                "bytes": nbytes,
            }
        )
    return report
