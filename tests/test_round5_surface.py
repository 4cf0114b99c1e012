"""Round-5 surface: banding-completeness guards, wire-sink concurrency
+ vacuum, and the multimodal JPEG decode path."""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR, assert_query_matches_oracle


def test_phash_max_hamming_guard():
    """The 4-chunk pigeonhole is complete only for hamming <= 3; a
    larger threshold must fail loudly instead of silently losing recall
    (the invariant used to live only in a docstring)."""
    from streaming_data_pipeline_spark.operators.dedup import phash_near_dup_pairs

    with pytest.raises(ValueError, match="max_hamming <= 3"):
        phash_near_dup_pairs(None, max_hamming=4)


def test_simhash_max_hamming_guard():
    from streaming_data_pipeline_spark.operators.dedup import simhash_near_dup_pairs

    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dup_pairs(None, chunks=4, max_hamming=4)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dup_pairs(None, chunks=8, max_hamming=9)


def test_wire_sink_two_writer_interleave(tmp_path):
    """Two concurrent committers appending to one manifest: every line
    survives intact (O_APPEND whole-line writes) — no torn lines, no
    lost entries, both writers' files visible afterwards."""
    from streaming_data_pipeline_spark.sources import wire_sink

    path = str(tmp_path / "sink")
    os.makedirs(os.path.join(path, "_staging"), exist_ok=True)

    def _commit_many(writer_id: int) -> None:
        for i in range(50):
            name = f"part-w{writer_id}-{i}.jsonl"
            with open(os.path.join(path, "_staging", name), "w") as f:
                f.write(json.dumps({"w": writer_id, "i": i}) + "\n")
            wire_sink._promote(
                path,
                [wire_sink._Staged(filename=name, rows=1)],
                ledger_key=f"batch-w{writer_id}-{i}",
            )

    threads = [threading.Thread(target=_commit_many, args=(w,)) for w in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    with open(os.path.join(path, "_manifest")) as f:
        lines = [json.loads(line) for line in f]  # every line parses
    assert len(lines) == 100
    assert len(wire_sink.committed_files(path)) == 100


def test_wire_sink_vacuum_compacts_and_deletes_unreachable(tmp_path, spark):
    """After an overwrite, superseded data files are unreachable but on
    disk; vacuum() rewrites the manifest to its resolved entries and
    removes them, and read_committed sees the same rows before/after."""
    from streaming_data_pipeline_spark.sources import wire_sink

    wire_sink.register(spark)
    path = str(tmp_path / "sink")
    df1 = spark.range(5).select(F.col("id").alias("v"))
    df2 = spark.range(5, 8).select(F.col("id").alias("v"))
    df1.coalesce(2).write.format("wire_sink").option("path", path).mode(
        "append"
    ).save()
    df2.coalesce(1).write.format("wire_sink").option("path", path).mode(
        "overwrite"
    ).save()
    # superseded data files linger on disk, invisible to readers
    all_parts = [n for n in os.listdir(path) if n.startswith("part-")]
    assert len(all_parts) > len(wire_sink.committed_files(path))

    stats = wire_sink.vacuum(path)
    assert stats["manifest_lines_after"] == 1
    assert stats["data_files_deleted"] >= 1
    left = [n for n in os.listdir(path) if n.startswith("part-")]
    assert sorted(os.path.join(path, n) for n in left) == sorted(
        wire_sink.committed_files(path)
    )
    got = wire_sink.read_committed(spark, path, "v long")
    assert sorted(r.v for r in got.collect()) == [5, 6, 7]
    # idempotent: a second vacuum is a no-op
    again = wire_sink.vacuum(path)
    assert again["data_files_deleted"] == 0
    assert again["manifest_lines_after"] == 1
