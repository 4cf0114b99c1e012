"""Round-6 surface: enforced vacuum writer-exclusion (flock), the
reader-retention window, frontier mid-write-crash recovery, the
spread_small_scan streaming guard, JPEG DQT self-containment, and the
edit-distance broadcast restricted to block canonicals."""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_query_matches_oracle

# ------------------------------------------------------------- vacuum --


def test_wire_sink_commit_during_vacuum_never_drops_batches(tmp_path):
    """The enforced writer-exclusion contract: one thread commits 40
    batches while another vacuums in a tight loop. Every committed
    batch must survive — its manifest line resolved AND its data file
    on disk — because commits hold the shared manifest flock across
    promote+append and vacuum holds the exclusive lock across
    read+listing+rename (sources/wire_sink.py)."""
    from streaming_data_pipeline_spark.sources import wire_sink

    path = str(tmp_path / "sink")
    os.makedirs(os.path.join(path, "_staging"), exist_ok=True)
    n_batches = 40
    errors: list[Exception] = []

    def _committer() -> None:
        # min_age_seconds=0 below means the racing vacuum may legally
        # sweep a staged-but-not-yet-promoted file (the DOCUMENTED
        # straggler hazard of a zero window) — the committer restages
        # and retries. What must NEVER need a retry or a window is
        # committed state: that is protected by the flock alone.
        try:
            for i in range(n_batches):
                name = f"part-c{i}.jsonl"
                while True:
                    with open(os.path.join(path, "_staging", name), "w") as f:
                        f.write(json.dumps({"i": i}) + "\n")
                    try:
                        wire_sink._promote(
                            path,
                            [wire_sink._Staged(filename=name, rows=1)],
                            ledger_key=f"batch-{i}",
                        )
                        break
                    except FileNotFoundError:
                        continue  # staging swept by the zero-window vacuum
        except Exception as e:  # pragma: no cover - surfaced via assert
            errors.append(e)

    def _vacuumer() -> None:
        # ZERO retention window: every unreferenced file is deletable
        # the instant it is listed, so this exercises the exclusive-
        # lock candidate listing itself — a vacuum that listed
        # candidates without the lock could observe a data file in the
        # promoted-but-not-yet-appended half-state and sweep a
        # committed batch, which the final assertions would catch.
        try:
            for _ in range(25):
                wire_sink.vacuum(path, min_age_seconds=0.0)
        except Exception as e:  # pragma: no cover - surfaced via assert
            errors.append(e)

    # TWO vacuumers: the docstring also claims concurrent vacuums
    # serialize through the exclusive lock + inode re-check loop (the
    # second re-reads the first's rewritten manifest and tombstones).
    threads = [
        threading.Thread(target=_committer),
        threading.Thread(target=_vacuumer),
        threading.Thread(target=_vacuumer),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    entries = wire_sink._manifest_entries(path)
    assert set(entries) == {f"batch-{i}" for i in range(n_batches)}
    for full in wire_sink.committed_files(path):
        assert os.path.exists(full), f"committed file swept: {full}"
    # a final vacuum converges and still keeps all 40
    wire_sink.vacuum(path)
    assert len(wire_sink._manifest_entries(path)) == n_batches


def test_wire_sink_vacuum_retention_window(tmp_path):
    """min_age_seconds retains young unreferenced data files (the
    in-flight-reader window) and young staging stragglers; a later
    vacuum past the window deletes them."""
    from streaming_data_pipeline_spark.sources import wire_sink

    path = str(tmp_path / "sink")
    os.makedirs(os.path.join(path, "_staging"), exist_ok=True)

    def _commit(key: str, name: str) -> None:
        with open(os.path.join(path, "_staging", name), "w") as f:
            f.write(json.dumps({"k": key}) + "\n")
        wire_sink._promote(
            path, [wire_sink._Staged(filename=name, rows=1)], ledger_key=key
        )

    _commit("batch-a", "part-a.jsonl")
    # overwrite supersedes batch-a's file
    with open(os.path.join(path, "_staging", "part-b.jsonl"), "w") as f:
        f.write(json.dumps({"k": "b"}) + "\n")
    wire_sink._promote(
        path,
        [wire_sink._Staged(filename="part-b.jsonl", rows=1)],
        ledger_key="batch-b",
        truncate=True,
    )
    # an abandoned staging straggler (task that never committed)
    with open(os.path.join(path, "_staging", "part-stray.jsonl"), "w") as f:
        f.write("{}\n")

    young = wire_sink.vacuum(path, min_age_seconds=3600)
    assert young["data_files_deleted"] == 0
    assert young["staging_files_deleted"] == 0
    assert young["data_files_retained"] == 1  # part-a (data only)
    assert young["staging_files_retained"] == 1  # the straggler
    assert os.path.exists(os.path.join(path, "part-a.jsonl"))
    assert os.path.exists(os.path.join(path, "_staging", "part-stray.jsonl"))

    old = wire_sink.vacuum(path, min_age_seconds=0)
    assert old["data_files_deleted"] == 1
    assert old["staging_files_deleted"] == 1
    assert not os.path.exists(os.path.join(path, "part-a.jsonl"))
    assert os.path.exists(os.path.join(path, "part-b.jsonl"))


def test_wire_sink_vacuum_retention_is_supersession_age_not_mtime(tmp_path):
    """The retention clock for data files starts at SUPERSESSION (first
    vacuum observation of unreferencedness), not file creation:
    os.replace preserves the staging-write mtime, so a file committed
    hours ago but superseded a second ago must still be retained for
    the full window — otherwise 'min_age_seconds >= longest reader
    duration' is not the guarantee the docstring claims."""
    import time as _time

    from streaming_data_pipeline_spark.sources import wire_sink

    path = str(tmp_path / "sink")
    os.makedirs(os.path.join(path, "_staging"), exist_ok=True)

    with open(os.path.join(path, "_staging", "part-old.jsonl"), "w") as f:
        f.write(json.dumps({"k": "old"}) + "\n")
    wire_sink._promote(
        path,
        [wire_sink._Staged(filename="part-old.jsonl", rows=1)],
        ledger_key="batch-old",
    )
    # the file was CREATED two hours ago (backdate mtime, as os.replace
    # preserves staging mtime in real runs)...
    stale = _time.time() - 7200
    os.utime(os.path.join(path, "part-old.jsonl"), (stale, stale))
    # ...but superseded only NOW
    with open(os.path.join(path, "_staging", "part-new.jsonl"), "w") as f:
        f.write(json.dumps({"k": "new"}) + "\n")
    wire_sink._promote(
        path,
        [wire_sink._Staged(filename="part-new.jsonl", rows=1)],
        ledger_key="batch-new",
        truncate=True,
    )

    # a 1h window must RETAIN it: supersession age ~0 despite mtime 2h
    res = wire_sink.vacuum(path, min_age_seconds=3600)
    assert res["data_files_deleted"] == 0
    assert res["data_files_retained"] == 1
    assert os.path.exists(os.path.join(path, "part-old.jsonl"))
    # the tombstone persists the first-seen time across vacuums
    res2 = wire_sink.vacuum(path, min_age_seconds=3600)
    assert res2["data_files_retained"] == 1
    # once the window has elapsed since the TOMBSTONE, it goes
    tomb_file = os.path.join(path, "_tombstones")
    tomb = json.load(open(tomb_file))
    tomb["part-old.jsonl"] -= 7200
    with open(tomb_file, "w") as f:
        json.dump(tomb, f)
    res3 = wire_sink.vacuum(path, min_age_seconds=3600)
    assert res3["data_files_deleted"] == 1
    assert not os.path.exists(os.path.join(path, "part-old.jsonl"))


# ----------------------------------------------------------- frontier --


def test_frontier_crash_between_tmp_and_rename(tmp_path):
    """Crash window: _persist_frontier died AFTER writing frontier.json.tmp
    but BEFORE os.replace. The stray tmp holds an offset the engine never
    confirmed; the next reader must resume from the committed
    frontier.json (not the tmp, not 0) and clean the stray."""
    from streaming_data_pipeline_spark.sources import pysource

    fdir = tmp_path / "frontier"
    fdir.mkdir()
    (fdir / "frontier.json").write_text(json.dumps({"index": 300}))
    (fdir / "frontier.json.tmp").write_text(json.dumps({"index": 600}))

    r = pysource._SynthStreamReader(
        {"num_rows": "1000", "rows_per_batch": "100", "frontier_dir": str(fdir)}
    )
    assert not os.path.exists(fdir / "frontier.json.tmp")
    # resumes from the truly committed 300: admission continues past it,
    # and a regressed plan below it re-emits nothing
    assert r.latestOffset() == {"index": 400}
    parts = r.partitions({"index": 350}, {"index": 250})
    assert all(p.start >= p.end for p in parts)  # nothing re-emitted

    # the stray did not poison later persistence
    r.commit({"index": 400})
    assert json.load(open(fdir / "frontier.json"))["index"] == 400


def test_frontier_crash_before_first_commit(tmp_path):
    """Crash before the FIRST os.replace: only a stray tmp exists. The
    reader starts from 0 (nothing was ever committed) and removes the
    stray instead of trusting it."""
    from streaming_data_pipeline_spark.sources import pysource

    fdir = tmp_path / "frontier"
    fdir.mkdir()
    (fdir / "frontier.json.tmp").write_text(json.dumps({"index": 750}))

    r = pysource._SynthStreamReader(
        {"num_rows": "1000", "rows_per_batch": "100", "frontier_dir": str(fdir)}
    )
    assert not os.path.exists(fdir / "frontier.json.tmp")
    assert r.latestOffset() == {"index": 100}  # from 0, not 750


def test_frontier_crash_after_rename_resumes_exactly(tmp_path):
    """Crash AFTER os.replace (the commit landed): the next reader
    resumes at exactly the renamed frontier."""
    from streaming_data_pipeline_spark.sources import pysource

    fdir = tmp_path / "frontier"
    fdir.mkdir()
    (fdir / "frontier.json").write_text(json.dumps({"index": 600}))

    r = pysource._SynthStreamReader(
        {"num_rows": "1000", "rows_per_batch": "100", "frontier_dir": str(fdir)}
    )
    assert r.latestOffset() == {"index": 700}


# --------------------------------------------------- spread_small_scan --


def test_spread_small_scan_rejects_streaming(spark):
    """The partition-count probe forces physical planning via the RDD
    bridge, which is undefined for streaming frames — the guard raises
    a clear error instead."""
    from streaming_data_pipeline_spark.sources.batch import spread_small_scan

    stream = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    with pytest.raises(ValueError, match="batch-only"):
        spread_small_scan(stream, "value")


def test_spread_small_scan_still_spreads_batch(spark):
    """Regression guard for the batch path around the new streaming
    check: a 1-partition frame is spread to the session parallelism."""
    from streaming_data_pipeline_spark.sources.batch import spread_small_scan

    df = spark.range(100).coalesce(1)
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert spread_small_scan(df, "id").rdd.getNumPartitions() == n


# --------------------------------------------------------------- JPEG --


def test_jpeg_features_use_payload_dqt(spark):
    """DQT self-containment: a payload whose quant table differs from
    the synth encoder's module constant must dequantize with ITS OWN
    table on the feature path (dc/ac dequant sums), matching a
    first-principles recomputation from the parsed coefficients."""
    from streaming_data_pipeline_spark.operators import multimodal as mm

    wb, hb = 2, 1
    w, h = 8 * wb, 8 * hb
    good = mm._jpeg_encode(w, h, mm._jpeg_coef_blocks(7, wb, hb))

    # Patch the DQT segment in place: 64 zigzag bytes after the Pq/Tq
    # byte each get +3, so the parsed table differs from _JPEG_Q_NAT
    # everywhere while staying valid 8-bit values.
    idx = good.find(b"\xff\xdb")
    assert idx > 0
    body_start = idx + 5  # marker(2) + length(2) + PqTq(1)
    patched = bytearray(good)
    for j in range(64):
        patched[body_start + j] = min(255, patched[body_start + j] + 3)
    patched = bytes(patched)

    pw, ph, coefs, pixels, q = mm._decode_jpeg(patched)
    assert (pw, ph) == (w, h)
    assert q != mm._JPEG_Q_NAT and all(
        q[i] == mm._JPEG_Q_NAT[i] + 3 for i in range(64)
    )
    want_dc = sum(zz[0] * q[0] for zz in coefs)
    want_ac = sum(
        zz[k] * q[mm._ZIGZAG[k]] for zz in coefs for k in range(1, 64)
    )
    stale_dc = sum(zz[0] * mm._JPEG_Q_NAT[0] for zz in coefs)
    assert want_dc != stale_dc  # the old bug would have produced stale_dc

    df = spark.createDataFrame(
        [(1, bytearray(patched))], "doc_id long, payload binary"
    )
    row = mm.decode_jpeg_features(df).collect()[0]
    assert row.dc_dequant_sum == want_dc
    assert row.ac_dequant_sum == want_ac
    assert row.n_blocks == wb * hb


# ------------------------------------------------------- edit distance --


def test_edit_distance_broadcast_is_canonicals_only(spark, duck):
    """The broadcast side of the Levenshtein join must be the block
    canonicals (one row per duplicate block), never the full corpus:
    structural assert on the optimized plan + full oracle parity."""
    from streaming_data_pipeline_spark.functions.text import token_set_fingerprint
    from streaming_data_pipeline_spark.sources.batch import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", token_set_fingerprint(F.col("text")).alias("fp")
    )
    n_docs = docs.count()
    n_canon = (
        docs.groupBy("fp")
        .agg(F.count("*").alias("cnt"), F.min("doc_id").alias("canon_id"))
        .filter(F.col("cnt") > 1)
        .count()
    )
    assert n_canon < n_docs  # the fixture has non-duplicate docs

    import __spark_entry__ as entrymod

    q = entrymod.queries()["dedup_edit_distance_pairs"]
    out = q(spark, SF_DIR)
    # STRUCTURAL assert, on the plan rather than the values (the values
    # are identical under a full-corpus broadcast, so they cannot catch
    # the regression): the canonical-text frame must be built by the
    # LeftSemi join against the duplicate-block aggregate. Reverting
    # canon_text to a bare projection of documents (the 100 TB-fatal
    # full-corpus broadcast) removes both nodes from the optimized
    # logical plan.
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan, plan
    assert "Aggregate" in plan, plan
    # every id_a is a duplicate-block canonical -> the broadcast frame
    # is bounded by the duplicate-block count, not the corpus
    assert out.select("id_a").distinct().count() <= n_canon
    assert_query_matches_oracle(spark, duck, "dedup_edit_distance_pairs", SF_DIR)


# ------------------------------------------------------- recall floors --


def test_ann_retrieval_tier_recall_floors(spark):
    """The tier-selection contract (operators/similarity.py module
    docstring): tiers recommended for RETRIEVAL at scale hold absolute
    recall floors on the fixture — multi-table >= 0.3 at ~25% scan,
    IVF >= 0.7 — while the single-table/multiprobe baselines are held
    to ordering only (each amplification step must help), their low
    absolute recall on near-isotropic data being the documented lesson."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["similarity_recall_at_k"](spark, SF_DIR).collect()
    assert rows
    mean = lambda k: sum(getattr(r, k) for r in rows) / len(rows)  # noqa: E731
    assert mean("multitable_recall") >= 0.3, mean("multitable_recall")
    assert mean("ivf_recall") >= 0.7, mean("ivf_recall")
    assert mean("int8_rerank_recall") == 1.0
    assert mean("pq_adc_recall") >= 0.3
    for r in rows:
        assert r.multitable_recall >= r.multiprobe_recall >= r.lsh_recall


# ------------------------------------------------------- scaling audit --


def test_scaling_candidate_growth_is_linear(spark, tmp_path):
    """The SCALING.md linearity contract at 1/10 audit size: a 10x
    corpus built by per-copy alphabet rotation (intrinsic structure
    exactly linear by construction) must grow minhash and containment
    CANDIDATE pairs with exponent <= 1.3 (10^1.3 ~= 20x) and output
    pairs ~10x (exactly 10x for containment, whose pigeonhole is a
    complete necessary condition; within [9.5, 10.5]x for minhash,
    whose banding recall ~0.985 at the threshold re-rolls per rotated
    copy). Candidates are observed from the production plans via
    dedup.CANDIDATE_OBSERVER."""
    import math

    from tools.scaling_audit import build_tenx, run_family

    src = "/root/testdata/sf0.01"
    tenx = str(tmp_path / "tenx")
    build_tenx(spark, src, tenx)

    for family, qname in (
        ("minhash", "dedup_near_minhash_lsh"),
        ("containment", "dedup_containment_pairs"),
    ):
        lo = run_family(spark, qname, family, src)
        hi = run_family(spark, qname, family, tenx)
        assert lo["candidate_pairs"] and hi["candidate_pairs"]
        e = math.log(hi["candidate_pairs"] / lo["candidate_pairs"]) / math.log(10)
        assert e <= 1.3, (family, lo, hi, e)
        ratio = hi["output_pairs"] / lo["output_pairs"]
        if family == "containment":
            assert hi["output_pairs"] == 10 * lo["output_pairs"], (lo, hi)
        else:
            assert 9.5 <= ratio <= 10.5, (family, lo, hi, ratio)
