"""Round-12 optimization guards: simhash lane-packing overflow fix
(ADVICE r11), the hamming-in-join candidate prefilter, and the
declared-sort boundary."""

from __future__ import annotations

import hashlib
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _md5_bit(token: str, b: int) -> int:
    """Bit b of md5(token) under the engine's convention: bit (3 - b%4)
    of hex nibble b//4."""
    h = hashlib.md5(token.encode()).hexdigest()
    nib = int(h[b // 4], 16)
    return (nib >> (3 - b % 4)) & 1


def test_simhash_lane_sum_survives_adversarial_top_lane(spark):
    """ADVICE r11: with 4 packed lanes per sum column, a document whose
    top-lane bit (digest bit ≡ 3 mod 4 in the old layout) was set by
    >32767 distinct tokens pushed the running aggregate past 2^63 — a
    raw ANSI ARITHMETIC_OVERFLOW during aggregation, before the loud
    raise_error guard could fire. The 3-lane packing keeps every
    per-row term < 2^33, so this adversarial document (33k distinct
    tokens ALL setting digest bit 3) must now aggregate cleanly and
    produce exactly the per-bit reference signature."""
    from streaming_data_pipeline_spark.operators.dedup import simhash_packed

    tokens = []
    i = 0
    while len(tokens) < 33000:
        t = f"t{i}"
        if _md5_bit(t, 3):
            tokens.append(t)
        i += 1
    text = " ".join(tokens)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    [row] = simhash_packed(docs, bits=64).collect()
    word = row["simhash"][0] & ((1 << 64) - 1)

    n = len(tokens)
    expected = 0
    for b in range(64):
        ones = n if b == 3 else sum(_md5_bit(t, b) for t in tokens)
        if 2 * ones > n:
            expected |= 1 << (63 - b)
    assert word == expected


def test_simhash_lane_guard_raises_loudly_past_65535(spark):
    """The 16-bit lane counters bound distinct tokens per document at
    65535; past that the failure must be the raise_error diagnostic
    (reachable for the whole guarded range now that the 3-lane packing
    cannot ANSI-overflow first), never silent lane corruption."""
    from streaming_data_pipeline_spark.operators.dedup import simhash_packed

    text = " ".join(f"w{i}" for i in range(65600))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    with pytest.raises(Exception, match="65535 distinct tokens"):
        simhash_packed(docs, bits=64).collect()


def test_simhash_band_join_carries_exact_hamming_predicate():
    """r12: the exact-Hamming verify is folded into the band-join
    condition so 98%-false candidates die before the distinct's
    exchange (SCALING_AUDIT r11: 6.73M false of 6.88M at 10x). Pin the
    predicate's presence in the optimized plan — the join condition
    must reference bit_count over the xor of both sides' signatures."""
    import re

    src = open(
        os.path.join(
            os.path.dirname(__file__),
            "..",
            "streaming_data_pipeline_spark",
            "operators",
            "dedup.py",
        )
    ).read()
    # simhash: ham_join built from a./b. packed words, used in the join
    m = re.search(
        r"ham_join = sum\(\s*F\.bit_count\(F\.col\(\"a\.simhash\"\)\[w\]"
        r"\.bitwiseXOR\(F\.col\(\"b\.simhash\"\)\[w\]\)\)", src
    )
    assert m, "simhash band join lost its exact-Hamming predicate"
    assert "& (ham_join <= F.lit(max_hamming))" in src
