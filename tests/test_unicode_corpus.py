"""Unicode-heavy corpus robustness (round 11, fourth axis): multibyte
CJK/emoji, NFC-vs-decomposed combining marks, and RTL text over the
whole surface. The full sweep (tools/unicode_corpus_sweep.py) was
241/244 on first run — the only divergence was character-vs-byte
units: the multimodal payload is the UTF-8 BYTES of the text, so its
oracles must count bytes (DuckDB strlen), not characters (length).
Everything else — tokenizers, fingerprints, regex quality rules,
lang-id, surprisal, BPE char splits — agreed across engines on the
first run and is covered by the committed sweep log.
"""

from __future__ import annotations

import pytest

from tests.conftest import canon, oracle_df

PINNED_QUERIES = [
    # the byte-vs-char fix
    "multimodal_decode_fake",
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    # first-run-green representatives of each charset-sensitive family
    "dedup_exact_text",
    "dedup_unicode_normalized",
    "text_stats_by_lang",
    "gopher_rules_filter",
    "char_diversity_by_source",
    "bpe_train_merges",
    "lang_id_heuristic",
]


@pytest.fixture(scope="module")
def uni_sf(tmp_path_factory):
    from tools.unicode_corpus_sweep import build_unicode_dir

    return build_unicode_dir(str(tmp_path_factory.mktemp("uni_sf")))


@pytest.mark.parametrize("name", PINNED_QUERIES)
def test_pinned_query_matches_oracle_on_unicode_corpus(
    spark, duck, uni_sf, name
):
    import __spark_entry__ as entrymod

    got = entrymod.queries()[name](spark, uni_sf).toPandas()
    spark.catalog.clearCache()
    sql = entrymod.oracle_sql().get(name)
    assert sql is not None, f"{name} lost its oracle"
    want = oracle_df(duck, sql, uni_sf)
    assert len(got) == len(want), (len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns)
    assert canon(got) == canon(want)


def test_unicode_twin_actually_multibyte(uni_sf):
    import os

    import pyarrow.parquet as pq

    texts = pq.read_table(os.path.join(uni_sf, "documents.parquet"))[
        "text"
    ].to_pylist()
    multibyte = [t for t in texts if len(t.encode()) != len(t)]
    assert len(multibyte) >= len(texts) // 2
    import unicodedata

    assert any(unicodedata.normalize("NFC", t) != t for t in texts)


def test_payload_units_are_bytes_not_chars(spark):
    """The unicode axis's one real finding, pinned as a unit test: the
    multimodal payload length is the UTF-8 byte count, so a CJK char
    contributes 3 and an emoji 4 — never 1."""
    from streaming_data_pipeline_spark.operators.multimodal import (
        extract_features,
        with_binary_payload,
    )

    df = spark.createDataFrame([(1, "世界"), (2, "ab")], "doc_id long, text string")
    out = {
        r["doc_id"]: r["n_bytes"]
        for r in extract_features(with_binary_payload(df)).collect()
    }
    assert out == {1: 6, 2: 2}
