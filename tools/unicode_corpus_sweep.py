"""Whole-surface robustness sweep over a UNICODE-heavy text corpus.

Fourth corpus axis (after empty / degenerate / skew): multibyte and
combining-mark text is where character-vs-byte assumptions split two
engines — length() units, regex character classes, charset-dependent
scoring, md5 over re-encoded strings. A multilingual 100 TB crawl is
mostly this. The twin rewrites document text deterministically while
leaving every other table untouched:

  doc_id % 4 == 1   accented Latin: every 3rd token gains diacritics
                    (NFC-composed 'é'/'ü' substitutions)
  doc_id % 4 == 2   CJK + emoji suffix tokens appended
  doc_id % 4 == 3   a combining-mark token (e + U+0301, decomposed)
                    and an RTL token appended
  doc_id % 4 == 0   unchanged ASCII control group

Both engines read the SAME parquet; a red row is a real cross-engine
character-semantics divergence invisible on the ASCII fixtures.

Usage:
    python tools/unicode_corpus_sweep.py [name ...]
"""

from __future__ import annotations

import os
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF = "/root/testdata/sf0.001"

_ACCENTS = str.maketrans({"a": "á", "e": "é", "o": "ö", "u": "ü", "n": "ñ"})
_CJK_SUFFIX = " 世界 数据 模型 🚀 データ"
_COMBINING_SUFFIX = " cafe\u0301 \u05e9\u05dc\u05d5\u05dd"  # e+U+0301 (decomposed), Hebrew RTL


def _unicodeify(doc_id: int, text: str) -> str:
    k = doc_id % 4
    if k == 1:
        toks = text.split(" ")
        toks = [
            t.translate(_ACCENTS) if i % 3 == 0 else t
            for i, t in enumerate(toks)
        ]
        return " ".join(toks)
    if k == 2:
        return text + _CJK_SUFFIX
    if k == 3:
        return text + _COMBINING_SUFFIX
    return text


def build_unicode_dir(dst: str, src_sf: str = SRC_SF) -> str:
    from streaming_data_pipeline_spark.schema import ALL_TABLES

    os.makedirs(dst, exist_ok=True)
    for name in ALL_TABLES:
        t = pq.read_table(os.path.join(src_sf, f"{name}.parquet"))
        if name == "documents":
            ids = t.column("doc_id").to_pylist()
            texts = t.column("text").to_pylist()
            new = pa.array(
                [_unicodeify(i, x) for i, x in zip(ids, texts)],
                t.schema.field("text").type,
            )
            t = t.set_column(
                t.column_names.index("text"), t.schema.field("text"), new
            )
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
    return dst


def main() -> int:
    from tools.full_sweep import sweep

    with tempfile.TemporaryDirectory(prefix="spark_graft_uni_sf_") as tmp:
        uni_dir = build_unicode_dir(os.path.join(tmp, "sf0"))
        return sweep(uni_dir, set(sys.argv[1:]))


if __name__ == "__main__":
    raise SystemExit(main())
