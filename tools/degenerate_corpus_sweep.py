"""Whole-surface robustness sweep over a NULL/degenerate-VALUE corpus.

The empty-corpus sweep (tools/empty_corpus_sweep.py) covers the
zero-row edge; this one covers the dirty-row edge: a twin of the
sf0.001 fixtures where every IN-CONTRACT nullable or optional column
is deterministically degraded — NULLs, empty strings, whitespace-only
text — at fixed row strides. Both engines read the SAME degraded
parquet, so any query whose Spark plan and DuckDB oracle disagree here
has a real NULL-semantics parity gap (e.g. Spark's NULL-propagating
concat vs DuckDB's NULL-skipping ||), invisible on the clean fixtures.

Out-of-contract columns are NOT degraded: primary keys, events.ts
(the warehouse events table is post-validation — the wire pipeline's
T3/T5 stages drop rows without a parseable timestamp, so NULL ts
cannot reach it), and the TPC-H date/key columns. In-contract targets:

  events     props (NULL, ''), user_id, value, event_type
  documents  text (NULL, '', whitespace-only), lang, source
  embeddings embedding (whole-array NULL — a failed encoder row)
  lineitem   l_quantity, l_discount
  orders     o_totalprice
  customer   c_acctbal, c_mktsegment

Strides/offsets are fixed constants so the corpus is bit-reproducible;
co-prime strides keep combinations (e.g. NULL user_id + NULL value on
one row) present but rare, like real dirt.

Usage:
    python tools/degenerate_corpus_sweep.py [name ...]

Exit 1 on any error or oracle mismatch.
"""

from __future__ import annotations

import os
import sys
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF = "/root/testdata/sf0.001"

# (table, column, stride, offset, replacement) — replacement None = NULL.
# Strides are primes; offsets stagger the patterns across columns.
DEGRADATIONS: list[tuple[str, str, int, int, object]] = [
    ("events", "props", 7, 0, None),
    ("events", "props", 11, 3, ""),
    ("events", "user_id", 13, 1, None),
    ("events", "value", 5, 2, None),
    ("events", "event_type", 19, 4, None),
    ("documents", "text", 13, 1, None),
    ("documents", "text", 7, 2, ""),
    ("documents", "text", 11, 5, "   "),
    ("documents", "lang", 17, 3, None),
    ("documents", "source", 19, 6, None),
    ("embeddings", "embedding", 17, 4, None),
    ("lineitem", "l_quantity", 29, 2, None),
    ("lineitem", "l_discount", 23, 1, None),
    ("orders", "o_totalprice", 23, 3, None),
    ("customer", "c_acctbal", 13, 4, None),
    ("customer", "c_mktsegment", 17, 5, None),
]


def _degrade(table: pa.Table, col: str, stride: int, offset: int, repl) -> pa.Table:
    i = table.column_names.index(col)
    n = len(table)
    mask = pa.array([(r % stride) == offset for r in range(n)], pa.bool_())
    field = table.schema.field(i)
    if repl is None:
        replacement = pa.nulls(n, field.type)
    else:
        replacement = pa.array([repl] * n, field.type)
    new = pc.if_else(mask, replacement, table.column(i).combine_chunks())
    return table.set_column(i, field, new)


def build_degenerate_dir(dst: str, src_sf: str = SRC_SF) -> str:
    """Write the degraded twin of every table into ``dst`` (tables with
    no degradations copy through byte-identically in content)."""
    from streaming_data_pipeline_spark.schema import ALL_TABLES

    os.makedirs(dst, exist_ok=True)
    for name in ALL_TABLES:
        table = pq.read_table(os.path.join(src_sf, f"{name}.parquet"))
        for t, col, stride, offset, repl in DEGRADATIONS:
            if t == name:
                table = _degrade(table, col, stride, offset, repl)
        pq.write_table(table, os.path.join(dst, f"{name}.parquet"))
    return dst


def main() -> int:
    from tools.full_sweep import sweep

    with tempfile.TemporaryDirectory(prefix="spark_graft_degen_sf_") as tmp:
        degen_dir = build_degenerate_dir(os.path.join(tmp, "sf0"))
        return sweep(degen_dir, set(sys.argv[1:]))


if __name__ == "__main__":
    raise SystemExit(main())
