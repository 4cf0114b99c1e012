"""Whole-surface robustness sweep over a SKEW/DUPLICATION-heavy corpus.

Third member of the corpus-robustness trilogy (empty, degenerate,
skewed): heavy key skew and mass duplication are the regimes the
100 TB design claims to handle — duplication-heavy corpora are exactly
when near-dup dedup runs, and a heavy-hitter user is the classic
shuffle-skew hazard. This twin of the sf0.001 fixtures manufactures
both, deterministically:

  documents   every doc_id % 5 == 1 gets the TEXT of the corpus's
              first document (a ~20% clone group: one giant token-set
              group, one giant fingerprint cluster, a dense CC clique)
  events      every event_id % 3 == 0 is reassigned to user_id 1
              (a heavy hitter owning ~1/3 of the fact table: long
              per-user windows, a fat streaming-join/state key)
  embeddings  every vec_id % 5 == 1 gets vec 0's embedding (duplicate
              vectors: massive cosine ties, a dense near-dup clique)

TPC-H tables are untouched (their queries assume key uniqueness the
generator guarantees). Both engines read the SAME skewed parquet, so a
red row is either a real robustness failure (candidate blowup, OOM) or
a nondeterminism leak (an under-specified tie the two engines break
differently) — both worth catching before a 1000-executor run.

Usage:
    python tools/skew_corpus_sweep.py [name ...]

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

HEAVY_USER = 1
CLONE_STRIDE = 5  # doc/vec clone mask: id % CLONE_STRIDE == 1
EVENT_STRIDE = 3  # event reassignment mask: event_id % EVENT_STRIDE == 0


def _replace_where(
    table: pa.Table, id_col: str, stride: int, offset: int, col: str, value
) -> pa.Table:
    """Set ``col`` to ``value`` on every row with id % stride == offset."""
    ids = table.column(id_col).to_pylist()
    mask = pa.array([(i % stride) == offset for i in ids], pa.bool_())
    i = table.column_names.index(col)
    field = table.schema.field(i)
    replacement = pa.array([value] * len(table), field.type)
    new = pc.if_else(mask, replacement, table.column(i).combine_chunks())
    return table.set_column(i, field, new)


def build_skew_dir(dst: str, src_sf: str = SRC_SF) -> str:
    """Write the skewed twin of every table into ``dst``."""
    from streaming_data_pipeline_spark.schema import ALL_TABLES

    os.makedirs(dst, exist_ok=True)
    for name in ALL_TABLES:
        t = pq.read_table(os.path.join(src_sf, f"{name}.parquet"))
        if name == "documents":
            t = _replace_where(
                t, "doc_id", CLONE_STRIDE, 1, "text", t.column("text")[0].as_py()
            )
        elif name == "events":
            t = _replace_where(
                t, "event_id", EVENT_STRIDE, 0, "user_id", HEAVY_USER
            )
        elif name == "embeddings":
            t = _replace_where(
                t,
                "vec_id",
                CLONE_STRIDE,
                1,
                "embedding",
                t.column("embedding")[0].as_py(),
            )
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
    return dst


def main() -> int:
    from tools.full_sweep import sweep

    with tempfile.TemporaryDirectory(prefix="spark_graft_skew_sf_") as tmp:
        skew_dir = build_skew_dir(os.path.join(tmp, "sf0"))
        return sweep(skew_dir, set(sys.argv[1:]))


if __name__ == "__main__":
    raise SystemExit(main())
