"""Whole-surface robustness sweep over a ZERO-ROW corpus.

At 100 TB scale an empty input is not an edge case — dynamic-partition
backfills over an hour with no events, a tenant filter that matches
nothing, the first run of an incremental pipeline — so every declared
query must execute (and, where an oracle exists, AGREE with DuckDB)
when all ten tables are present with the exact production schema and
no rows. A query that indexes ``approxQuantile(...)[0]``, divides by a
zero total, or ``first()``s a missing scalar passes every sf sweep and
dies on its first empty partition-range in production; this sweep is
the forcing function that keeps those patterns out.

Builds the zero-row twin with pyarrow (schema read straight from the
sf0.001 fixtures, so column types — including the events timestamp
unit — are byte-identical to production), then reuses the driver-
protocol compare loop from tools/full_sweep.py verbatim.

Usage:
    python tools/empty_corpus_sweep.py [name ...]

Exit 1 on any error or oracle mismatch.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF = "/root/testdata/sf0.001"


def build_empty_dir(dst: str, src_sf: str = SRC_SF) -> str:
    """Write a zero-row parquet twin of every table into ``dst``."""
    import pyarrow.parquet as pq

    from streaming_data_pipeline_spark.schema import ALL_TABLES

    os.makedirs(dst, exist_ok=True)
    for name in ALL_TABLES:
        schema = pq.read_schema(os.path.join(src_sf, f"{name}.parquet"))
        pq.write_table(schema.empty_table(), os.path.join(dst, f"{name}.parquet"))
    return dst


def main() -> int:
    from tools.full_sweep import sweep

    with tempfile.TemporaryDirectory(prefix="spark_graft_empty_sf_") as tmp:
        empty_dir = build_empty_dir(os.path.join(tmp, "sf0"))
        return sweep(empty_dir, set(sys.argv[1:]))


if __name__ == "__main__":
    raise SystemExit(main())
