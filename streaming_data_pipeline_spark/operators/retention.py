"""Age-based retention over a date-partitioned warehouse sink.

The reference configures an optional 30-day table expiration on its
warehouse table (README.md:308-315) and recommends date-partitioned
tables (README.md:354). The Spark-native analog: the sink is
partitioned by date (plans/scale_queries.partitioned_sink_pruning), so
retention is a partition-level metadata operation — entire
day-directories are dropped without reading, rewriting, or shuffling a
single row. At 100 TB this is the only viable shape: row-level deletes
would rewrite the table; partition drops are O(days), not O(rows)
(the same operation as SQL ``ALTER TABLE ... DROP PARTITION`` or a
Delta/Iceberg ``delete where date < cutoff`` that plans to a
metadata-only drop, or an object-store lifecycle rule on the date
prefix).
"""

from __future__ import annotations

import os
import shutil


def list_partition_values(base_dir: str, partition_col: str) -> list[str]:
    """Partition values present in a hive-layout directory
    (``<base>/<col>=<value>/``), sorted ascending."""
    prefix = f"{partition_col}="
    return sorted(
        d[len(prefix):]
        for d in os.listdir(base_dir)
        if d.startswith(prefix) and os.path.isdir(os.path.join(base_dir, d))
    )


def expire_old_partitions(
    base_dir: str, partition_col: str, cutoff: str
) -> list[str]:
    """Drop every partition whose value sorts strictly below ``cutoff``
    (ISO dates sort lexicographically, so string compare == date
    compare). Returns the dropped values. Purely filesystem-level: no
    Spark job, no data read — the partition is the unit of expiry.
    """
    dropped = []
    for value in list_partition_values(base_dir, partition_col):
        if value < cutoff:
            shutil.rmtree(
                os.path.join(base_dir, f"{partition_col}={value}"),
                ignore_errors=True,
            )
            dropped.append(value)
    return dropped
