"""Named analytical plans. Each module exposes:

QUERIES: dict[str, Callable[(SparkSession, sf_dir str), DataFrame]]
ORACLE:  dict[str, str]   # DuckDB-runnable ANSI SQL twin per query

Conventions (FIXTURES.md §4):
- fixed AS_OF literal instead of wall clock;
- every computed column aliased identically in Spark and SQL;
- float SUMs go through DECIMAL(18,2) (exact, order-independent) and
  AVGs through round(.., 4) so both engines hash identically.
"""

from streaming_data_pipeline_spark.plans.base import AS_OF, enriched_events
