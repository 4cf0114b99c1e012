"""streaming_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference streaming pipeline (Pub/Sub -> Beam/Dataflow -> BigQuery, see
SURVEY.md), re-expressed Spark-first: declarative DataFrame/SQL plans
optimized by Catalyst, Structured Streaming for the unbounded path, and
LLM-training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.

Layout:
    session       SparkSession factory with scale-oriented defaults
    schema        declared (never inferred) schemas for every table
    sources/      batch + streaming readers, deterministic event generator
    functions/    scalar/vector/text expression helpers (no hot-path UDFs)
    operators/    transform chain, dedup, similarity, multimodal
    plans/        named analytical queries, each with a DuckDB oracle twin
    streaming/    windowed aggs, watermarks, streaming dedup, sinks
"""

__version__ = "0.1.0"
