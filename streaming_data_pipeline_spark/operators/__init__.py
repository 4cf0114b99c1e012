from streaming_data_pipeline_spark.operators.transforms import (
    enrich,
    enrich_raw_events,
    parse_wire,
    quality_filter,
    validate_required,
)

__all__ = [
    "enrich",
    "enrich_raw_events",
    "parse_wire",
    "quality_filter",
    "validate_required",
]
