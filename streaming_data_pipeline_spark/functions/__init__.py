from streaming_data_pipeline_spark.functions.scalars import (
    data_quality_score,
    event_hour_lenient,
    message_length,
    truthy_str,
)

__all__ = [
    "data_quality_score",
    "event_hour_lenient",
    "message_length",
    "truthy_str",
]
