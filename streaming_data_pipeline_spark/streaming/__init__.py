from streaming_data_pipeline_spark.streaming.pipeline import run_pipeline
from streaming_data_pipeline_spark.streaming.windows import (
    session_window_stats,
    sliding_window_counts,
    streaming_dedup,
    tumbling_window_counts,
)

__all__ = [
    "run_pipeline",
    "session_window_stats",
    "sliding_window_counts",
    "streaming_dedup",
    "tumbling_window_counts",
]
