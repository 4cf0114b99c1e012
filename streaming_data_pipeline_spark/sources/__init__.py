from streaming_data_pipeline_spark.sources.batch import load_table, register_views

__all__ = ["load_table", "register_views"]
