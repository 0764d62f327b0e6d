from ds_mapreduce_spark.streaming.jobs import run_streaming_tumbling_window

__all__ = ["run_streaming_tumbling_window"]
