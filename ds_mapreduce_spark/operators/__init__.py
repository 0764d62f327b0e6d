from ds_mapreduce_spark.operators.mapreduce import MapReducer, WordCount, run_mapreduce, word_count

__all__ = ["MapReducer", "WordCount", "run_mapreduce", "word_count"]
