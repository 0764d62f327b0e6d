from ds_mapreduce_spark.sources.catalog import TABLES, load_table, read_text_corpus

__all__ = ["TABLES", "load_table", "read_text_corpus"]
