from ds_mapreduce_spark.plans.registry import REGISTRY, Query, register

__all__ = ["REGISTRY", "Query", "register"]
