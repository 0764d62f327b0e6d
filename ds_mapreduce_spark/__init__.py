"""ds_mapreduce_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of the reference
MapReduce framework (AdeThorMiwa/ds-mapreduce, a 783-line Rust
master/worker word-count engine) as an idiomatic PySpark library, plus
the LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) a 100 TB training-data pipeline needs.

Design stance (see SURVEY.md):

- The reference's master/scheduler/worker-pool/health-ping machinery IS
  Spark's driver/DAGScheduler/executor runtime — we do not rebuild it.
  Our code lives only at the two ends: the API surface (sources +
  operator library) and user functions (UDFs), everything in between is
  Catalyst + Tungsten.
- DataFrame-first: every operator is declared with the DataFrame/SQL
  API so predicate pushdown, column pruning, partial aggregation,
  broadcast-join selection and AQE apply automatically.
- Python only on the slow path: Arrow-batched pandas UDFs /
  applyInPandas for the generic MapReduce trait surface; never
  row-at-a-time Python UDFs in a hot path.
"""

from ds_mapreduce_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
