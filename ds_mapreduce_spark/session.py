"""SparkSession factory with scale-oriented defaults.

Settings chosen for correctness at local[32] AND sanity at cluster
scale; none of them is load-bearing for correctness (driver-supplied
sessions work too — every operator takes the session as an argument).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ds-mapreduce-spark") -> SparkSession:
    """Build (or reuse) a SparkSession.

    Scale notes (100 TB): on a real cluster the same conf applies except
    ``master`` and sizing: shuffle partitions should be ~2-3x total
    executor cores (or left to AQE coalescing with a high initial
    value), and ``spark.sql.files.maxPartitionBytes`` stays at the
    default 128 MiB so a 100 TB scan yields ~800k input splits — fine
    for the DAG scheduler.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # one shuffle partition per core locally; AQE coalesces further
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # deterministic timestamp semantics vs the DuckDB oracle
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
