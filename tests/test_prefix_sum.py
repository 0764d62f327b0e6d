"""prefix_sum_over_total_order must equal the single-partition window
SUM OVER (ORDER BY ...) bit-for-bit while planning ZERO SinglePartition
exchanges — the shard-planning primitive's scale contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ds_mapreduce_spark.operators.relational import prefix_sum_over_total_order


@pytest.mark.parametrize("n", [1, 7, 100, 1000])
def test_matches_window_prefix_sum(spark, n):
    rows = [(i, (i * 7) % n, (i * 13) % 50) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, k long, v long").repartition(8)
    order = [F.col("k"), F.col("id")]
    got = {
        r.id: r.cum
        for r in prefix_sum_over_total_order(df, order, F.col("v"), "cum").collect()
    }
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    expected = {
        r.id: r.cum
        for r in df.select("id", F.sum("v").over(w).cast("bigint").alias("cum")).collect()
    }
    assert got == expected


def test_no_single_partition_exchange(spark):
    df = spark.range(200).select("id", (F.col("id") * 13 % 100).alias("v"))
    out = prefix_sum_over_total_order(df, [F.col("v"), F.col("id")], F.col("v"), "cum")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_shard_plan_query_no_single_partition(spark, sf_dir):
    from ds_mapreduce_spark.plans.registry import load_all

    q = load_all()["corpus_shard_plan"]
    plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
