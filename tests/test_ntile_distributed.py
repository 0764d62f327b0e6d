"""ntile_over_total_order must equal Spark's own NTILE window bit-for-bit
(same standard-SQL tile arithmetic) while planning ZERO SinglePartition
exchanges — the scale contract that replaced customer_rfm_segments'
global-sort window.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ds_mapreduce_spark.operators.relational import ntile_over_total_order


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (7, 4), (8, 4), (100, 4), (97, 7), (1000, 3)])
def test_matches_window_ntile(spark, n, k):
    # keys deliberately NOT in partition order: (v, id) with v = id*7 % n
    rows = [(i, (i * 7) % n) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(8)
    order = [F.col("v").desc(), F.col("id")]
    got = {
        r.id: r.tile
        for r in ntile_over_total_order(df, k, order, "tile").collect()
    }
    expected = {
        r.id: r.tile
        for r in df.select(
            "id", F.ntile(k).over(Window.orderBy(*order)).cast("bigint").alias("tile")
        ).collect()
    }
    assert got == expected


def test_no_single_partition_exchange(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 13 % 100).alias("v")
    )
    out = ntile_over_total_order(df, 4, [F.col("v").desc(), F.col("id")], "tile")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_rfm_query_plan_has_no_single_partition(spark, sf_dir):
    from ds_mapreduce_spark.plans.registry import load_all

    q = load_all()["customer_rfm_segments"]
    plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
