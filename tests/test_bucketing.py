"""Bucketed-table co-located join: writing both sides bucketed by the
join key lets Spark join WITHOUT a shuffle exchange on either side —
the storage-layout optimization a recurring 100 TB fact-fact join
pays for once at write time and amortizes over every subsequent join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # managed tables land in the default warehouse (./spark-warehouse,
    # git-ignored); DROP TABLE removes the files afterwards
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("lv")
    )
    right = spark.range(0, 10_000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("rv")
    )
    for name, df in (("t_bleft", left), ("t_bright", right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        df.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(name)
    yield "t_bleft", "t_bright"
    for name in ("t_bleft", "t_bright"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ln, rn = bucketed_tables
    # disable auto-broadcast so the planner takes the shuffle-join path a
    # large fact-fact join would take — bucketing must eliminate both
    # Exchange nodes there
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ln).join(spark.table(rn), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:1500]}"
        # correctness: every even k in [0, 10000) matches exactly once
        assert joined.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    ln, _ = bucketed_tables
    agg = spark.table(ln).groupBy("k").agg(F.sum("lv").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # grouping key == bucket key
    assert agg.count() == 10_000
