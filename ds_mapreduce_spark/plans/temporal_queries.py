"""Temporal/interval join queries: as-of join and bucketed range join
(operators/temporal.py). The reference has no joins at all (SURVEY.md
§2.3); these are the time-series shapes Spark has no built-in operator
for, expressed as shuffle-scalable compositions.

Oracle-parity: timestamps cross the boundary as epoch seconds; the
as-of oracle is a correlated MAX subquery (DuckDB decorrelates it);
the range-join oracle builds the same interval dimension with range().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ds_mapreduce_spark.operators.temporal import (
    asof_join,
    make_intervals,
    range_join_points_intervals,
)
from ds_mapreduce_spark.plans.registry import register
from ds_mapreduce_spark.sources.catalog import load_table


@register(
    "asof_join_click_purchase",
    oracle="""
SELECT c.event_id, c.user_id,
       epoch_us(c.ts) // 1000000 AS click_sec,
       (SELECT epoch_us(MAX(p.ts)) // 1000000
        FROM events p
        WHERE p.user_id = c.user_id
          AND p.event_type = 'purchase'
          AND p.ts <= c.ts) AS last_purchase_sec
FROM events c WHERE c.event_type = 'click'
""",
    doc="As-of join: each click event joined to the user's most recent "
    "purchase at-or-before it (null when none). Union-and-window "
    "formulation — ONE shuffle on user_id for |clicks|+|purchases| rows; "
    "no range self-join, no per-key blow-up on hot users.",
)
def q_asof_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    joined = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts", right_payload=["ts"]
    )
    return joined.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") / F.lit(1_000_000)).cast("bigint").alias("click_sec"),
        (F.unix_micros("asof_ts") / F.lit(1_000_000)).cast("bigint").alias("last_purchase_sec"),
    )


@register(
    "range_join_price_bands",
    oracle="""
WITH bands AS (
  SELECT 900.0 + i * 2.5 AS lo, 900.0 + (i + 1) * 2.5 AS hi
  FROM range(40) t(i)
),
j AS (
  SELECT b.lo, p.p_retailprice
  FROM part p JOIN bands b
    ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
)
SELECT lo AS band_lo, COUNT(*) AS n_parts,
       ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE), 4) AS sum_price
FROM j GROUP BY lo
""",
    doc="Range join (point-in-interval) as a bucketed equi-join: parts "
    "bucket by floor(price/width), intervals explode to overlapped "
    "buckets, residual predicate filters exactly. Equi-join keeps it "
    "shuffle-scalable at any interval cardinality; here the 40-row band "
    "dim additionally broadcasts.",
)
def q_range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    bands = make_intervals(spark, 900.0, 1000.0, 2.5)
    joined = range_join_points_intervals(
        part.select("p_retailprice"), bands, "p_retailprice", "lo", "hi", bucket_width=2.5
    )
    return joined.groupBy(F.col("lo").alias("band_lo")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(
            F.sum(F.col("p_retailprice").cast("decimal(12,2)")).cast("double"), 4
        ).alias("sum_price"),
    )
