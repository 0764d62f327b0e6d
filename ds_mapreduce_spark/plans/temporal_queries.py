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
from ds_mapreduce_spark.functions.temporal import epoch_sec
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
        epoch_sec("ts").alias("click_sec"),
        epoch_sec("asof_ts").alias("last_purchase_sec"),
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


@register(
    "sessions_per_hour",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), sessions AS (
  SELECT user_id, session_id,
         epoch_us(MIN(ts)) // 1000000 AS s_start,
         epoch_us(MAX(ts)) // 1000000 AS s_end
  FROM numbered GROUP BY user_id, session_id
)
SELECT h * 3600 AS hour_start, COUNT(*) AS n_sessions
FROM sessions, UNNEST(range(s_start // 3600, s_end // 3600 + 1)) t(h)
GROUP BY 1
""",
    doc="Concurrent sessions per hour: interval-overlap counting by "
    "exploding each session to the hour buckets it spans (the interval "
    "side of the bucketed range-join pattern), then a plain groupBy — "
    "sessions are short so the explosion factor is ~1; one extra "
    "shuffle over the sessionization base.",
)
def q_sessions_per_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.streaming.sessionize import sessionize_batch

    ev = load_table(spark, sf_dir, "events")
    s = sessionize_batch(ev).select(
        F.col("session_start").alias("s_start"),
        (F.col("session_start") + F.col("span_sec")).alias("s_end"),
    )
    hours = F.explode(
        F.sequence(F.expr("s_start DIV 3600"), F.expr("s_end DIV 3600"))
    ).alias("h")
    return (
        s.select(hours)
        .groupBy((F.col("h") * 3600).alias("hour_start"))
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
