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


@register(
    "events_hourly_resample",
    oracle="""
WITH base AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS s,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events
),
hourly AS (
  SELECT user_id, s // 3600 AS h,
         COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM base GROUP BY 1, 2
),
span AS (SELECT user_id, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY 1),
grid AS (
  SELECT user_id, CAST(x AS BIGINT) AS h
  FROM span, UNNEST(range(lo, hi + 1)) t(x)
),
g AS (
  SELECT grid.user_id, grid.h, hourly.n, hourly.sum_cents
  FROM grid LEFT JOIN hourly USING (user_id, h)
)
SELECT user_id, h * 3600 AS hour_start,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
       LAST_VALUE(sum_cents IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents,
       sum_cents IS NULL AS gap_filled
FROM g
""",
    doc="Time-series resample to a regular hourly grid with forward "
    "fill (r5) — the gap-filling operator every time-series store "
    "(timescale hypertables, InfluxDB fill(previous)) ships and Spark "
    "has no builtin for: per user, generate the dense hour grid over "
    "the user's own active span, left-join the hourly aggregates, and "
    "carry the last observed hourly cents-sum forward across empty "
    "hours (gap_filled marks carried rows). Shape: one scan -> "
    "partial-aggregated hourly rollup (|users| x |active hours| rows, "
    "far smaller than events), a per-user span aggregate whose "
    "sequence() explode materializes the grid map-side, an equi-join "
    "back, and ONE per-user window for the fill. 100 TB: the window "
    "partition is bounded by the calendar span in hours (720/month), "
    "NOT by event volume — a billion-event user still resamples as "
    "<=span rows because the fill runs on the rollup, never the raw "
    "events; grid cardinality is users x span, the same as the "
    "output. Exact integer cents throughout. Rollup + fill live in "
    "operators/temporal.py (hourly_cents_rollup / "
    "resample_forward_fill) shared verbatim with the streaming twin "
    "run_streaming_hourly_resample (equivalence incl. late data in "
    "tests/test_streaming.py).",
)
def q_events_hourly_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.temporal import (
        hourly_cents_rollup,
        resample_forward_fill,
    )

    ev = load_table(spark, sf_dir, "events")
    # the rollup feeds BOTH the span branch and the grid join; without
    # this the events scan runs twice — checkpointing |users × active
    # hours| rows (tiny vs events) makes it one scan at any SF
    hourly = hourly_cents_rollup(ev).localCheckpoint(eager=True)
    return resample_forward_fill(hourly)


@register(
    "interval_overlap_join",
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
  SELECT user_id,
         epoch_us(MIN(ts)) // 1000000 AS lo_s,
         epoch_us(MIN(ts)) // 1000000
           + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 + 1 AS hi_s
  FROM numbered GROUP BY user_id, session_id
), hours AS (
  SELECT epoch_us(ts) // 1000000 // 3600 AS h, COUNT(*) AS n
  FROM events GROUP BY 1
), top AS (
  SELECT h * 3600 - 1800 AS window_start, h * 3600 + 5400 AS window_end
  FROM hours ORDER BY n DESC, h LIMIT 5
)
SELECT window_start, window_end,
       COUNT(*) AS n_sessions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(LEAST(hi_s, window_end) - GREATEST(lo_s, window_start))
            AS BIGINT) AS overlap_sec
FROM sessions s JOIN top t
  ON s.lo_s < t.window_end AND t.window_start < s.hi_s
GROUP BY 1, 2
""",
    doc="Interval x interval OVERLAP join (r5) — user sessions against "
    "the five busiest +/-(30m..90m) peak-traffic windows, reporting "
    "per-window session count, distinct users, and total overlapped "
    "seconds. Spark plans a raw overlap predicate as "
    "BroadcastNestedLoop (a cartesian at scale); this goes through "
    "operators/temporal.interval_overlap_join — both interval sets "
    "explode to the 1h buckets they span, equi-join on bucket id, and "
    "each pair survives only in its first shared bucket, so the join "
    "is exactly-once WITHOUT a distinct. Here the 5-row window side "
    "additionally broadcasts (zero shuffle for the join itself); with "
    "two large sides the same operator is a single bucket-keyed "
    "shuffle join, AQE-splittable. Session bounds are exact integer "
    "seconds, half-open, derived with the same floor arithmetic as "
    "the sessionizer so the oracle matches bit-for-bit.",
)
def q_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.functions.temporal import idiv_floor
    from ds_mapreduce_spark.operators.temporal import interval_overlap_join
    from ds_mapreduce_spark.streaming.sessionize import sessionize_batch

    ev = load_table(spark, sf_dir, "events")
    sessions = sessionize_batch(ev).select(
        "user_id",
        F.col("session_start").alias("lo_s"),
        (F.col("session_start") + F.col("span_sec") + 1).alias("hi_s"),
    )
    hours = (
        ev.select(idiv_floor(epoch_sec("ts"), 3600).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = (
        hours.orderBy(F.col("n").desc(), F.col("h"))
        .limit(5)
        .select(
            (F.col("h") * 3600 - 1800).alias("window_start"),
            (F.col("h") * 3600 + 5400).alias("window_end"),
        )
    )
    j = interval_overlap_join(
        sessions, top, "lo_s", "hi_s", "window_start", "window_end", 3600
    )
    return j.groupBy("window_start", "window_end").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum(
            F.least("hi_s", "window_end") - F.greatest("lo_s", "window_start")
        )
        .cast("bigint")
        .alias("overlap_sec"),
    )


@register(
    "events_gapfill_interpolate",
    oracle="""
WITH base AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS s,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events
),
hourly AS (
  SELECT user_id, s // 3600 AS h,
         COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM base GROUP BY 1, 2
),
span AS (SELECT user_id, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY 1),
grid AS (
  SELECT user_id, CAST(x AS BIGINT) AS h
  FROM span, UNNEST(range(lo, hi + 1)) t(x)
),
g AS (
  SELECT grid.user_id, grid.h, hourly.n, hourly.sum_cents
  FROM grid LEFT JOIN hourly USING (user_id, h)
),
nb AS (
  SELECT user_id, h, n, sum_cents,
         LAST_VALUE(sum_cents IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         LAST_VALUE(CASE WHEN sum_cents IS NOT NULL THEN h END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
         FIRST_VALUE(sum_cents IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         FIRST_VALUE(CASE WHEN sum_cents IS NOT NULL THEN h END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY h
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM g
)
SELECT user_id, h * 3600 AS hour_start,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
       CAST(CASE WHEN sum_cents IS NOT NULL THEN sum_cents
                 ELSE pv + (nv - pv) * (h - ph) // (nh - ph) END AS BIGINT)
         AS filled_cents,
       sum_cents IS NULL AS gap_filled
FROM nb
""",
    doc="Time-series resample with LINEAR interpolation (r6) — the "
    "fill(linear) every time-series store pairs with fill(previous), "
    "completing the resample family: a gap hour gets the straight-line "
    "value between its observed neighbors, pv + (nv-pv)*(h-ph) DIV "
    "(nh-ph) in exact integer cents (Spark DIV = DuckDB // — both "
    "truncate toward zero, so the hash is engine-independent; "
    "multiplication before division keeps it exact). Interior gaps "
    "always have both neighbors because the grid spans each user's own "
    "observed [min, max] hour. Deliberately batch-only: interpolation "
    "is NON-CAUSAL (a gap needs the next observation), so this "
    "family's streaming twin is the forward fill — that asymmetry is "
    "documented operator semantics, not an omission. Same 100 TB "
    "bounds as events_hourly_resample: the fill windows run on the "
    "|users × span-hours| rollup, never raw events; the rollup is "
    "checkpointed so the events scan runs once across the span/grid "
    "branches. See operators/temporal.py:resample_linear_interp.",
)
def q_events_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.temporal import (
        hourly_cents_rollup,
        resample_linear_interp,
    )

    ev = load_table(spark, sf_dir, "events")
    hourly = hourly_cents_rollup(ev).localCheckpoint(eager=True)
    return resample_linear_interp(hourly)


@register(
    "seasonal_naive_backtest",
    oracle="""
WITH roll AS (
  SELECT user_id, epoch_us(ts) // 1000000 // 86400 AS d,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
           AS sum_cents
  FROM events GROUP BY 1, 2
),
dmax AS (SELECT MAX(d) AS dm FROM roll),
test AS (
  SELECT r.user_id, r.d, r.sum_cents AS actual,
         s.sum_cents AS fc_seasonal, p.sum_cents AS fc_naive1
  FROM roll r
  JOIN dmax ON r.d > dmax.dm - 7
  JOIN roll s ON s.user_id = r.user_id AND s.d = r.d - 7
  JOIN roll p ON p.user_id = r.user_id AND p.d = r.d - 1
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(ABS(actual - fc_seasonal)) AS BIGINT) AS sae_seasonal,
       CAST(SUM(ABS(actual - fc_naive1)) AS BIGINT) AS sae_naive1,
       CAST(CASE WHEN SUM(ABS(actual - fc_naive1)) = 0 THEN -1
                 ELSE (20000 * SUM(ABS(actual - fc_seasonal))
                       + SUM(ABS(actual - fc_naive1)))
                      // (2 * SUM(ABS(actual - fc_naive1))) END AS BIGINT)
         AS mase_bp
FROM test GROUP BY user_id
""",
    doc="Seasonal-naive forecast backtest (r7) — the baseline every "
    "time-series model must beat, evaluated the way forecasters "
    "actually do it: over the final 7-day holdout, forecast each "
    "(user, day) cents total with the value 7 days earlier (weekly "
    "seasonal naive) and with the previous day (naive-1), and report "
    "per-user absolute-error sums plus MASE-style basis points "
    "(seasonal error relative to naive-1, half-up integer division, "
    "-1 when the denominator is zero) — exact integers throughout, "
    "no float crosses the engine boundary. Days with a missing lag "
    "are excluded on both engines (inner joins). Plan: a per-(user, "
    "day) rollup (|users x active days| rows, localCheckpointed so "
    "events scans ONCE across its three uses) self-joined on "
    "(user, d-7) and (user, d-1); the holdout bound is a 1-row "
    "broadcast. 100 TB: every join leg is rollup-sized, never "
    "event-sized; the rollup is the same associative partial shape "
    "the streaming resample twins maintain, so the backtest runs "
    "incrementally off that state for free.",
)
def q_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.functions.temporal import epoch_sec, idiv_floor

    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    roll = (
        ev.select(
            "user_id",
            idiv_floor(epoch_sec("ts"), 86400).alias("d"),
            cents.alias("cents"),
        )
        .groupBy("user_id", "d")
        .agg(F.sum("cents").cast("bigint").alias("sum_cents"))
        .localCheckpoint(eager=True)
    )
    dmax = roll.agg(F.max("d").alias("dm"))
    test = (
        roll.crossJoin(F.broadcast(dmax))
        .where(F.col("d") > F.col("dm") - 7)
        .select("user_id", "d", F.col("sum_cents").alias("actual"))
        .join(
            roll.select(
                "user_id",
                (F.col("d") + 7).alias("d"),
                F.col("sum_cents").alias("fc_seasonal"),
            ),
            ["user_id", "d"],
        )
        .join(
            roll.select(
                "user_id",
                (F.col("d") + 1).alias("d"),
                F.col("sum_cents").alias("fc_naive1"),
            ),
            ["user_id", "d"],
        )
    )
    sae_s = F.sum(F.abs(F.col("actual") - F.col("fc_seasonal"))).cast("bigint")
    sae_n = F.sum(F.abs(F.col("actual") - F.col("fc_naive1"))).cast("bigint")
    return (
        test.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            sae_s.alias("sae_seasonal"),
            sae_n.alias("sae_naive1"),
        )
        .select(
            "user_id",
            "n_points",
            "sae_seasonal",
            "sae_naive1",
            F.when(F.col("sae_naive1") == 0, F.lit(-1))
            .otherwise(
                F.expr("(20000 * sae_seasonal + sae_naive1) DIV (2 * sae_naive1)")
            )
            .cast("bigint")
            .alias("mase_bp"),
        )
    )
