"""Relational operator facade (E5, E10-E12).

These are thin, documented pass-throughs to the DataFrame API — the
engine's public names for the capabilities the reference lacks
entirely (SURVEY.md §2.3). They exist so the operator inventory is an
explicit, testable surface rather than "whatever Spark does"; each
carries its scale contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def project(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Projection; column pruning reaches the scan (check ReadSchema)."""
    return df.select(*cols)


def filter_rows(df: DataFrame, predicate: Column) -> DataFrame:
    """Filter; simple comparisons push into the parquet scan."""
    return df.where(predicate)


def aggregate(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    """Hash aggregation with automatic partial (map-side) combine —
    the global version of the reference's per-chunk reduce (§1.4)."""
    return df.groupBy(*keys).agg(*aggs)


def equi_join(
    df: DataFrame,
    other: DataFrame,
    on,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join; pass broadcast_right=True for dimension tables so the
    fact side never shuffles (verify: BroadcastHashJoin in explain)."""
    right = F.broadcast(other) if broadcast_right else other
    return df.join(right, on, how)


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k: orderBy().limit(k) compiles to TakeOrderedAndProject
    (per-partition heaps, no total sort). `order` must be a total order
    for deterministic results."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, group: Sequence[str], order: Sequence[Column], k: int, rank_col: str = "rnk"
) -> DataFrame:
    """Per-group top-k via row_number window: one shuffle on the group key."""
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)


def latest_wins_merge(
    all_rows: DataFrame, key_cols: Sequence[str], version_col: str
) -> DataFrame:
    """CDC merge core: keep the highest-``version_col`` row per key.

    Shared by the batch query (``cdc_latest_wins_merge``: base UNION ALL
    changes in one plan) and the streaming job
    (``streaming.jobs.run_streaming_cdc_merge``: the same reduction
    applied per micro-batch inside ``foreachBatch``, merging each batch
    into the landed state). One row_number window = one shuffle on the
    merge key. 100 TB: with the base table bucketed on the key only the
    (small) change set shuffles — the incremental-compaction plan.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
    return (
        all_rows.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def cdc_change_rows(orders: DataFrame) -> DataFrame:
    """The deterministic synthetic CDC feed both the batch query and the
    streaming twin merge: every order emits its v1 base row; every 7th
    key also emits a v2 re-price. Derived from the input rows alone, so
    the same orders produce the same feed whether they arrive as one
    batch or as micro-batches."""
    base = orders.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
        F.lit(1).alias("version"),
    )
    upd = orders.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("status"),
        (F.col("o_totalprice").cast("decimal(12,2)") + 10).alias("price"),
        F.lit(2).alias("version"),
    )
    return base.unionByName(upd)
