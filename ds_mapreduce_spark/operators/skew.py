"""Skew-handling join: explicit key salting for when a shuffle join's
hot keys overwhelm single tasks and neither broadcasting (right side
too big) nor AQE skew-splitting (e.g., a non-sort-merge plan, or skew
appearing after a transformation AQE can't see through) applies.

Mechanics: the skewed LEFT side appends a random-free deterministic
salt in [0, n) derived from other columns; the RIGHT side replicates
every row n times (one per salt value). The join key becomes
(key, salt), splitting each hot key's work across n tasks. Results are
row-identical to the unsalted join — verified in tests/test_skew.py.

Cost model: right side inflates n×, so pick n ≈ (hottest-key rows /
target-task rows) and keep the replicated side the SMALLER one. AQE's
skew-join handles the common sort-merge case automatically (enabled in
session.py); this operator is the explicit fallback the 100 TB
playbook still needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Join ``left`` (skewed) with ``right`` on ``on`` with key salting.

    ``salt_from``: left columns the salt is hashed from (defaults to all
    non-key columns) — deterministic, so retries land identically.
    Supports inner and left joins (the semantics where per-left-row
    multiplicity is preserved by salting).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    cols = salt_from or [c for c in left.columns if c != on]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_buckets))
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = l_salted.join(r_salted, [on, "__salt"], how)
    return out.drop("__salt")


def keycount_partial(ev: DataFrame, key: str = "user_id") -> DataFrame:
    """(key, n_events) partial counts — the associative state both the
    batch heavy-hitter profile and its streaming twin maintain: counts
    merge by summation under ANY chunking of the feed, so micro-batched
    maintenance converges to the batch profile."""
    return ev.groupBy(key).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))


def keycount_merge(*parts: DataFrame) -> DataFrame:
    """Merge partial (key, n_events) tables by summation."""
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    key = [c for c in merged.columns if c != "n_events"]
    return merged.groupBy(*key).agg(
        F.sum("n_events").cast("bigint").alias("n_events")
    )


def heavy_hitter_present(pk: DataFrame, topk: int = 10) -> DataFrame:
    """Presentation half of the heavy-hitter profile, shared verbatim
    by the batch query and the streaming twin: integer-bp traffic
    share + total/distinct context, exact top-``topk`` by count with
    deterministic user_id tie-break (TakeOrderedAndProject — per-
    partition heaps, no global sort)."""
    tot = pk.agg(
        F.sum("n_events").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("d"),
    )
    return (
        pk.crossJoin(F.broadcast(tot))
        .orderBy(F.col("n_events").desc(), F.col("user_id"))
        .limit(topk)
        .select(
            "user_id",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.expr("CAST(n_events * 10000 DIV t AS BIGINT)").alias("share_bp"),
            F.col("t").alias("n_total_events"),
            F.col("d").alias("n_distinct_users"),
        )
    )
