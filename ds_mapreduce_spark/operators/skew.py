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
