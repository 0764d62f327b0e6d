"""Vector math as JVM-side Catalyst expressions (no Python in the plan).

Used by similarity search (E8) and embedding near-dup. All arithmetic
is in DOUBLE regardless of the stored element type so results are
reproducible against any oracle.

Scale notes (100 TB): ``F.aggregate``/``F.zip_with`` run inside
whole-stage codegen per row — a 64-dim dot product is ~64 fused
multiply-adds in generated Java, no Arrow transfer, no UDF dispatch.
For very high dims (>4k) a vectorized pandas_udf over numpy becomes
competitive; at typical embedding dims the expression path wins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns, computed in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a, b) in double; NULL-safe only as far as the inputs are."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_dist(a: Column, b: Column) -> Column:
    """Euclidean distance of two array<numeric> columns in double —
    oracle equivalence: DuckDB ``list_distance``."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
