"""Deterministic per-key quota ranking with a hash-threshold pre-thin.

Every quota/mixture sampler in this engine ranks rows within a key
group by ``(md5(id), id)`` — deterministic on every engine, cluster,
and rerun, unlike seeded sampling — and keeps ranks ``<= quota``. The
naive shape is a single ``row_number`` window per key: exact, but ALL
rows of the hottest key land in ONE task (the window sort is not
skew-splittable), which is the classic hot-partition hazard at 100 TB.

``quota_rank`` adds the scale guard: a hash-threshold pre-thin that
keeps (w.h.p.) only the ``prethin_factor × quota`` smallest-md5 rows
per key BEFORE the exact window. Because the thin predicate is a
prefix of the rank order itself (it keeps exactly the rows whose md5
sorts first), every filtered-out row provably ranks after ALL
survivors — so any consumer that only reads ranks ``<= quota`` gets a
bit-identical result, while the window sort shrinks from |hot key| to
~``prethin_factor × quota`` rows per key.

Survivorship is probabilistic (Binomial), so the operator carries a
runtime guard: if any key kept fewer than ``min(count, quota)`` rows —
P < exp(-quota·(factor-1)²/(2·factor)) per key by Chernoff, ~e⁻²⁰² at
quota=50, factor=10 — ``assert_true`` fails the job loud instead of
silently dropping quota members.

100 TB story: the per-key count is partial-aggregatable (map-side
combine, |keys|-sized output, broadcast back), the thin is a map-side
filter, and the surviving window partitions are near-quota-sized
regardless of key skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: denominator of the md5-prefix fraction: 15 hex digits = 60 bits
_HASH_DEN = 1 << 60


def quota_rank(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    quota: int | Column,
    *,
    prethin_factor: int | None = None,
    rank_col: str = "qrank",
) -> DataFrame:
    """Rank rows within each ``keys`` group by ``(md5(id), id)``.

    Returns ``df`` plus ``rank_col``. With ``prethin_factor=None`` this
    is the plain exact window (the oracle-graded shape). With a factor,
    rows are pre-thinned to the hash-smallest ``factor × quota`` per
    key as described in the module docstring; rows removed by the thin
    are guaranteed to rank above ``quota``, so they may be treated as
    ``rank > quota`` (e.g. a NULL rank after a left join back).

    ``quota`` may be a data-derived Column (e.g. a broadcast-joined
    per-corpus quota) — it must be evaluable on ``df``'s rows.
    """
    qcol = F.lit(quota) if isinstance(quota, int) else quota
    d = df.withColumn("__h", F.md5(F.col(id_col).cast("string")))
    aux = ["__h"]
    if prethin_factor is not None:
        cnt = d.groupBy(*keys).agg(F.count(F.lit(1)).alias("__cnt"))
        d = d.join(F.broadcast(cnt), keys)
        d = d.withColumn("__target", (qcol * prethin_factor).cast("bigint"))
        # md5-prefix as a 60-bit uniform integer; keep iff its fraction
        # of 2^60 is under target/cnt. All DECIMAL/DIV — no float
        # boundary, no overflow (target·2^60 fits DECIMAL(38,0)).
        num = F.conv(F.substring("__h", 1, 15), 16, 10).cast("bigint")
        bound = F.expr(
            f"CAST(CAST(__target AS DECIMAL(38,0)) * {_HASH_DEN} DIV __cnt AS BIGINT)"
        )
        d = d.where((F.col("__cnt") <= F.col("__target")) | (num <= bound))
        aux += ["__cnt", "__target"]
    w = Window.partitionBy(*keys).orderBy(F.col("__h"), F.col(id_col))
    d = d.withColumn(rank_col, F.row_number().over(w))
    if prethin_factor is not None:
        # loud failure on the astronomically-unlikely under-keep (same
        # exchange as the rank window — no extra shuffle).
        d = d.withColumn("__kept", F.count(F.lit(1)).over(Window.partitionBy(*keys)))
        ok = F.col("__kept") >= F.least(F.col("__cnt"), qcol.cast("bigint"))
        d = d.where(
            F.assert_true(
                ok, F.lit("quota_rank pre-thin under-kept a key; raise prethin_factor")
            ).isNull()
        )
        aux.append("__kept")
    return d.drop(*aux)
