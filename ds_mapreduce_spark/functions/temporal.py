"""Temporal column helpers: the ONE place epoch conversion lives.

Round 3 broke on a silent driver-side encoding change because 16 call
sites each assumed ``events.ts`` arrives as LTZ TIMESTAMP. The catalog
(``sources.catalog.normalize_events_ts``) now guarantees that, and these
helpers are additionally NTZ-safe (a defensive ``cast("timestamp")`` is
a no-op on LTZ and a wall-clock-preserving UTC cast on NTZ, since every
session is pinned UTC by ``load_table``) — so the next encoding change
is a one-file fix, mirroring the repo's shared-constants invariant for
minhash/SRP oracles.

Oracle equivalences (DuckDB):
- ``epoch_us(c)``  ≙ ``epoch_us(c)``
- ``epoch_sec(c)`` ≙ ``epoch_us(c) // 1000000`` (floor division)

Scale notes: pure column expressions — whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_US_PER_SEC = 1_000_000


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def idiv_floor(col: Column, n: int | Column) -> Column:
    """Exact integer floor division of a BIGINT column by a constant or column.

    Floor (not truncate-toward-zero) semantics for negative inputs,
    exact over the FULL int64 range: the column is cast to
    DECIMAL(38,0) FIRST, then the positive modulus is subtracted and
    the division performed entirely in DECIMAL — the earlier
    double-division variant was exact only below 2^53 (hypothesis found
    9007199254740993 // 10**6 off by one), and a BIGINT pmod-subtract
    would wrap for inputs within ``n`` of int64 min (ADVICE r4);
    ``tests/test_properties.py`` pins the full range including the
    int64 boundaries.
    """
    n_ = F.lit(n) if isinstance(n, int) else n
    c = col.cast("decimal(38,0)")
    nd = n_.cast("decimal(38,0)")
    return ((c - F.pmod(c, nd)) / nd).cast("long")


def epoch_us(col: Column | str) -> Column:
    """Epoch microseconds (BIGINT) from a timestamp column, NTZ/LTZ-safe."""
    return F.unix_micros(_as_col(col).cast("timestamp"))


def epoch_sec(col: Column | str) -> Column:
    """Epoch seconds (BIGINT, floor) — oracle: ``epoch_us(c) // 1000000``."""
    return idiv_floor(epoch_us(col), _US_PER_SEC)


def epoch_day(col: Column | str) -> Column:
    """Epoch days (BIGINT, floor) — oracle: ``epoch_us(c) // 86400000000``."""
    return idiv_floor(epoch_us(col), 86_400 * _US_PER_SEC)
