"""Unit tests for the centralized epoch helpers (functions/temporal.py).

These are the ONE epoch-conversion surface (CLAUDE.md invariant); every
ts call site routes through them, so their floor/exactness semantics
must be pinned: exact integer floor division (no double rounding drift)
and NTZ/LTZ-safety.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_mapreduce_spark.functions.temporal import (
    epoch_day,
    epoch_sec,
    epoch_us,
    idiv_floor,
)


def test_idiv_floor_exact_and_floor_semantics(spark):
    # negative values: FLOOR, not truncate-toward-zero; huge values: no
    # double-rounding drift (the pmod-subtract trick keeps division exact)
    vals = [
        -1_000_001,
        -1_000_000,
        -1,
        0,
        1,
        999_999,
        1_000_000,
        1_700_000_123_456_789,
        9_007_199_254_740_993,  # > 2^53: would corrupt under naive double div
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [
        r[0]
        for r in df.select(idiv_floor(F.col("v"), 1_000_000)).orderBy("v").collect()
    ]
    expected = [v // 1_000_000 for v in sorted(vals)]
    assert got == expected


def test_epoch_helpers_agree_with_python(spark):
    us_vals = [1_700_000_000_000_000, 1_700_000_123_456_789, 1_700_086_400_000_001]
    df = spark.createDataFrame(
        [(v,) for v in us_vals], "us long"
    ).select(F.timestamp_micros("us").alias("ts"), "us")
    rows = df.select(
        epoch_us("ts").alias("us2"),
        epoch_sec("ts").alias("sec"),
        epoch_day("ts").alias("day"),
        "us",
    ).collect()
    for r in rows:
        assert r.us2 == r.us
        assert r.sec == r.us // 1_000_000
        assert r.day == r.us // 86_400_000_000


def test_epoch_us_is_ntz_safe(spark):
    # an NTZ column must not throw (defensive cast; session pinned UTC)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.sql(
        "SELECT CAST('2023-11-14 22:13:20' AS TIMESTAMP_NTZ) AS ts"
    )
    assert df.select(epoch_us("ts")).collect()[0][0] == 1_700_000_000_000_000


def test_epoch_sec_accepts_date_columns(spark):
    # q18 passes o_orderdate (DATE); the helper casts through TIMESTAMP
    df = spark.sql("SELECT DATE '1970-01-02' AS d")
    assert df.select(epoch_sec("d")).collect()[0][0] == 86_400
