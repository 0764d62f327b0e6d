"""Catalog must normalize every events.ts physical encoding to LTZ TIMESTAMP.

The driver regenerated testdata between rounds and changed events.ts from
INT64-nanos to timestamp[us] (TIMESTAMP_NTZ under Spark 4), silently breaking
every ``unix_micros(ts)`` call site. This test writes tiny events parquets in
BOTH encodings and asserts ``load_table`` yields the same LTZ timestamps for
each — so the next encoding change fails here, loudly, not in the driver gate.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ds_mapreduce_spark.sources.catalog import load_table

# three instants, microsecond precision, spanning a day boundary
_INSTANTS_US = [
    1_700_000_000_000_000,
    1_700_000_123_456_789,
    1_700_086_400_000_001,
]
_BASE_COLS = {
    "event_id": pa.array([1, 2, 3], type=pa.int64()),
    "user_id": pa.array([10, 20, 10], type=pa.int64()),
    "event_type": pa.array(["click", "view", "purchase"], type=pa.string()),
    "value": pa.array([1.0, 2.0, 3.0], type=pa.float64()),
    "props": pa.array(["{}", "{}", "{}"], type=pa.string()),
}


def _write_events(tmpdir: str, ts_array: pa.Array) -> str:
    cols = dict(_BASE_COLS)
    cols["ts"] = ts_array
    table = pa.table(
        {"event_id": cols["event_id"], "ts": cols["ts"], "user_id": cols["user_id"],
         "event_type": cols["event_type"], "value": cols["value"], "props": cols["props"]}
    )
    pq.write_table(table, f"{tmpdir}/events.parquet")
    return tmpdir


@pytest.mark.parametrize(
    "encoding,ts_array",
    [
        (
            "int64_nanos",
            pa.array([us * 1000 for us in _INSTANTS_US], type=pa.int64()),
        ),
        (
            "timestamp_us_ntz",
            pa.array(_INSTANTS_US, type=pa.timestamp("us")),
        ),
        (
            "timestamp_us_utc",
            pa.array(_INSTANTS_US, type=pa.timestamp("us", tz="UTC")),
        ),
    ],
)
def test_load_table_normalizes_ts_encoding(spark, tmp_path, encoding, ts_array):
    sf_dir = _write_events(str(tmp_path), ts_array)
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", (
        f"{encoding}: ts must normalize to LTZ TIMESTAMP, got {dict(df.dtypes)['ts']}"
    )
    from pyspark.sql import functions as F

    got = [r[0] for r in df.select(F.unix_micros("ts")).orderBy("ts").collect()]
    assert got == sorted(_INSTANTS_US), f"{encoding}: epoch-µs values drifted"


def test_real_testdata_events_ts_is_ltz(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # unix_micros must be legal on it (this is exactly what broke in r3)
    from pyspark.sql import functions as F

    assert df.select(F.unix_micros("ts")).limit(1).count() == 1
