"""events_decayed_engagement shift-clamp parity (ADVICE r7 item 1).

Spark masks bit-shift counts to 6 bits (shiftright(x, 64) == x) while
DuckDB's ``>>`` saturates to 0 for shifts >= 64 — so an event exactly
64 days older than max(ts) would score at FULL 1024x weight in Spark
and 0 in the oracle. The query now clamps the shift to
least(age_days, 63) on BOTH engines, which yields exactly 0 beyond day
63 (cents * 1024 < 2^63): the intended decay-to-nothing semantics.

The driver's events table currently spans ~30 days, so the production
gate can't exercise this; this test pins it on a synthetic feed whose
ages straddle 63/64/70/128 days (128 = shift 0 under Spark's 6-bit
mask — the worst case: full weight, not just wrong weight).
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from ds_mapreduce_spark.plans.registry import load_all

REGISTRY = load_all()

BASE = dt.datetime(2026, 6, 1, 12, 0, 0)
ROWS = [
    # (user_id, value, age_days relative to the max-ts anchor)
    (1, 100.00, 0),
    (1, 100.00, 1),
    (2, 100.00, 63),   # boundary: clamp target, shifts to 0 on both
    (3, 100.00, 64),   # DuckDB >> saturates; Spark unclamped would be x>>0
    (4, 100.00, 70),   # Spark unclamped: x >> 6
    (5, 100.00, 128),  # Spark unclamped: x >> 0 == full weight
    (6, 50.25, 2),
]


def test_decayed_engagement_clamp_parity(spark, tmp_path):
    tbl = pa.table(
        {
            "user_id": [r[0] for r in ROWS],
            "value": [r[1] for r in ROWS],
            "ts": pa.array(
                [BASE - dt.timedelta(days=r[2]) for r in ROWS],
                type=pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    q = REGISTRY["events_decayed_engagement"]
    sdf = q.fn(spark, str(tmp_path))
    srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    rel = con.sql(q.oracle)
    drows = sorted(tuple(str(x) for x in r) for r in rel.fetchall())
    assert srows == drows, (srows, drows)

    # every user at age >= 63 days decays to exactly nothing
    by_user = {r["user_id"]: r["engagement_fp"] for r in sdf.collect()}
    for uid in (2, 3, 4, 5):
        assert by_user[uid] == 0, (uid, by_user[uid])
    assert by_user[1] > 0 and by_user[6] > 0
