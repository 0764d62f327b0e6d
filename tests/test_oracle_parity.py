"""The in-repo twin of the driver's correctness gate: run every
registered query on Spark AND its DuckDB oracle on the same parquet,
then compare row count, column names, and order-insensitive values.

Stricter than a hash: mismatches show the first differing rows.
Runs at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 to mirror the driver exactly.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from ds_mapreduce_spark.plans.registry import load_all
from ds_mapreduce_spark.sources.catalog import TABLES

REGISTRY = load_all()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(rows, colnames):
    """Sort columns by name, then rows; canonicalize value types."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def canon(v):
        if v is None:
            return "\x00NULL"
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # computed doubles are pre-rounded by the queries; this only
            # normalizes representation (e.g. 1.0 vs 1)
            return repr(round(v, 9))
        return str(v)

    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def test_timezone_hostile_session_still_matches(spark, sf_dir):
    """The driver's session may run in any timezone; load_table pins the
    session to UTC, so a timestamp-heavy query must match its oracle
    even when the caller set something else just before."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        q = REGISTRY["events_tumbling_window"]
        sdf = q.fn(spark, sf_dir)
        spark_rows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
        con = _duck(sf_dir)
        rel = con.sql(q.oracle)
        duck_rows = _normalize(rel.fetchall(), rel.columns)
        assert spark_rows == duck_rows
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    if q.oracle is None:
        # rows-only contract: it runs AND produces something — a query
        # regressing to an empty result must not pass silently (ADVICE r1)
        assert len(spark_rows) > 0, f"{name}: rows-only query returned 0 rows"
        return

    con = _duck(sf_dir)
    rel = con.sql(q.oracle)
    duck_cols = rel.columns
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_n = _normalize([tuple(r) for r in spark_rows], spark_cols)
    d_n = _normalize(duck_rows, duck_cols)
    if s_n != d_n:
        diffs = [(a, b) for a, b in zip(s_n, d_n) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
