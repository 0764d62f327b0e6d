"""Unit tests for the temporal join operators (as-of join, bucketed
range join) on tiny literal DataFrames with hand-computed expectations."""

from __future__ import annotations

from ds_mapreduce_spark.operators.temporal import (
    asof_join,
    make_intervals,
    range_join_points_intervals,
)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, "b"), ("u2", 5, "c"), ("u3", 7, "d")],
        "k string, t bigint, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 8, 1.0), ("u1", 15, 2.0), ("u1", 25, 3.0), ("u2", 9, 4.0)],
        "k string, t bigint, v double",
    )
    out = asof_join(left, right, on="k", left_ts="t", right_ts="t", right_payload=["t", "v"])
    got = {(r.k, r.t): (r.asof_t, r.asof_v) for r in out.collect()}
    assert got == {
        ("u1", 10): (8, 1.0),   # 8 <= 10 < 15
        ("u1", 20): (15, 2.0),  # latest <= 20
        ("u2", 5): (None, None),  # right row at 9 is later
        ("u3", 7): (None, None),  # no right rows for key
    }


def test_asof_join_tie_inclusive_vs_exclusive(spark):
    left = spark.createDataFrame([("k", 10)], "k string, t bigint")
    right = spark.createDataFrame([("k", 10, 99.0)], "k string, t bigint, v double")
    inc = asof_join(left, right, "k", "t", "t", ["v"], inclusive=True).collect()[0]
    exc = asof_join(left, right, "k", "t", "t", ["v"], inclusive=False).collect()[0]
    assert inc.asof_v == 99.0
    assert exc.asof_v is None


def test_range_join_buckets_and_residual(spark):
    points = spark.createDataFrame([(0.5,), (2.5,), (4.9,), (5.0,), (9.99,)], "x double")
    intervals = make_intervals(spark, 0.0, 10.0, 5.0)  # [0,5), [5,10)
    out = range_join_points_intervals(points, intervals, "x", "lo", "hi", bucket_width=2.0)
    got = sorted((r.x, r.lo) for r in out.collect())
    assert got == [(0.5, 0.0), (2.5, 0.0), (4.9, 0.0), (5.0, 5.0), (9.99, 5.0)]
    # every point matched exactly one interval
    assert out.count() == points.count()


def test_range_join_point_on_upper_edge_excluded(spark):
    points = spark.createDataFrame([(10.0,)], "x double")
    intervals = make_intervals(spark, 0.0, 10.0, 5.0)
    out = range_join_points_intervals(points, intervals, "x", "lo", "hi", bucket_width=3.0)
    assert out.count() == 0  # [5,10) is half-open


def test_linear_interp_exact_slopes(spark):
    """Gap rows get pv + (nv-pv)*(h-ph) DIV (nh-ph) with truncating
    DIV — checked against hand values for rising, falling (negative
    delta), and non-divisible slopes; observed rows pass through."""
    from ds_mapreduce_spark.operators.temporal import resample_linear_interp

    hourly = spark.createDataFrame(
        [
            # user 1: 100 @h0, 400 @h3 -> gaps at h1,h2: 100+300*k DIV 3
            (1, 0, 2, 100),
            (1, 3, 1, 400),
            # user 2: falling, non-divisible: 10 @h0, 3 @h2 -> h1:
            # 10 + (-7)*1 DIV 2 = 10 + (-3) = 7  (truncation, not floor)
            (2, 0, 1, 10),
            (2, 2, 1, 3),
        ],
        "user_id bigint, h bigint, n bigint, sum_cents bigint",
    )
    out = {
        (r["user_id"], r["hour_start"]): r.asDict()
        for r in resample_linear_interp(hourly).collect()
    }
    assert out[(1, 0)]["filled_cents"] == 100 and not out[(1, 0)]["gap_filled"]
    assert out[(1, 3600)]["filled_cents"] == 200 and out[(1, 3600)]["gap_filled"]
    assert out[(1, 7200)]["filled_cents"] == 300
    assert out[(1, 10800)]["filled_cents"] == 400
    assert out[(2, 3600)]["filled_cents"] == 7  # truncating DIV on negative delta
    assert out[(2, 7200)]["filled_cents"] == 3 and not out[(2, 7200)]["gap_filled"]
    assert len(out) == 7


def test_mad_outliers_lower_median_and_zero_mad(spark, sf_dir):
    """Even-n picks the LOWER median ((n+1) DIV 2); a user with >half
    identical values has MAD 0, so every deviating point flags."""
    from ds_mapreduce_spark.plans.registry import REGISTRY, load_all

    load_all()
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM VALUES "
        # user 1: cents 100,200,300,400 -> lower median 200; devs
        # 100,0,100,200 -> MAD (n=4, rank 2) = 100; outlier iff d>300: none
        "(1, 1, TIMESTAMP '2024-01-01 00:00:00', 1.00),"
        "(1, 2, TIMESTAMP '2024-01-01 00:01:00', 2.00),"
        "(1, 3, TIMESTAMP '2024-01-01 00:02:00', 3.00),"
        "(1, 4, TIMESTAMP '2024-01-01 00:03:00', 4.00),"
        # user 2: 5,5,5,99 -> median 5, devs 0,0,0,94 -> MAD 0 -> the 94 flags
        "(2, 5, TIMESTAMP '2024-01-01 00:00:00', 0.05),"
        "(2, 6, TIMESTAMP '2024-01-01 00:01:00', 0.05),"
        "(2, 7, TIMESTAMP '2024-01-01 00:02:00', 0.05),"
        "(2, 8, TIMESTAMP '2024-01-01 00:03:00', 0.99)"
        " t(user_id, event_id, ts, value)"
    )
    got = {
        r[0]: r
        for r in con.sql(REGISTRY["events_robust_outliers"].oracle).fetchall()
    }
    # oracle semantics pinned here; Spark==oracle pinned by the parity gate
    assert got[1][2] == 200 and got[1][3] == 100 and got[1][4] == 0
    assert got[2][2] == 5 and got[2][3] == 0 and got[2][4] == 1
