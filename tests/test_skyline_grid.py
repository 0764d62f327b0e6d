"""Edge semantics of skyline_grid_min (the d-dimensional grid/BNL
skyline): duplicate frontier points, cross-cell domination through
PRUNED cells (the minimal-dominator induction the verify stage leans
on), dimension counts beyond the registered d=3, and degenerate
single-point inputs. The corpus-level parity gate covers the graded
query; this pins the hand-checkable cases."""

from __future__ import annotations

from ds_mapreduce_spark.operators.relational import skyline_grid_min


def _run(spark, rows, dims, widths):
    df = spark.createDataFrame(
        rows, "rid bigint, " + ", ".join(f"{d} bigint" for d in dims)
    )
    out = skyline_grid_min(df, dims=dims, widths=widths, id_cols=["rid"])
    return sorted(r["rid"] for r in out.collect())


def _naive(rows, nd):
    pts = {r[0]: r[1:] for r in rows}
    keep = []
    for i, p in pts.items():
        dominated = any(
            all(q[k] <= p[k] for k in range(nd))
            and any(q[k] < p[k] for k in range(nd))
            for j, q in pts.items()
            if j != i
        )
        if not dominated:
            keep.append(i)
    return sorted(keep)


def test_exact_duplicates_all_survive(spark):
    # identical points never strictly dominate each other: both stay,
    # and they also shield nothing (a third dominated point still dies)
    rows = [(1, 5, 5, 5), (2, 5, 5, 5), (3, 6, 6, 6)]
    got = _run(spark, rows, ["x", "y", "z"], [10, 10, 10])
    assert got == [1, 2]


def test_domination_reaches_across_pruned_cells(spark):
    # p sits in a cell whose entire dominating REGION of alive cells is
    # far away: the dominator q's own cell is pruned by r's cell, so
    # the verify must find r (the minimal dominator) instead — the
    # induction argument exercised end-to-end. widths=10: r=(1,1,1)
    # cell (0,0,0); q=(15,15,15) cell (1,1,1) -> pruned by r's cell;
    # p=(26,26,26) cell (2,2,2) -> pruned too. Only r survives.
    rows = [(1, 26, 26, 26), (2, 15, 15, 15), (3, 1, 1, 1)]
    got = _run(spark, rows, ["x", "y", "z"], [10, 10, 10])
    assert got == [3]


def test_anti_chain_fully_survives(spark):
    # a pure anti-chain (each point best in one dim) is its own skyline
    rows = [(1, 1, 9, 9), (2, 9, 1, 9), (3, 9, 9, 1), (4, 5, 5, 5)]
    got = _run(spark, rows, ["x", "y", "z"], [4, 4, 4])
    assert got == _naive(rows, 3) == [1, 2, 3, 4]


def test_matches_naive_on_dense_grid_d3(spark):
    # 4x4x4 lattice plus ties: grid result must equal the O(n^2) oracle
    rows = [
        (i * 100 + j * 10 + k, i * 7 % 11, j * 5 % 9, (i + j + k) % 6)
        for i in range(4)
        for j in range(4)
        for k in range(4)
    ]
    got = _run(spark, rows, ["x", "y", "z"], [3, 3, 2])
    assert got == _naive(rows, 3)


def test_d4_generalization(spark):
    # the operator is d-generic, not 3-hardcoded: 4-dim skyline equals
    # the naive oracle
    rows = [
        (i, (i * 3) % 7, (i * 5) % 6, (i * 2) % 5, (i * 7) % 4)
        for i in range(40)
    ]
    got = _run(spark, rows, ["a", "b", "c", "d"], [2, 2, 2, 2])
    assert got == _naive(rows, 4)


def test_single_point_and_equal_dims(spark):
    assert _run(spark, [(7, 3, 3, 3)], ["x", "y", "z"], [5, 5, 5]) == [7]
