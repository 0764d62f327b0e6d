"""PageRank convergence variant (VERDICT r4 #7): the residual loop must
run the SAME exact-integer step as the oracle-graded fixed-iteration
twin, terminate, and report its iteration count honestly."""

from __future__ import annotations

from ds_mapreduce_spark.plans.registry import load_all

REGISTRY = load_all()


def test_converged_matches_fixed_iterations_bit_for_bit(spark, sf_dir):
    """epsilon 0 + max_iters 3 forces exactly the twin's 3 iterations —
    the ranks must be bit-identical (shared _pagerank_step)."""
    fixed = {
        r.node: r.rank for r in REGISTRY["graph_pagerank"].fn(spark, sf_dir).collect()
    }
    conv = REGISTRY["graph_pagerank_converged"].fn(
        spark, sf_dir, epsilon_ppm=0, max_iters=3
    )
    rows = conv.collect()
    assert all(r.n_iters == 3 for r in rows)
    assert {r.node: r.rank for r in rows} == fixed


def test_converged_terminates_under_default_epsilon(spark, sf_dir):
    rows = REGISTRY["graph_pagerank_converged"].fn(spark, sf_dir).collect()
    assert rows
    n_iters = {r.n_iters for r in rows}
    assert len(n_iters) == 1
    assert 1 <= n_iters.pop() <= 20
    assert all(r.rank > 0 for r in rows)
    # same node set as the twin
    fixed = REGISTRY["graph_pagerank"].fn(spark, sf_dir)
    assert {r.node for r in rows} == {r.node for r in fixed.collect()}
