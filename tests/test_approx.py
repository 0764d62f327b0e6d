"""Error-bound tests for the approximate aggregates (the rows-only
queries the DuckDB oracle can't check: sketch internals are engine-
specific, but their error CONTRACT is testable against exact answers)
and a recall floor for the IVF ANN path vs the exact brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_mapreduce_spark.plans.registry import load_all
from ds_mapreduce_spark.sources.catalog import load_table

REGISTRY = load_all()


def test_approx_distinct_within_bound(spark, sf_dir):
    approx = {
        r.l_returnflag: r.approx_orders
        for r in REGISTRY["agg_approx_suite"].fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for flag, n in exact.items():
        rel_err = abs(approx[flag] - n) / n
        assert rel_err < 0.05, f"{flag}: approx {approx[flag]} vs exact {n}"


def test_approx_percentile_close_to_exact(spark, sf_dir):
    rows = {
        r.l_returnflag: (r.approx_qty_p50, r.approx_qty_p90)
        for r in REGISTRY["agg_approx_suite"].fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: (r.p50, r.p90)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.5)).alias("p50"),
            F.percentile("l_quantity", F.lit(0.9)).alias("p90"),
        )
        .collect()
    }
    for flag, (p50, p90) in exact.items():
        a50, a90 = rows[flag]
        assert abs(a50 - p50) <= 1.0 and abs(a90 - p90) <= 1.0


def test_ivf_recall_floor(spark, sf_dir):
    """The ANN path must find most of the true neighbors: recall@5 vs
    exact brute force, averaged over the query set, at nprobe=2 of 8
    centroid buckets. The floor is deliberately conservative — the point
    is catching a broken index (recall ~0), not tuning."""
    exact = REGISTRY["knn_bruteforce"].fn(spark, sf_dir)
    ann = REGISTRY["knn_ivf"].fn(spark, sf_dir)
    truth: dict[int, set[int]] = {}
    for r in exact.where(F.col("rnk") <= 5).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    found: dict[int, set[int]] = {}
    for r in ann.where(F.col("rnk") <= 5).collect():
        found.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(truth[q] & found.get(q, set())) / len(truth[q]) for q in truth
    ]
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.5, f"IVF recall@5 collapsed: {avg:.2f}"


def test_hll_rollup_merge_is_lossless_and_bounded(spark, sf_dir):
    """The sketch-merge contract: (a) estimating after hll_union_agg of
    per-group sketches equals sketching the whole partition directly
    (union losslessness — what makes the daily-increment store exact
    w.r.t. the sketch), and (b) the estimate is within 2% of exact."""
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    merged = {
        r.o_orderpriority: r.approx_custs
        for r in o.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .groupBy("o_orderpriority")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_custs"))
        .collect()
    }
    direct = {
        r.o_orderpriority: r.approx_custs
        for r in o.groupBy("o_orderpriority")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("approx_custs"))
        .collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert merged == direct  # union losslessness
    for k, est in merged.items():
        assert abs(est - exact[k]) / exact[k] < 0.02, (k, est, exact[k])
