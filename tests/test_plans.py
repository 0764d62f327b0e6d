"""Plan-quality regression tests: assert the physical-plan properties
the 100 TB design depends on (documented in PLANS.md). These run
explain only — no job execution — so they're cheap and catch a
regression (lost pushdown, surprise cartesian, payload column read)
at the plan level before any benchmark would.
"""

from __future__ import annotations

import pytest

from ds_mapreduce_spark.plans.registry import load_all

REGISTRY = load_all()


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_partial_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert plan.count("Exchange") == 1


def test_q5_all_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_no_cartesian_products_anywhere(spark, sf_dir):
    """A CartesianProduct node in any registered query is a scale bug."""
    offenders = [
        name for name in sorted(REGISTRY)
        if "CartesianProduct" in _plan(spark, sf_dir, name)
    ]
    assert offenders == []


def test_text_stats_is_map_only(spark, sf_dir):
    assert "Exchange" not in _plan(spark, sf_dir, "text_stats")


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # no global sort shuffle


def test_metadata_stats_never_reads_payload(spark, sf_dir):
    """The multimodal metadata query must not read the payload bytes:
    only doc_id/text/lang reach the scan, and the binary payload is
    derived lazily per-row, not materialized through a shuffle."""
    plan = _plan(spark, sf_dir, "multimodal_metadata_stats")
    assert "payload" not in plan.split("ReadSchema")[-1]


def test_filter_project_pushes_all_predicates(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filter_project")
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    for col in ("l_shipdate", "l_quantity", "l_returnflag"):
        assert col in pushed, f"{col} not pushed: {pushed}"


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        ("wordcount", 1),
        ("events_sessionization", 1),
        ("asof_join_click_purchase", 1),
        ("dedup_simhash", 2),       # chunk self-join + distinct
        ("dedup_minhash_lsh", 2),   # band groupBy + pair distinct
        ("q14_promo_revenue_ratio", 1),   # month scan + broadcast part, single-row agg
        ("q13_order_count_distribution", 2),  # custkey join+agg share one shuffle
    ],
)
def test_shuffle_budget(spark, sf_dir, name, max_exchanges):
    plan = _plan(spark, sf_dir, name)
    n = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n <= max_exchanges, f"{name}: {n} shuffles (budget {max_exchanges})"


def test_q19_derives_single_side_filters_from_disjunction(spark, sf_dir):
    """The OR-of-ANDs references both join sides; Catalyst must still
    derive the per-side unions and push them into BOTH parquet scans —
    losing this turns a pre-pruned probe into a full fact scan."""
    plan = _plan(spark, sf_dir, "q19_disjunctive_predicates")
    pushed = [seg.split("]")[0] for seg in plan.split("PushedFilters: [")[1:]]
    assert any("l_quantity" in p and "Or(" in p for p in pushed), pushed
    assert any("p_brand" in p and "Or(" in p for p in pushed), pushed
    assert plan.count("BroadcastHashJoin") == 1


def test_q4_semi_join_with_residual_stays_single_shuffle(spark, sf_dir):
    """EXISTS with a cross-table date inequality must compile to ONE
    semi join carrying the residual — not a join + dedup, and never a
    row-multiplying inner join."""
    plan = _plan(spark, sf_dir, "q4_late_shipment_priority")
    assert "LeftSemi" in plan
    n = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n <= 1, plan


def test_q18_reuses_orderkey_partitioning(spark, sf_dir):
    """The HAVING aggregate shuffles on l_orderkey; the join back to
    orders is on the SAME key, so no second fact shuffle may appear."""
    plan = _plan(spark, sf_dir, "q18_large_volume_customers")
    n = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n <= 2, plan


def test_full_outer_never_broadcasts(spark, sf_dir):
    """Full outer must surface unmatched rows from BOTH sides, so a
    broadcast build is semantically unavailable — the plan has to be a
    shuffle join sharing the aggs' custkey partitioning."""
    plan = _plan(spark, sf_dir, "join_full_outer")
    assert "FullOuter" in plan
    assert "BroadcastHashJoin" not in plan
    n = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n <= 2, plan
