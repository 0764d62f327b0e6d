"""One-off audit (ADVICE r7 item 4): diff executed-plan join strategies
for every registered query that reaches operators/dedup.connected_components,
with the r7 bidir-edge-list eager checkpoint (current code) vs without
it (the r6 shape), at sf0.001. Findings land in PLANS.md and the
per-query locks in tests/test_plans.py.

Run: python scripts/audit_cc_checkpoint.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from ds_mapreduce_spark.session import get_spark  # noqa: E402

CC_QUERIES = [
    "dedup_connected_components",
    "leakage_safe_splits_neardup",
    "entity_resolution_clusters",
    "dedup_semdedup",
]


def no_ckpt_connected_components(edges, src="doc_a", dst="doc_b", max_iter=15):
    """The r6 shape: bidir NOT checkpointed (labels still are)."""
    bidir = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).union(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    labels = (
        bidir.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        msgs = bidir.join(labels, bidir["s"] == labels["id"]).select(
            F.col("d").alias("id"), F.col("comp")
        )
        new_labels = (
            labels.select("id", "comp")
            .union(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def profile(plan: str) -> dict[str, int]:
    return {
        "BHJ": len(re.findall(r"BroadcastHashJoin", plan)),
        "SMJ": len(re.findall(r"SortMergeJoin", plan)),
        "SHJ": len(re.findall(r"ShuffledHashJoin", plan)),
        "BNLJ": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "Cartesian": len(re.findall(r"CartesianProduct", plan)),
        "Shuffles": plan.count("Exchange") - plan.count("BroadcastExchange"),
    }


def main() -> None:
    sf_dir = "/root/testdata/sf0.001"
    spark = get_spark("audit-cc-checkpoint")
    from ds_mapreduce_spark.operators import dedup as dedup_mod
    from ds_mapreduce_spark.plans.registry import load_all

    registry = load_all()
    orig_cc = dedup_mod.connected_components

    results: dict[str, tuple[dict, dict]] = {}
    for name in CC_QUERIES:
        fn = registry[name].fn
        dedup_mod.connected_components = orig_cc
        df_after = fn(spark, sf_dir)
        df_after.collect()
        after = profile(
            df_after._jdf.queryExecution().executedPlan().toString()
        )
        dedup_mod.connected_components = no_ckpt_connected_components
        try:
            df_before = fn(spark, sf_dir)
            df_before.collect()
            before = profile(
                df_before._jdf.queryExecution().executedPlan().toString()
            )
        finally:
            dedup_mod.connected_components = orig_cc
        results[name] = (before, after)

    print(f"{'query':34s} {'metric':10s} {'pre-ckpt':>9s} {'post-ckpt':>10s}")
    for name, (before, after) in results.items():
        for k in before:
            if before[k] or after[k]:
                flag = "  <-- CHANGED" if before[k] != after[k] else ""
                print(f"{name:34s} {k:10s} {before[k]:9d} {after[k]:10d}{flag}")


if __name__ == "__main__":
    main()
