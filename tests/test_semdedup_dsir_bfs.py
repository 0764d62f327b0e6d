"""Edge semantics for the r7 additions: SemDeDup's keep rule,
DSIR's weight-table bound + target skew, and BFS's bipartite hops."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_mapreduce_spark.operators.dedup import semdedup_verdicts
from ds_mapreduce_spark.plans.registry import load_all
from ds_mapreduce_spark.sources.catalog import load_table

REGISTRY = load_all()


def test_semdedup_exactly_one_kept_per_component(spark, sf_dir):
    out = semdedup_verdicts(load_table(spark, sf_dir, "embeddings")).cache()
    per_comp = out.groupBy("comp_id").agg(
        F.sum(F.col("is_kept").cast("int")).alias("n_kept"),
        F.count(F.lit(1)).alias("n"),
        F.max(F.when(F.col("is_kept"), F.col("dist_to_centroid"))).alias("kept_d"),
        F.max("dist_to_centroid").alias("max_d"),
    )
    bad = per_comp.where(
        (F.col("n_kept") != 1) | (F.col("kept_d") != F.col("max_d"))
    ).count()
    assert bad == 0  # one keeper per group, and it is the farthest
    # singletons keep themselves under their own id
    single = out.groupBy("comp_id").agg(
        F.count(F.lit(1)).alias("n"), F.min("vec_id").alias("mid")
    ).where(F.col("n") == 1)
    assert (
        single.join(out, single["comp_id"] == out["vec_id"])
        .where(~F.col("is_kept"))
        .count()
        == 0
    )
    out.unpersist()


def test_semdedup_components_stay_within_cluster(spark, sf_dir):
    out = semdedup_verdicts(load_table(spark, sf_dir, "embeddings"))
    # a component spanning two clusters would break the SemDeDup
    # contract (pairs are only generated within a cluster)
    spans = (
        out.groupBy("comp_id")
        .agg(F.countDistinct("cluster_id").alias("nc"))
        .where(F.col("nc") > 1)
        .count()
    )
    assert spans == 0


def test_dsir_weight_table_bounded_and_target_skewed(spark, sf_dir):
    sel = REGISTRY["dsir_importance_select"].fn(spark, sf_dir).collect()
    assert 0 < len(sel) <= 50
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    en = docs.where(F.col("lang") == "en").count()
    sel_en = sum(1 for r in sel if r["lang"] == "en")
    # importance weights learned FROM the en target must over-select en
    assert sel_en / len(sel) > en / n
    # ranks are a dense 1..k total order
    assert sorted(r["rnk"] for r in sel) == list(range(1, len(sel) + 1))


def test_bfs_hops_alternate_bipartite_sides(spark, sf_dir):
    rows = {r["hops"]: r for r in REGISTRY["graph_bfs_reach"].fn(spark, sf_dir).collect()}
    assert 0 in rows and rows[0]["n_customers"] == 0  # seeds are suppliers
    for h, r in rows.items():
        assert 0 <= h <= 3
        # customer-supplier graph is bipartite: odd hops land on
        # customers, even hops on suppliers
        if h % 2 == 1:
            assert r["n_suppliers"] == 0 and r["n_customers"] == r["n_nodes"]
        else:
            assert r["n_customers"] == 0 and r["n_suppliers"] == r["n_nodes"]
