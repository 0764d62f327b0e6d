"""Bounds the recall loss of min-shingle BLOCKING (VERDICT r5 #4).

The LSH eval/band-sweep queries grade recall against truth computed
WITHIN the min-shingle blocking key (`_block_pairs`): a Jaccard-τ pair
whose min shingles differ is invisible to both the candidate set and
the truth set, so the reported recall_bp overstates absolute recall by
the block-miss rate. The blocking-theory bound (operators/dedup.py
shingle_profiles docstring) says two docs with Jaccard τ share their
min shingle with probability ≥ τ/(1+τ) — for τ=0.8 that is ≥ 4/9.

This test computes UNBLOCKED all-pairs exact truth at sf0.001 (O(n²)
pairs — a test-only scale; production recall measurement samples) and
asserts (a) blocked truth ⊆ unblocked truth, and (b) the measured
block recall meets the τ/(1+τ) bound.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ds_mapreduce_spark.operators.dedup import ngram_jaccard_pairs, shingle_profiles
from ds_mapreduce_spark.sources.catalog import load_table

TAU = 0.8
T4 = int(TAU * 10000)


def _unblocked_truth(docs):
    """All-pairs half-up integer Jaccard ≥ τ — same acceptance predicate
    as ngram_jaccard_pairs, minus the blocking."""
    p = shingle_profiles(docs, k=3).select("doc_id", "sh", "n_shingles")
    a = p.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        F.col("n_shingles").alias("n_a"),
    )
    b = p.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        F.col("n_shingles").alias("n_b"),
    )
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    union = (F.col("n_a") + F.col("n_b")).cast("long") - inter
    return (
        pairs.select("doc_a", "doc_b", inter.alias("__i"), union.alias("__u"))
        .withColumn("__jacc", F.expr("(20000 * __i + __u) DIV (2 * __u)"))
        .where(F.col("__jacc") >= T4)
        .select("doc_a", "doc_b")
    )


def test_blocked_truth_recall_meets_tau_bound(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    unblocked = _unblocked_truth(docs).localCheckpoint(eager=True)
    blocked = ngram_jaccard_pairs(docs, k=3, threshold=TAU).select("doc_a", "doc_b")

    n_unblocked = unblocked.count()
    assert n_unblocked > 0, "sf0.001 must contain at least one true near-dup pair"

    # (a) soundness: blocking only restricts the pair space — every
    # blocked-truth pair must exist in the unblocked truth.
    extras = blocked.join(unblocked, ["doc_a", "doc_b"], "left_anti").count()
    assert extras == 0

    # (b) the τ/(1+τ) share-probability bound holds in aggregate: the
    # measured block recall must be ≥ 4/9 for τ=0.8. (On this corpus
    # near-dups are template clones with equal min shingles, so the
    # measured value should in fact be far above the bound.)
    n_blocked = blocked.join(unblocked, ["doc_a", "doc_b"], "left_semi").count()
    assert n_blocked * (10000 + T4) >= n_unblocked * T4, (
        f"block recall {n_blocked}/{n_unblocked} below tau/(1+tau) "
        f"= {T4}/{10000 + T4}"
    )


def test_prefix_filter_result_contains_blocked_result(spark, sf_dir):
    """prefix_filter_jaccard_pairs and ngram_jaccard_pairs compute the
    SAME similarity with the same acceptance; the prefix-filter variant
    has a completeness theorem while min-shingle blocking can miss
    pairs — so the prefix-filter result must be a superset of the
    blocked result."""
    from ds_mapreduce_spark.operators.dedup import prefix_filter_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    complete = prefix_filter_jaccard_pairs(docs, k=3, threshold=TAU).select(
        "doc_a", "doc_b"
    )
    blocked = ngram_jaccard_pairs(docs, k=3, threshold=TAU).select("doc_a", "doc_b")
    missing = blocked.join(complete, ["doc_a", "doc_b"], "left_anti").count()
    assert missing == 0
    assert complete.count() >= blocked.count() > 0
