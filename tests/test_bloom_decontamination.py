"""Bloom-prescreen decontamination invariants: no false negatives
(exact hits never exceed Bloom hits) and exact agreement with the
broadcast-set exact query on every doc."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_mapreduce_spark.plans.registry import load_all

REGISTRY = load_all()


def test_bloom_no_false_negatives_and_matches_exact_query(spark, sf_dir):
    bloom = REGISTRY["bloom_ngram_decontamination"].fn(spark, sf_dir).cache()
    # Bloom filters have no false negatives: every exact hit passed the prescreen
    assert bloom.where(F.col("n_exact_hits") > F.col("n_bloom_hits")).count() == 0
    # the two-tier pipeline's EXACT verdicts equal the one-tier exact query
    exact = REGISTRY["exact_ngram_decontamination"].fn(spark, sf_dir)
    diff = (
        bloom.select("doc_id", "n_ngrams", "n_exact_hits", "contaminated")
        .exceptAll(
            exact.select(
                "doc_id",
                "n_ngrams",
                F.col("n_hits").alias("n_exact_hits"),
                "contaminated",
            )
        )
        .count()
    )
    assert diff == 0
    # the bitmap earns its keep: the prescreen passes far fewer grams
    # than it rejects (false-positive rate is bounded by the 2^16 bits)
    tot = bloom.agg(
        F.sum("n_ngrams").alias("n"), F.sum("n_bloom_hits").alias("b")
    ).first()
    assert tot["b"] < tot["n"]
    bloom.unpersist()
