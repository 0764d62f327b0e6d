"""Pins the PMI count-merge algebra behind run_streaming_pmi_counts.

The twin's correctness claim is that the unigram/bigram partials are
associative under ANY split of the corpus AND that the support floor
applies only to MERGED counts. The streaming equivalence test
exercises one 4-file chunking end-to-end; these tests pin the algebra
directly — uneven 3-way splits, an empty part, and the semantic core:
a pair whose support accumulates across parts (3 + 2 against floor 5)
must surface after the merge even though no single part clears the
floor.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_mapreduce_spark.operators.colloc import (
    pmi_bigram_merge,
    pmi_bigram_partial,
    pmi_topk_from_counts,
    pmi_unigram_merge,
    pmi_unigram_partial,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_of_any_split_equals_one_shot(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    one_uni = pmi_unigram_partial(docs)
    one_big = pmi_bigram_partial(docs)
    # uneven md5-salted 4-way split plus an empty fifth part — merge
    # must not care
    part_col = F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("s"))), 1, 6), 16, 10).cast("long") % 4
    parts = [docs.where(part_col == i) for i in range(4)]
    parts.append(docs.where(F.lit(False)))  # empty part
    uni = pmi_unigram_merge(*[pmi_unigram_partial(p) for p in parts])
    big = pmi_bigram_merge(*[pmi_bigram_partial(p) for p in parts])
    assert _rows(uni) == _rows(one_uni)
    assert _rows(big) == _rows(one_big)
    assert _rows(pmi_topk_from_counts(uni, big)) == _rows(
        pmi_topk_from_counts(one_uni, one_big)
    )


def test_floor_applies_to_merged_counts_not_partials(spark):
    # 'a b' appears 3x in part one, 2x in part two: no single part
    # clears floor 5, the merged corpus exactly meets it
    p1 = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b")], "doc_id bigint, text string"
    )
    p2 = spark.createDataFrame(
        [(4, "a b"), (5, "a b")], "doc_id bigint, text string"
    )
    uni = pmi_unigram_merge(pmi_unigram_partial(p1), pmi_unigram_partial(p2))
    big = pmi_bigram_merge(pmi_bigram_partial(p1), pmi_bigram_partial(p2))
    merged = pmi_topk_from_counts(uni, big, floor=5, k=30).collect()
    assert [(r.wa, r.wb, r.c_ab) for r in merged] == [("a", "b", 5)]
    # per-part floor would have produced nothing
    solo = pmi_topk_from_counts(
        pmi_unigram_partial(p1), pmi_bigram_partial(p1), floor=5, k=30
    ).collect()
    assert solo == []
