"""Collocation-PMI corpus statistics as MERGEABLE count tables.

The PMI score (Church & Hanks 1990) is a pure function of three
associative statistics — unigram counts, adjacent-bigram counts, and
the token total (itself the sum of unigram counts) — so the corpus
state a collocation miner needs is two count tables that merge by
addition under ANY partitioning of the corpus. The batch query
(`plans/text_queries.py:collocation_pmi_topk`) composes
partial → score → top-k in one plan; the streaming twin
(`streaming/jobs.py:run_streaming_pmi_counts`) lands the same
partials per micro-batch
and merges them into versioned state, recomputing the identical
top-k from the merged counts at read time — the
keycount_partial/keycount_merge pattern (operators/skew.py), text
edition.

The support floor (c_ab >= 5) belongs to the SCORING step, never the
partials: a pair seen 3 + 2 times across two shards must clear the
floor after the merge, so the floor is applied only in
`pmi_topk_from_counts`.

100 TB: both partials are one-scan map-side-combined censuses whose
shuffle is vocab/bigram-vocab-sized (Heaps' law, hot tokens absorbed
by partial aggregation); the merge is a union + re-aggregate on
key-cardinality-sized tables; everything after the counts is
vocab-sized. The fixed-point 128-bit score rule is documented at the
registered query (DECIMAL(38,0) DIV ≙ DuckDB HUGEINT //).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ds_mapreduce_spark.functions.text import tokens


def pmi_unigram_partial(docs: DataFrame) -> DataFrame:
    """(w, c) token census of ``docs`` — associative under union."""
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def pmi_bigram_partial(docs: DataFrame) -> DataFrame:
    """(wa, wb, c_ab) adjacent-bigram census — associative under
    union. NO support floor here (see module docstring)."""
    t = docs.select(tokens(F.col("text")).alias("t"))
    return (
        t.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("t"), i.cast("int")).alias("wa"),
                        F.element_at(F.col("t"), (i + 1).cast("int")).alias("wb"),
                    ),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.wa").alias("wa"), F.col("p.wb").alias("wb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    )


def pmi_unigram_merge(*tables: DataFrame) -> DataFrame:
    """Re-aggregate unioned (w, c) partials: counts add."""
    merged = tables[0]
    for t in tables[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy("w").agg(F.sum("c").cast("bigint").alias("c"))


def pmi_bigram_merge(*tables: DataFrame) -> DataFrame:
    """Re-aggregate unioned (wa, wb, c_ab) partials: counts add."""
    merged = tables[0]
    for t in tables[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy("wa", "wb").agg(
        F.sum("c_ab").cast("bigint").alias("c_ab")
    )


def pmi_topk_from_counts(
    uni: DataFrame, big: DataFrame, floor: int = 5, k: int = 30
) -> DataFrame:
    """The scoring tail shared verbatim by the batch query and the
    streaming twin's final read: support floor on the (merged) bigram
    counts, unigram counts joined back on the token key (vocab-sized,
    NOT broadcast — vocab scales with the corpus), the 128-bit exact
    fixed-point PMI argument, TakeOrdered(k) + rank window on the
    bounded tail."""
    tot = uni.agg(F.sum("c").cast("bigint").alias("n"))
    floored = big.where(F.col("c_ab") >= floor)
    scored = (
        floored.join(
            uni.select(F.col("w").alias("wa"), F.col("c").alias("c_a")), "wa"
        )
        .join(uni.select(F.col("w").alias("wb"), F.col("c").alias("c_b")), "wb")
        .crossJoin(F.broadcast(tot))
        .select(
            "wa",
            "wb",
            "c_ab",
            "c_a",
            "c_b",
            F.expr(
                "CAST((CAST(c_ab AS DECIMAL(38,0)) * n * 1000000)"
                " DIV (CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)"
            ).alias("pmi_fp"),
        )
    )
    top = scored.orderBy(F.col("pmi_fp").desc(), "wa", "wb").limit(k)
    w = Window.orderBy(F.col("pmi_fp").desc(), "wa", "wb")
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rnk"),
        "wa",
        "wb",
        "c_ab",
        "c_a",
        "c_b",
        "pmi_fp",
    )
