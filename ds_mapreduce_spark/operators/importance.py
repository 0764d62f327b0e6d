"""DSIR-style hashed-unigram importance machinery (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"),
shared verbatim by the batch query
(plans/text_queries.py:q_dsir_importance_select) and its streaming
twin (streaming/jobs.py:run_streaming_dsir_selection) — the repo's
twin contract: one transformation, two execution modes.

Everything is an associative BIGINT partial, so the weight table
maintains incrementally under ANY micro-batch chunking or arrival
order (the MV/heavy-hitters/BM25-index contract):

  bucket counts (bucket, t_cnt, r_cnt)   merge by per-bucket SUM
  doc profiles  (doc_id, lang, bucket, n) append (docs are atomic rows)

and the selection is a pure function of the final state. The weight is
a Laplace-smoothed target/raw frequency ratio in 2^17 fixed point —
pure integer, engine-portable (the paper's log-ratio surrogate; the
corpus-size normalization constant is uniform across buckets and
omitted, which is rank-order invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ds_mapreduce_spark.functions.text import tokens

#: hashed-unigram vocabulary size: fixed at ANY corpus scale, so the
#: weight table is a constant-size broadcast however big the raw corpus
DSIR_BUCKETS = 1024
#: 2^17 fixed point for the frequency ratio
DSIR_SCALE = 131072
#: Laplace-smoothed fixed-point weight — evaluated identically by the
#: DuckDB oracle (Spark DIV ≙ DuckDB //)
DSIR_W_EXPR = f"((t_cnt + 1) * {DSIR_SCALE}) DIV (r_cnt + 1)"


def dsir_token_buckets(docs: DataFrame, target_lang: str = "en") -> DataFrame:
    """One row per token: (doc_id, lang, bucket). The bucket is the
    md5-portable hash (first 8 hex chars mod DSIR_BUCKETS) so both
    engines route a token identically."""
    return docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    ).withColumn(
        "bucket",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint")
        % DSIR_BUCKETS,
    )


def dsir_bucket_partial(tb: DataFrame, target_lang: str = "en") -> DataFrame:
    """(bucket, t_cnt, r_cnt) — associative: partials from disjoint
    document slices merge by per-bucket SUM."""
    return tb.groupBy("bucket").agg(
        F.sum(F.when(F.col("lang") == target_lang, 1).otherwise(0))
        .cast("bigint")
        .alias("t_cnt"),
        F.count(F.lit(1)).cast("bigint").alias("r_cnt"),
    )


def dsir_bucket_merge(parts: DataFrame) -> DataFrame:
    """Merge bucket-count partials (unioned) back to one row per bucket."""
    return parts.groupBy("bucket").agg(
        F.sum("t_cnt").cast("bigint").alias("t_cnt"),
        F.sum("r_cnt").cast("bigint").alias("r_cnt"),
    )


def dsir_docprof_partial(tb: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket, n) per-doc bucket profile — the per-doc
    sketch a selection tier stores instead of re-tokenizing the corpus
    at re-score time. Append-only across batches (docs are atomic)."""
    return tb.groupBy("doc_id", "lang", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def dsir_weights(bucket_counts: DataFrame) -> DataFrame:
    """(bucket, w): the fixed-point importance weight table — at most
    DSIR_BUCKETS rows whatever the corpus size."""
    return bucket_counts.select("bucket", F.expr(DSIR_W_EXPR).alias("w"))


def dsir_rank_top(scored: DataFrame, k: int = 50) -> DataFrame:
    """Shared presentation: TakeOrdered(k) on (importance DESC, doc_id),
    rank window riding the bounded k-row tail."""
    from pyspark.sql import Window

    top = scored.orderBy(F.col("importance").desc(), "doc_id").limit(k)
    w = Window.orderBy(F.col("importance").desc(), "doc_id")
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rnk"),
        "doc_id",
        "lang",
        "n_tokens",
        "importance",
    )


def dsir_select_from_state(
    docprof: DataFrame, bucket_counts: DataFrame, k: int = 50
) -> DataFrame:
    """The selection as a pure function of the maintained state: score
    every profiled doc against the (broadcast) weight table and keep
    the top-k — identical arithmetic to the batch query's per-token
    path because sum-over-tokens(w) == sum-over-buckets(n·w)."""
    wts = dsir_weights(bucket_counts)
    scored = (
        docprof.join(F.broadcast(wts), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("n") * F.col("w")).cast("bigint").alias("sw"),
            F.sum("n").cast("bigint").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.expr("sw DIV n_tokens").alias("importance"),
        )
    )
    return dsir_rank_top(scored, k)
