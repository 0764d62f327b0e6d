"""The ingest manifest: the training-data admission pipeline as ONE
composed operator — PII scrub → model-based quality gate → exact
dedup → token-budget shard routing — emitting a per-document verdict
row. This is the decision record a 100 TB ingest tier actually
produces: for every arriving document, WHY it was kept or dropped and
WHERE it was routed, auditable and replayable.

Stage order is deliberate: the scrub is unconditional (PII must not
survive in any branch, including rejected docs that land in audit
logs); the quality gate runs before dedup (a map-only filter is
cheaper than fingerprint state probes, and low-quality duplicates
should be attributed to quality, not dedup); dedup ownership uses the
md5-of-doc_id key — the SAME total order the shard router walks — so
the streaming twin's first-arrival-wins ownership coincides with the
batch rule whenever arrival respects that order (the
corpus_shard_plan twin's established convergence contract).

Every stage is a shared primitive: redaction regexes from the PII
family, the hashed linear scorer from quality_classifier_linear, the
canonicalized-md5 fingerprint from dedup_exact, and
``prefix_sum_over_total_order`` for the distributed shard cumsum.
The streaming twin (``streaming.jobs.run_streaming_ingest_manifest``)
re-composes the same per-batch partials against two state tables
(kept-fingerprint store + 1-row carried token offset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: shared with the PII family (plans/text_queries.py) — kept literal
#: here to avoid a plans -> operators -> plans import cycle; the
#: equivalence of all three patterns is pinned by the oracle hash.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE = r"\b555-[0-9]{4}\b"
PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def redact(text: F.Column) -> F.Column:
    """Email/phone/IP redaction — the scrub every branch passes through."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
        ),
        PII_IP,
        "<IP>",
    )


def scored_rows(docs: DataFrame) -> DataFrame:
    """Map-only per-doc stage: (doc_id, rt scrubbed text, n_tok,
    q hashed-linear quality score, fp canonical fingerprint, okey
    md5-of-doc_id routing key). Zero shuffles — this is the slice-able
    partial both the batch operator and each micro-batch compute."""
    from ds_mapreduce_spark.functions.text import tokens

    w = (
        lambda tok: (
            F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % 64
        )
        * F.lit(2654435761).cast("long")
        % 1001
        - 500
    )
    base = docs.select("doc_id", redact(F.col("text")).alias("rt"))
    return base.select(
        "doc_id",
        "rt",
        F.size(tokens(F.col("rt"))).cast("bigint").alias("n_tok"),
        F.aggregate(
            tokens(F.col("rt")), F.lit(0).cast("long"), lambda acc, tok: acc + w(tok)
        ).alias("q"),
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col("rt")), r"\s+", " "))
        ).alias("fp"),
        F.md5(F.col("doc_id").cast("string")).alias("okey"),
    )


def ingest_manifest(
    docs: DataFrame, budget: int = 2000, quality_threshold: int = 0
) -> DataFrame:
    """One row per document: (doc_id, verdict, n_tok, shard_id) with
    verdict in {'low_quality', 'dup', 'kept'} and shard_id = the
    token-budget shard for kept docs, -1 otherwise. Dedup ownership =
    min (okey, doc_id) among qualified docs per fingerprint; shards
    fill in (okey, doc_id) order via the distributed prefix sum (no
    SinglePartition). ``documents`` is scanned twice, both map-only
    projections (the scored branch and the final manifest join-back)."""
    scored = scored_rows(docs)
    qual = scored.where(F.col("q") >= F.lit(quality_threshold))
    wfp = Window.partitionBy("fp").orderBy("okey", "doc_id")
    owner = (
        qual.withColumn("__rn", F.row_number().over(wfp))
        .where(F.col("__rn") == 1)
        .select("doc_id", "okey", "n_tok")
    )
    from ds_mapreduce_spark.operators.relational import prefix_sum_over_total_order

    kept = prefix_sum_over_total_order(
        owner, [F.col("okey"), F.col("doc_id")], F.col("n_tok"), "cum"
    ).select(
        "doc_id",
        F.expr(f"(cum - n_tok) DIV {budget}").alias("__shard"),
    )
    return (
        scored.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("q") < F.lit(quality_threshold), F.lit("low_quality"))
            .when(F.col("__shard").isNotNull(), F.lit("kept"))
            .otherwise(F.lit("dup"))
            .alias("verdict"),
            "n_tok",
            F.coalesce(F.col("__shard"), F.lit(-1)).cast("bigint").alias("shard_id"),
        )
    )
