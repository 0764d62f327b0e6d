"""BM25 inverted-index primitives — the single home for the Okapi
scoring arithmetic and needle selection, shared by the batch queries
(``plans/text_queries.py``: ``bm25_search`` / ``hybrid_search_rerank``)
and the streaming index-maintenance twin
(``streaming/jobs.py:run_streaming_bm25_index``), so the two can never
drift (the batch/stream-unification contract every other twin follows).

The two consumers differ ONLY in where term frequencies come from:

- batch: tf is counted fresh, with the needle broadcast-joined BELOW
  the aggregation (the trigram lesson, plan-locked in
  tests/test_plans.py) so the only token-scale shuffle carries
  needle-matching rows;
- streaming: tf comes from the MAINTAINED postings table — the
  genuine inverted-index probe: per query, work is proportional to
  the needle terms' posting lists, never the corpus.

All arithmetic is exact integer (fixed-point k1=1.2 b=0.75 at x100;
the exact-rational idf surrogate at x1e6) — no float ever crosses the
engine boundary, so scores hash identically against the DuckDB oracle
and are independent of partial-aggregation order, which is precisely
what makes the index state streamable (associative BIGINT partials,
the same contract as the MV/heavy-hitters twins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: exact-rational idf surrogate: (2(N-df)+1)*1e6 DIV (2df+1) — monotone
#: in the BM25 idf argument (tfidf_top_terms convention: no float ln)
IDF_EXPR = "((2 * (d - dft) + 1) * 1000000) DIV (2 * dft + 1)"

#: per-term Okapi weight at x100 fixed point: idf * tf*(k1+1) /
#: (tf + k1*(1 - b + b*dl/avgdl)) with k1=1.2, b=0.75, every division
#: a mirrored floor DIV
SCORE_EXPR = (
    "(idf_int * tf * 220) DIV "
    "(tf * 100 + (120 * (25 + (75 * dl * d) DIV sum_dl)) DIV 100)"
)


def bm25_postings_partial(docs: DataFrame) -> DataFrame:
    """(doc_id, tok, tf) for one document slice — the inverted-index
    delta a micro-batch contributes. Docs are atomic rows, so slices
    never split a document and the union of slice partials IS the
    full postings table (no merge arithmetic needed beyond append)."""
    from ds_mapreduce_spark.functions.text import tokens

    ex = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    return ex.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )


def bm25_docstats_partial(docs: DataFrame) -> DataFrame:
    """(doc_id, dl) for one document slice (empty docs excluded, as in
    the batch scorer)."""
    from ds_mapreduce_spark.functions.text import tokens

    toks = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    return toks.where(F.size("t") > 0).select(
        "doc_id", F.size("t").cast("bigint").alias("dl")
    )


def bm25_dfreq_partial(postings: DataFrame) -> DataFrame:
    """(tok, dft) from a postings slice. Each (doc, tok) pair appears
    once in postings, so per-token row counts ARE document
    frequencies, and slice partials merge by plain summation
    (associative — the streamable-state property)."""
    return postings.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("dft")
    )


def bm25_corpus_stats_partial(dl: DataFrame) -> DataFrame:
    """1-row (d, sum_dl) from a doc-length slice; merges by summation."""
    return dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("d"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )


def bm25_needle(doc_toks: DataFrame, dfreq: DataFrame, min_doc: DataFrame) -> DataFrame:
    """The deterministic query: the 5 globally rarest tokens of the
    min-doc_id document. ``doc_toks`` is any (doc_id, tok) source —
    the raw token explosion in batch, the maintained postings in
    streaming (identical distinct-token sets either way); ``min_doc``
    is a 1-row (mid) frame. 5-row output; callers checkpoint it."""
    return (
        doc_toks.join(F.broadcast(min_doc), doc_toks["doc_id"] == F.col("mid"))
        .select("tok")
        .distinct()
        .join(dfreq, "tok")
        .orderBy("dft", "tok")
        .limit(5)
    )


def bm25_idf(needle: DataFrame, g: DataFrame) -> DataFrame:
    """(tok, idf_int) for the needle terms (5 rows x 1-row stats)."""
    return needle.crossJoin(F.broadcast(g)).select(
        "tok", F.expr(IDF_EXPR).alias("idf_int")
    )


def bm25_score_terms(
    tf: DataFrame, idf: DataFrame, dl: DataFrame, g: DataFrame
) -> DataFrame:
    """(doc_id, bm25_scaled, n_hit_terms): the shared Okapi reduction
    over needle-term frequencies. ``tf`` is (doc_id, tok, tf) already
    restricted to needle tokens; idf broadcasts (5 rows), g broadcasts
    (1 row), dl joins on doc_id — the only shuffle is candidate-sized."""
    scored = (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(g))
        .select("doc_id", F.expr(SCORE_EXPR).alias("score_t"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("score_t").cast("bigint").alias("bm25_scaled"),
        F.count(F.lit(1)).cast("bigint").alias("n_hit_terms"),
    )


def bm25_scores_from_index(
    postings: DataFrame, dl: DataFrame, dfreq: DataFrame, g: DataFrame
) -> DataFrame:
    """Scores derived ENTIRELY from maintained index state — the
    streaming query path. The needle probe touches only min-doc
    postings; tf is a filter on the postings table (no re-tokenize,
    no corpus scan): the shape a 100 TB always-on search tier runs,
    with postings bucketed by token."""
    min_doc = dl.agg(F.min("doc_id").alias("mid"))
    needle = bm25_needle(
        postings.select("doc_id", "tok"), dfreq, min_doc
    ).localCheckpoint(eager=True)
    tf = postings.join(F.broadcast(needle.select("tok")), "tok").select(
        "doc_id", "tok", "tf"
    )
    return bm25_score_terms(tf, bm25_idf(needle, g), dl, g)
