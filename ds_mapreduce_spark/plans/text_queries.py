"""Text analysis queries (E9 + BASELINE.json 'text analysis'):
per-document stats, quality scoring, heuristic language-ID, token
counting (whitespace + BPE-ish regex), portable fingerprints, and
corpus-level term statistics.

All pure Catalyst array/string expressions (no Python in any plan) —
the per-record logic a reference user would write inside ``map()``
(src/implm/word_count.rs:6-16) expressed declaratively so it
whole-stage-codegens and the scan prunes to (doc_id, text[, lang]).

Scale notes (100 TB): every query here is embarrassingly parallel per
document except the term-frequency aggregation, which shuffles one row
per distinct term per task (partial agg) — the same shape as the
flagship wordcount.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ds_mapreduce_spark.functions.text import norm_text, portable_fingerprint, tokens
from ds_mapreduce_spark.operators.quota import quota_rank
from ds_mapreduce_spark.plans.registry import register
from ds_mapreduce_spark.sources.catalog import load_table

#: tiny function-word list for the heuristic scorer (the synthetic
#: corpus is English-ish; real pipelines plug in per-language lists)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
_BPE_PATTERN = r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])"


def _stop_ratio(toks: Column) -> Column:
    in_list = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return in_list / F.size(toks)


@register(
    "text_stats",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
)
SELECT doc_id,
       len(t) AS n_tokens,
       len(list_distinct(t)) AS n_distinct,
       ROUND(CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS DOUBLE) / len(t), 4) AS avg_token_len,
       ROUND(len(list_filter(t, x -> x IN {_STOP_SQL})) * 1.0 / len(t), 4) AS stopword_ratio
FROM toks WHERE len(t) > 0
""",
    doc="E9 per-document stats: token count, distinct tokens, mean token "
    "length, stopword ratio — single narrow projection, no shuffle.",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    sum_len = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return (
        docs.select("doc_id", t.alias("t"))
        .where(F.size("t") > 0)
        .select(
            "doc_id",
            F.size("t").alias("n_tokens"),
            F.size(F.array_distinct("t")).alias("n_distinct"),
            F.round(
                F.aggregate(F.col("t"), F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
                / F.size("t"),
                4,
            ).alias("avg_token_len"),
            F.round(_stop_ratio(F.col("t")), 4).alias("stopword_ratio"),
        )
    )


# Integer-exact quality score, 0-100 points: length (≤40) + mean token
# length (≤30) + function-word evidence (≤30). Pure integer arithmetic —
# bit-identical in every engine, no float rounding boundary to disagree on.
_SCORE_SQL = (
    "LEAST(n_tokens, 100) * 2 // 5"
    " + LEAST(sum_len // n_tokens, 8) * 30 // 8"
    " + LEAST(n_stop * 600 // n_tokens, 30)"
)


@register(
    "text_quality_score",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
feats AS (
  SELECT doc_id, len(t) AS n_tokens,
         CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS BIGINT) AS sum_len,
         len(list_filter(t, x -> x IN {_STOP_SQL})) AS n_stop
  FROM toks WHERE len(t) > 0
)
SELECT doc_id,
       CAST({_SCORE_SQL} AS BIGINT) AS quality,
       CASE WHEN {_SCORE_SQL} >= 60 THEN 'high' ELSE 'low' END AS quality_band
FROM feats
""",
    doc="E9 heuristic quality score (length + lexical + function-word "
    "components, the C4/Gopher-rule shape), integer-exact 0-100 points.",
)
def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    feats = docs.select("doc_id", t.alias("t")).where(F.size("t") > 0).select(
        "doc_id",
        F.size("t").cast("bigint").alias("n_tokens"),
        F.aggregate(F.col("t"), F.lit(0), lambda acc, x: acc + F.length(x))
        .cast("bigint")
        .alias("sum_len"),
        F.size(F.filter(F.col("t"), lambda x: x.isin(*STOPWORDS))).cast("bigint").alias("n_stop"),
    )
    score = F.expr(_SCORE_SQL.replace("//", " DIV "))
    return feats.select(
        "doc_id",
        score.cast("bigint").alias("quality"),
        F.when(score >= 60, "high").otherwise("low").alias("quality_band"),
    )


@register(
    "lang_id_heuristic",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, lang, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
pred AS (
  SELECT lang,
         CASE WHEN len(list_filter(t, x -> x IN {_STOP_SQL})) * 1.0 / len(t) >= 0.03
              THEN 'en' ELSE 'und' END AS predicted
  FROM toks WHERE len(t) > 0
)
SELECT lang, predicted, COUNT(*) AS n FROM pred GROUP BY lang, predicted
""",
    doc="E9 heuristic language-ID (function-word-ratio evidence — the "
    "n-gram-profile method degenerates to this on a synthetic vocab) "
    "cross-tabulated against the labeled lang column.",
)
def q_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    pred = docs.select("lang", t.alias("t")).where(F.size("t") > 0).select(
        "lang",
        F.when(_stop_ratio(F.col("t")) >= 0.03, "en").otherwise("und").alias("predicted"),
    )
    return pred.groupBy("lang", "predicted").agg(F.count(F.lit(1)).alias("n"))


@register(
    "lang_breakdown",
    oracle=r"""
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(AVG(n_chars), 4) AS avg_chars,
       CAST(SUM(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))) AS BIGINT) AS total_tokens
FROM documents GROUP BY lang, source
""",
    doc="E9 corpus composition: docs/chars/tokens per (lang, source) — the "
    "mixture report every training-data pipeline starts from.",
)
def q_lang_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum(F.size(tokens(F.col("text")))).cast("bigint").alias("total_tokens"),
    )


@register(
    "token_count",
    oracle=rf"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{_BPE_PATTERN}', 1)) AS n_bpe_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_est_tokens
FROM documents
""",
    doc="E9 token counting three ways: whitespace, BPE-ish pre-tokenizer "
    "regex (letter runs / digit runs / symbols), and the chars/4 estimate.",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 1)).alias("n_bpe_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("n_est_tokens"),
    )


@register(
    "doc_fingerprint",
    oracle=r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
       length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS canon_len
FROM documents
""",
    doc="E9 document fingerprinting: md5 over the canonical form — the "
    "portable, content-derived id replacing the reference's random u64 "
    "output names (src/utils.rs:65).",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        portable_fingerprint(F.col("text")).alias("fingerprint"),
        F.length(norm_text(F.col("text"))).alias("canon_len"),
    )


@register(
    "term_frequencies",
    oracle=r"""
WITH words AS (
  SELECT lang, unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents
)
SELECT lang, word, COUNT(*) AS tf
FROM words WHERE word <> '' GROUP BY lang, word
""",
    doc="E9/R8 generalized term frequency: wordcount keyed by (lang, word).",
)
def q_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", F.explode(F.split("text", r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _winnowing_oracle(w: int = 4, src: str = "documents") -> str:
    """``src`` lets callers run the same generated winnowing SQL over a
    derived corpus CTE (the entropic screen eval) instead of the raw
    documents view."""
    from ds_mapreduce_spark.operators.dedup import HASH_P, SHINGLE_C

    combine = " + ".join(
        f"(th[i+{j}] % {HASH_P}) * {c}" for j, c in enumerate(SHINGLE_C)
    )
    return rf"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM {src}
),
th AS (
  SELECT doc_id,
         list_transform(t, tok -> CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)) AS th
  FROM toks
),
seq AS (
  SELECT doc_id,
         list_transform(range(1, len(th) - 1), i -> ({combine}) % {HASH_P}) AS s
  FROM th WHERE len(th) >= 3
)
SELECT doc_id,
       unnest(list_distinct(list_transform(range(1, len(s) - {w} + 2),
                                           i -> list_min(s[i:i+{w - 1}])))) AS fp
FROM seq WHERE len(s) >= {w}
"""


@register(
    "doc_winnowing_fingerprints",
    oracle=_winnowing_oracle(4),
    doc="E9 rolling-hash document fingerprinting (winnowing / MOSS): "
    "distinct minima of 4-wide windows over the positional 3-gram hash "
    "stream; any shared passage of >= 6 tokens shares a fingerprint. "
    "Map-only per doc (no shuffle); at scale the (fp, doc_id) output "
    "feeds a groupBy(fp) to find cross-doc matches.",
)
def q_doc_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import winnowing_fingerprints

    return winnowing_fingerprints(load_table(spark, sf_dir, "documents"), k=3, w=4)


@register(
    "fuzzy_name_pairs",
    oracle=r"""
WITH names AS (
  SELECT DISTINCT p_name, list_extract(string_split(p_name, ' '), -1) AS blk FROM part
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
""",
    doc="E9 fuzzy string matching: distinct part names blocked by their "
    "last token (the equi-join key that keeps the pair space per-block "
    "instead of O(n²)), exact Levenshtein <= 3 within blocks. The "
    "blocking-then-verify shape is the same as every dedup operator "
    "here — edit distance is just a different verifier.",
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import blocked_levenshtein_pairs

    part = load_table(spark, sf_dir, "part")
    names = part.select("p_name").distinct().select(
        "p_name", F.substring_index("p_name", " ", -1).alias("blk")
    )
    return blocked_levenshtein_pairs(names, "p_name", "blk", 3)


@register(
    "pipeline_corpus_prep",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id, lang, source,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
feats AS (
  SELECT doc_id, lang, source, len(t) AS n_tokens,
         CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS BIGINT) AS sum_len,
         len(list_filter(t, x -> x IN {_STOP_SQL})) AS n_stop
  FROM toks WHERE len(t) > 0
),
kept AS (
  SELECT doc_id, lang, source, n_tokens,
         CAST({_SCORE_SQL} AS BIGINT) AS quality
  FROM feats WHERE {_SCORE_SQL} >= 60
),
reps AS (
  SELECT MIN(doc_id) AS keep_id
  FROM documents
  GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(quality) AS BIGINT) AS sum_quality
FROM kept JOIN reps ON kept.doc_id = reps.keep_id
GROUP BY lang, source
""",
    doc="The end-to-end training-data prep pipeline as ONE plan: quality "
    "filter (integer-exact C4/Gopher-style score >= 60) -> exact dedup "
    "(keep each canonical text's min doc_id) -> per-(lang, source) "
    "corpus stats. Composition stays a single Catalyst plan: the doc "
    "scan fuses with scoring, the dedup groupBy is the only wide stage "
    "before the final agg — what a 100 TB prep job looks like when every "
    "stage is declarative instead of materialized between steps.",
)
def q_pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import exact_dedup_groups

    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    feats = (
        docs.select("doc_id", "lang", "source", t.alias("t"))
        .where(F.size("t") > 0)
        .select(
            "doc_id",
            "lang",
            "source",
            F.size("t").cast("bigint").alias("n_tokens"),
            F.aggregate(F.col("t"), F.lit(0), lambda acc, x: acc + F.length(x))
            .cast("bigint")
            .alias("sum_len"),
            F.size(F.filter(F.col("t"), lambda x: x.isin(*STOPWORDS)))
            .cast("bigint")
            .alias("n_stop"),
        )
    )
    score = F.expr(_SCORE_SQL.replace("//", " DIV "))
    kept = feats.where(score >= 60).select(
        "doc_id", "lang", "source", "n_tokens", score.cast("bigint").alias("quality")
    )
    reps = exact_dedup_groups(docs).select("keep_id")
    return (
        kept.join(reps, kept.doc_id == reps.keep_id)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("quality").cast("bigint").alias("sum_quality"),
        )
    )


@register(
    "deterministic_sample",
    oracle="""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0
GROUP BY lang
""",
    doc="Reproducible ~10% corpus sample by md5 bucket of the key — "
    "unlike seeded sample(), the subset is identical on every engine, "
    "cluster size, and rerun (hash-mod sampling, the production way to "
    "carve stable held-out sets). Predicate is a pure projection: "
    "map-side filter, no extra pass.",
)
def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 10
    return (
        docs.where(bucket == 0)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register(
    "array_functions",
    oracle=r"""
SELECT doc_id,
       array_to_string(list_sort(t)[1:3], ' ')       AS first3_sorted,
       CASE WHEN list_contains(t, 'the') THEN 1 ELSE 0 END AS has_the,
       len(list_distinct(t))                          AS n_distinct,
       list_aggregate(list_transform(t, x -> length(x)), 'max') AS max_token_len
FROM (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
) WHERE len(t) > 0
""",
    doc="Array function suite (sort / slice / contains / distinct / "
    "transform+max) over the token array — ASCII tokens sort identically "
    "under both engines' binary collations; all fused into the scan "
    "projection, no shuffle.",
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    d = docs.select("doc_id", t.alias("t")).where(F.size("t") > 0)
    return d.select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.array_sort("t"), 1, 3)).alias("first3_sorted"),
        F.array_contains("t", "the").cast("int").alias("has_the"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
        F.array_max(F.transform("t", F.length)).alias("max_token_len"),
    )


@register(
    "map_functions",
    oracle="""
SELECT event_id,
       len(json_keys(props)) AS n_props,
       CASE WHEN json_extract_string(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END AS has_k
FROM events
""",
    doc="Map function suite: props parsed once to map<string,string> "
    "(from_json), then map_keys / map_contains_key — the typed-map "
    "counterpart of the JSON-path queries; map construction is one "
    "parse per row in the scan projection.",
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_props"),
        F.map_contains_key(m, "k").cast("int").alias("has_k"),
    )


@register(
    "tfidf_top_terms",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS word
  FROM documents
),
tf AS (SELECT lang, word, COUNT(*) AS tf_lang FROM toks GROUP BY lang, word),
dfreq AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY word),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks),
scored AS (
  SELECT lang, word, tf_lang, df,
         tf_lang * ((1000000 * n_docs) // df) AS tfidf_score
  FROM tf JOIN dfreq USING (word) CROSS JOIN n
)
SELECT lang, word, tf_lang, df, tfidf_score, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY tfidf_score DESC, word) AS rnk
  FROM scored) ranked
WHERE rnk <= 10
""",
    doc="E9 TF-IDF distinctive terms per language: term frequency within "
    "each lang × inverse document frequency over the whole corpus, top 10 "
    "per lang. The idf weight is the EXACT integer (1e6·N) DIV df — a "
    "monotone transform of N/df, so the ranking is the classic tf·idf "
    "ranking without a float log crossing the engine boundary (ln differs "
    "in the last ulp between libm and the JVM). Plan shape: ONE "
    "explode-scale aggregation to (word, lang, tf, per-lang df); since "
    "every doc has exactly one lang, corpus df(word) = Σ_lang df(word, "
    "lang) — a tiny re-agg of the first result, never a second pass over "
    "the exploded tokens. N comes from the docs scan without exploding. "
    "Everything after shuffle 1 is vocabulary-sized.",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ds_mapreduce_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", r"\s+")).alias("word")
    ).where(F.col("word") != "")
    # the ONLY explode-scale shuffle: everything downstream is vocab-sized
    base = tok.groupBy("word", "lang").agg(
        F.count(F.lit(1)).alias("tf_lang"),
        F.count_distinct("doc_id").alias("df_wl"),
    )
    dfreq = base.groupBy("word").agg(F.sum("df_wl").alias("df"))
    n = docs.agg(
        F.sum(F.when(F.size(tokens(F.col("text"))) > 0, 1).otherwise(0)).alias("n_docs")
    )
    scored = (
        base.join(dfreq, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "word",
            "tf_lang",
            "df",
            F.expr("tf_lang * ((1000000 * n_docs) DIV df)").alias("tfidf_score"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.col("tfidf_score").desc(), F.col("word"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("lang", "word", "tf_lang", "df", "tfidf_score", "rnk")
    )


@register(
    "decontamination",
    oracle="WITH fps AS ("
    + _winnowing_oracle(4)
    + r"""),
bench AS (
  SELECT doc_id FROM documents
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
),
bfp AS (
  SELECT DISTINCT fp FROM fps WHERE doc_id IN (SELECT doc_id FROM bench)
),
train AS (
  SELECT doc_id, lang FROM documents
  WHERE doc_id NOT IN (SELECT doc_id FROM bench)
),
cont AS (
  SELECT DISTINCT doc_id FROM fps WHERE fp IN (SELECT fp FROM bfp)
)
SELECT t.lang,
       COUNT(*) AS n_train,
       CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
FROM train t LEFT JOIN cont c ON t.doc_id = c.doc_id
GROUP BY t.lang
""",
    doc="Benchmark decontamination (the held-out-overlap gate every "
    "training-data pipeline runs before a corpus ships): a deterministic "
    "~1/16 md5-bucket of docs stands in for the benchmark set; a training "
    "doc is contaminated if it shares ANY winnowing fingerprint (shared "
    "passage >= 6 tokens) with a benchmark doc. Fingerprints are map-only "
    "per doc; the benchmark fingerprint set is tiny and broadcasts (at "
    "100 TB it's still benchmark-sized — a bloom filter on fp if not), so "
    "the contamination check never shuffles the corpus.",
)
def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import winnowing_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    # benchmark and train docs are DISJOINT, so fingerprinting each
    # side separately costs exactly one pass over the corpus in total —
    # fingerprinting once and semi-joining twice would evaluate the
    # (expensive) fingerprint subtree twice, once per DAG consumer
    bench_fps = (
        winnowing_fingerprints(docs.where(is_bench), k=3, w=4).select("fp").distinct()
    )
    train = docs.where(~is_bench).select("doc_id", "lang")
    cont = (
        winnowing_fingerprints(docs.where(~is_bench), k=3, w=4)
        .join(F.broadcast(bench_fps), "fp", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        train.join(cont, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(F.when(F.col("__hit").isNotNull(), 1).otherwise(0)).alias("n_contaminated"),
            F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)).alias("n_clean"),
        )
    )


@register(
    "stratified_sample",
    oracle=r"""
WITH tagged AS (
  SELECT lang, doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
  FROM documents
),
kept AS (
  SELECT lang, doc_id FROM tagged
  WHERE bucket < (CASE WHEN lang = 'en' THEN 10 ELSE 40 END)
)
SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS min_id,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM kept GROUP BY lang
""",
    doc="Stratified hash-mod sampling: per-stratum rates (10% for the "
    "majority lang, 40% for the tail) from the SAME md5 bucket function as "
    "deterministic_sample — the rebalancing carve every multilingual "
    "training mix needs, reproducible across engines, cluster sizes and "
    "reruns. The rate lookup is a CASE projection (broadcast-map at scale "
    "for many strata): pure map-side filter, no shuffle before the "
    "per-lang audit agg; output is the audit (count + id checksum), which "
    "pins the exact membership without hashing all rows.",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    rate = F.when(F.col("lang") == "en", 10).otherwise(40)
    kept = docs.where(bucket < rate)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("doc_id").alias("min_id"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
    )


@register(
    "doc_repetition_stats",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
tagged AS (
  SELECT doc_id,
         list_concat(
           list_transform(t, x -> 'w ' || x),
           CASE WHEN len(t) >= 2
                THEN list_transform(range(1, len(t)), i -> 'b ' || t[i] || ' ' || t[i+1])
                ELSE [] END) AS units
  FROM toks WHERE len(t) > 0
),
counts AS (
  SELECT doc_id, u, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(units) AS u FROM tagged)
  GROUP BY doc_id, u
),
agg AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN u LIKE 'w %' THEN c ELSE 0 END) AS BIGINT) AS n_words,
         CAST(COUNT(CASE WHEN u LIKE 'w %' THEN 1 END) AS BIGINT)      AS n_distinct,
         CAST(MAX(CASE WHEN u LIKE 'w %' THEN c END) AS BIGINT)        AS top_word_count,
         CAST(COALESCE(MAX(CASE WHEN u LIKE 'b %' THEN c END), 0) AS BIGINT) AS top_bigram_count
  FROM counts GROUP BY doc_id
)
SELECT doc_id, n_words, n_distinct, top_word_count, top_bigram_count,
       (20000 * (n_words - n_distinct) + n_words) // (2 * n_words) AS dup_word_bp,
       CASE WHEN n_words > 1
            THEN (20000 * top_bigram_count + (n_words - 1)) // (2 * (n_words - 1))
            ELSE 0 END AS top_bigram_bp
FROM agg
""",
    doc="Gopher-style per-document repetition signals (the "
    "quality-filter family of Rae et al. 2021 §A1.1): duplicate-word "
    "fraction, most-frequent-word count, and most-frequent-BIGRAM count "
    "per doc, as half-up integer basis points (never float division). "
    "Words and bigrams are counted in ONE pass: each doc emits a single "
    "tagged unit array ('w <tok>' + 'b <tok> <tok>'), one explode, one "
    "(doc_id, unit) count, one per-doc conditional-max — two linear "
    "shuffles total, one scan. Bigrams are built with zip_with over two "
    "shifted slices (linear; deliberately NOT the element_at(transform) "
    "shingle shape, which Catalyst can collapse into O(n²) chained "
    "projections). 100 TB: both shuffle keys are (doc, unit)-grained — "
    "cardinality is bounded by corpus token count, no hot keys beyond "
    "ordinary word skew, which partial aggregation absorbs map-side.",
)
def q_doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    n = F.size("t")
    bigrams = F.zip_with(
        F.slice(F.col("t"), 1, n - 1),
        F.slice(F.col("t"), 2, n - 1),
        lambda a, b: F.concat_ws(" ", F.lit("b"), a, b),
    )
    tagged = docs.select("doc_id", t.alias("t")).where(F.size("t") > 0).select(
        "doc_id",
        F.concat(
            F.transform(F.col("t"), lambda x: F.concat_ws(" ", F.lit("w"), x)),
            F.when(n >= 2, bigrams).otherwise(F.array().cast("array<string>")),
        ).alias("units"),
    )
    counts = (
        tagged.select("doc_id", F.explode("units").alias("u"))
        .groupBy("doc_id", "u")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    is_w = F.col("u").startswith("w ")
    agg = counts.groupBy("doc_id").agg(
        F.sum(F.when(is_w, F.col("c")).otherwise(0)).cast("bigint").alias("n_words"),
        F.count(F.when(is_w, F.lit(1))).cast("bigint").alias("n_distinct"),
        F.max(F.when(is_w, F.col("c"))).cast("bigint").alias("top_word_count"),
        F.coalesce(F.max(F.when(~is_w, F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("top_bigram_count"),
    )
    return agg.select(
        "doc_id",
        "n_words",
        "n_distinct",
        "top_word_count",
        "top_bigram_count",
        F.expr("(20000 * (n_words - n_distinct) + n_words) DIV (2 * n_words)").alias(
            "dup_word_bp"
        ),
        F.when(
            F.col("n_words") > 1,
            F.expr("(20000 * top_bigram_count + (n_words - 1)) DIV (2 * (n_words - 1))"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("top_bigram_bp"),
    )


@register(
    "boilerplate_ngram_coverage",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
  FROM toks WHERE len(t) >= 3
),
boiler AS (
  SELECT s FROM sh GROUP BY s HAVING COUNT(*) >= 4
),
per AS (
  SELECT sh.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_units,
         CAST(COUNT(boiler.s) AS BIGINT) AS n_boilerplate
  FROM sh LEFT JOIN boiler ON sh.s = boiler.s
  GROUP BY sh.doc_id
)
SELECT doc_id, n_units, n_boilerplate,
       (20000 * n_boilerplate + n_units) // (2 * n_units) AS boilerplate_bp,
       CASE WHEN (20000 * n_boilerplate + n_units) // (2 * n_units) < 2500
            THEN 1 ELSE 0 END AS keep
FROM per
""",
    doc="C4-style corpus-level boilerplate detection (Raffel et al. 2020 "
    "§2.2, adapted from lines to word 3-grams — the corpus is "
    "single-line): a distinct 3-gram occurring in >= 4 documents is "
    "boilerplate; each doc reports its unit count, boilerplate-unit "
    "count, half-up integer-bp coverage, and a keep flag (< 25% "
    "coverage). Trigrams are built from three shifted slices via nested "
    "zip_with (linear — not the collapsible element_at shape). Plan: the "
    "classic two-pass C4 shape — pass 1 counts doc frequency per unit "
    "(one linear shuffle, hot common n-grams absorbed map-side by "
    "partial agg), pass 2 re-derives the units and LEFT-joins the df>=4 "
    "'boilerplate list' (clean docs keep n_boilerplate=0) into the "
    "per-doc agg. 100 TB: the boilerplate list is the "
    "high-doc-frequency tail — tiny relative to the corpus, so the "
    "join broadcasts (AQE decides), and the second corpus pass is the "
    "unavoidable one every count-then-filter pipeline pays; checkpoint "
    "the exploded units only if the tokenize cost dominates the scan.",
)
def q_boilerplate_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    n = F.size("t")
    tri = F.zip_with(
        F.slice(F.col("t"), 1, n - 2),
        F.zip_with(
            F.slice(F.col("t"), 2, n - 2),
            F.slice(F.col("t"), 3, n - 2),
            lambda b, c: F.concat_ws(" ", b, c),
        ),
        lambda a, bc: F.concat_ws(" ", a, bc),
    )
    sh = (
        docs.select("doc_id", t.alias("t"))
        .where(F.size("t") >= 3)
        .select("doc_id", F.explode(F.array_distinct(tri)).alias("s"))
    )
    boiler = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= 4)
        .select("s", F.lit(1).alias("is_boiler"))
    )
    per = (
        sh.join(boiler, "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_units"),
            F.count("is_boiler").cast("bigint").alias("n_boilerplate"),
        )
    )
    bp = F.expr("(20000 * n_boilerplate + n_units) DIV (2 * n_units)")
    return per.select(
        "doc_id",
        "n_units",
        "n_boilerplate",
        bp.alias("boilerplate_bp"),
        F.when(bp < 2500, 1).otherwise(0).alias("keep"),
    )


@register(
    "domain_quota_sample",
    oracle="""
WITH ranked AS (
  SELECT source, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS qrank
  FROM documents
)
SELECT source, doc_id, qrank FROM ranked WHERE qrank <= 10
""",
    doc="Per-domain quota cap (the anti-domination step of every web "
    "training mix — CommonCrawl-style pipelines cap docs per registrable "
    "domain): keep AT MOST 10 docs per source, chosen by md5-of-key rank "
    "(deterministic on every engine/cluster/rerun, unlike seeded "
    "sampling; ties broken by doc_id). Emits the kept membership itself "
    "(source, doc_id, rank), so the carve is auditable row-by-row. Plan: "
    "one shuffle on source + per-partition sort, rank filter. 100 TB: "
    "the hash rank is uniform, so a giant domain is pre-thinned with "
    "quota_rank's hash-threshold filter (keep md5 < bound chosen from "
    "the domain's doc count; ``prethin_factor`` arg, default off so the "
    "graded plan stays the plain window) before the exact window — "
    "turning the hot-domain sort into a near-quota-sized one; the "
    "window itself stays the exact, auditable arbiter. Skew proof: "
    "tests/test_quota.py.",
)
def q_domain_quota_sample(
    spark: SparkSession, sf_dir: str, prethin_factor: int | None = None
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ranked = quota_rank(
        docs.select("source", "doc_id"),
        ["source"],
        "doc_id",
        10,
        prethin_factor=prethin_factor,
        rank_col="qrank",
    )
    return ranked.where(F.col("qrank") <= 10).select("source", "doc_id", "qrank")


@register(
    "sequence_packing",
    oracle=r"""
WITH toks AS (
  SELECT lang, source, doc_id,
         len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tok
  FROM documents
), packed AS (
  SELECT lang, source, doc_id, n_tok,
         CAST(SUM(n_tok) OVER (PARTITION BY lang, source ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tok AS BIGINT) AS start_tok
  FROM toks
)
SELECT lang, source,
       CAST(start_tok // 2048 AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS seq_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY lang, source, seq_id
""",
    doc="GPT-style sequence packing (concat-and-split): within each "
    "(lang, source) shard, documents are concatenated in deterministic "
    "doc_id order and split into 2048-token training sequences; each "
    "doc is assigned to the sequence its FIRST token lands in (running "
    "token sum via a window frame, integer DIV for the boundary). "
    "Output: per-sequence doc count, token count, and doc-id span — "
    "the packing manifest a loader would materialize. One shuffle "
    "total: the window's (lang, source) exchange also satisfies the "
    "final group-by's clustering (seq_id is a function of data already "
    "co-located), locked by a plan test. 100 TB: packing is per-shard "
    "parallel; the within-shard ORDER BY doc_id sort is a single task "
    "per shard, so real corpora sub-shard by deterministic doc_id "
    "ranges first (shard = hash(doc_id) DIV k), keeping every sort "
    "in-memory while preserving a reproducible pack order.",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        "lang",
        "source",
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok"),
    )
    packed = toks.withColumn(
        "start_tok", (F.sum("n_tok").over(w) - F.col("n_tok")).cast("bigint")
    )
    return (
        packed.withColumn("seq_id", F.expr("start_tok DIV 2048"))
        .groupBy("lang", "source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


#: PII regexes restricted to the RE2 ∩ Java-regex common dialect (char
#: classes, bounded repeats, \b): both engines must match byte-identically.
_PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_PHONE = r"\b555-[0-9]{4}\b"
_PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scrub_rows(docs: DataFrame) -> DataFrame:
    """Per-row PII inject+detect+redact (no aggregation): the map-only
    transformation shared by the batch query (which aggregates it) and
    the streaming twin (``streaming.jobs.run_streaming_pii_scrub`` —
    being stateless, the same column expressions run unchanged under
    ``readStream``). Returns (lang, n_email, n_phone, n_ip, rt)."""
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" contact u"), F.col("doc_id").cast("string"), F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" call 555-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"), F.lit(" now")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" ip 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit("."),
                (F.col("doc_id") % 100).cast("string"),
                F.lit(" done"),
            ),
        ).otherwise(F.lit("")),
    )
    rt = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
        ),
        _PII_IP,
        "<IP>",
    )
    return docs.select(
        "lang",
        F.regexp_count(aug, F.lit(_PII_EMAIL)).alias("n_email"),
        F.regexp_count(aug, F.lit(_PII_PHONE)).alias("n_phone"),
        F.regexp_count(aug, F.lit(_PII_IP)).alias("n_ip"),
        rt.alias("rt"),
    )



@register(
    "pii_redaction",
    oracle=rf"""
WITH aug AS (
  SELECT lang, doc_id,
         text
         || CASE WHEN doc_id % 3 = 0 THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) || ' done' ELSE '' END
         AS t
  FROM documents
), red AS (
  SELECT lang,
         len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_email,
         len(regexp_extract_all(t, '{_PII_PHONE}')) AS n_phone,
         len(regexp_extract_all(t, '{_PII_IP}')) AS n_ip,
         regexp_replace(regexp_replace(regexp_replace(t,
            '{_PII_EMAIL}', '<EMAIL>', 'g'),
            '{_PII_PHONE}', '<PHONE>', 'g'),
            '{_PII_IP}', '<IP>', 'g') AS rt
  FROM aug
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
       CAST(SUM(n_phone) AS BIGINT) AS phones_redacted,
       CAST(SUM(n_ip) AS BIGINT) AS ips_redacted,
       CAST(SUM(CAST(('0x' || substr(md5(rt), 1, 8)) AS BIGINT)) AS BIGINT) AS redacted_checksum
FROM red GROUP BY lang
""",
    doc="PII detection + redaction — the scrubbing pass every training "
    "corpus needs before release. The synthetic corpus contains no PII, "
    "so the query first INJECTS deterministic emails / phone numbers / "
    "IPs into a doc_id-keyed subset (identically in Spark and the "
    "oracle), then detects (regexp_count) and redacts (regexp_replace "
    "chain, fixed order) and grades per-lang match counts plus an md5 "
    "checksum of every redacted text — byte-identical redaction is the "
    "only way the hash matches. Patterns are restricted to the "
    "RE2 ∩ Java-regex common dialect so both engines agree. 100 TB: "
    "map-only scan (detection and redaction fuse into one codegen "
    "stage, no Python); one aggregation shuffle.",
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = pii_scrub_rows(load_table(spark, sf_dir, "documents"))
    return red.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").cast("bigint").alias("emails_redacted"),
        F.sum("n_phone").cast("bigint").alias("phones_redacted"),
        F.sum("n_ip").cast("bigint").alias("ips_redacted"),
        F.sum(F.conv(F.substring(F.md5(F.col("rt")), 1, 8), 16, 10).cast("long"))
        .cast("bigint")
        .alias("redacted_checksum"),
    )


@register(
    "unigram_commonness",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS token
  FROM documents
), cnt AS (
  SELECT token, COUNT(*) AS c FROM toks GROUP BY token
), tot AS (
  SELECT COUNT(*) AS t FROM toks
), per_doc AS (
  SELECT t1.doc_id, t1.lang,
         CAST(SUM(cnt.c) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM toks t1 JOIN cnt USING (token)
  GROUP BY t1.doc_id, t1.lang
)
SELECT lang,
       CAST(((s * 10000) // (n * (SELECT t FROM tot))) // 25 AS BIGINT) AS commonness_bucket,
       COUNT(*) AS n_docs
FROM per_doc
GROUP BY lang, commonness_bucket
""",
    doc="CCNet-style corpus-frequency quality score, integer-exact: pass "
    "1 builds the corpus unigram table; pass 2 scores each document by "
    "its mean token corpus-probability in basis points — "
    "(sum of per-occurrence corpus counts * 10000) DIV (doc tokens * "
    "corpus tokens) — and the output is the per-lang histogram over "
    "25-bp buckets (docs made of rare tokens land low, boilerplate-y "
    "docs high: the cheap stand-in for LM-perplexity filtering when no "
    "model is available). No floats anywhere, so Spark and DuckDB agree "
    "exactly. Spark fuses pass 1 into a COUNT() OVER (PARTITION BY "
    "token) window on the exploded tokens — 3 shuffles total (token, "
    "doc, histogram) instead of the join formulation's 4; the corpus "
    "total is a 1-row broadcast. 100 TB: the token window shuffles one "
    "row per occurrence — the same scale as wordcount's explode — and "
    "hot tokens are bounded by per-partition partial counting if "
    "skewed (same salting seam as mr_salted_wordcount).",
)
def q_unigram_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    exploded = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("token")
    )
    wc = Window.partitionBy("token")
    per_doc = (
        exploded.withColumn("c", F.count(F.lit(1)).over(wc))
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    tot = exploded.agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    return (
        per_doc.crossJoin(F.broadcast(tot))
        .withColumn(
            "commonness_bucket", F.expr("((s * 10000) DIV (n * t)) DIV 25")
        )
        .groupBy("lang", "commonness_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "doc_chunking",
    oracle=r"""
WITH sized AS (
  SELECT doc_id, text, length(text) AS len,
         CASE WHEN length(text) <= 80 THEN CAST(1 AS BIGINT)
              ELSE (length(text) - 80 + 59) // 60 + 1 END AS n_chunks
  FROM documents
), chunks AS (
  SELECT doc_id, len, unnest(generate_series(0, n_chunks - 1)) AS chunk_idx, text
  FROM sized
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * 60 AS BIGINT) AS chunk_start,
       CAST(length(substr(text, chunk_idx * 60 + 1, 80)) AS BIGINT) AS chunk_len,
       md5(substr(text, chunk_idx * 60 + 1, 80)) AS chunk_md5
FROM chunks
""",
    doc="RAG-style document chunking: fixed 80-char windows with 20-char "
    "overlap (stride 60), each chunk emitted with its offset, length, "
    "and md5 fingerprint — the manifest an embedding/indexing stage "
    "consumes. Chunk count is closed-form integer arithmetic ((len-80"
    "+59) DIV 60 + 1), so Spark's sequence+explode and the oracle's "
    "generate_series agree exactly; final short chunks keep their "
    "true length. 100 TB: map-only — sequence/explode/substring all "
    "fuse into one codegen stage, ZERO shuffles (plan-locked); output "
    "scales as corpus_chars/stride, and the fingerprints feed the "
    "exact-dedup and decontamination stages downstream.",
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_chunks = F.when(F.length("text") <= 80, F.lit(1).cast("bigint")).otherwise(
        F.expr("(length(text) - 80 + 59) DIV 60 + 1")
    )
    chunked = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk = F.substring(F.col("text"), (F.col("chunk_idx") * 60 + 1).cast("int"), 80)
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        (F.col("chunk_idx") * 60).cast("bigint").alias("chunk_start"),
        F.length(chunk).cast("bigint").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )


@register(
    "span_corruption_plan",
    oracle=r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
), sized AS (
  SELECT doc_id, len(t) AS n FROM toks WHERE len(t) > 0
), masks AS (
  SELECT doc_id, n,
         list_transform(range(n),
           i -> CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 20 < 3
         ) AS m
  FROM sized
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(len(list_filter(m, x -> x)) AS BIGINT) AS n_masked,
       CAST(list_aggregate(list_transform(range(n),
              i -> CASE WHEN m[i + 1] AND (i = 0 OR NOT m[i]) THEN 1 ELSE 0 END),
            'sum') AS BIGINT) AS n_spans,
       CAST(len(list_filter(m, x -> x)) * 10000 // n AS BIGINT) AS corruption_bp
FROM masks
""",
    doc="T5-style span-corruption mask planning, fully deterministic: "
    "each token position is masked iff md5(doc_id:pos)'s leading 32 "
    "bits mod 20 < 3 (a portable 15% pseudo-noise both engines derive "
    "identically — the repo's md5-integer convention), and contiguous "
    "masked runs count as spans (mask-start positions: masked AND "
    "predecessor unmasked). Output per doc: token count, masked "
    "count, span count, corruption rate in integer bp — the denoising-"
    "objective manifest a T5/UL2 data loader consumes, reproducible "
    "across runs and engines with no RNG state. 100 TB: map-only — "
    "mask derivation, span counting, and rates are one array-"
    "expression projection inside the scan stage; ZERO shuffles "
    "(plan-locked). DuckDB 1-indexes list access (m[i+1]); Spark's "
    "element_at is also 1-indexed, so the lag test is i=0 OR NOT "
    "m[i] on both sides.",
)
def q_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    sized = docs.select("doc_id", F.size(t).alias("n")).where(F.col("n") > 0)
    pos_hash = lambda i: (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), i.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 20
        < 3
    )
    masks = sized.select(
        "doc_id",
        "n",
        F.transform(F.sequence(F.lit(0), F.col("n") - 1), pos_hash).alias("m"),
    )
    is_start = lambda i: F.when(
        F.element_at("m", (i + 1).cast("int"))
        & ((i == 0) | ~F.element_at("m", i.cast("int"))),
        1,
    ).otherwise(0)
    return masks.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.size(F.filter("m", lambda x: x)).cast("bigint").alias("n_masked"),
        F.aggregate(
            F.transform(F.sequence(F.lit(0), F.col("n") - 1), is_start),
            F.lit(0),
            lambda a, x: a + x,
        )
        .cast("bigint")
        .alias("n_spans"),
        F.expr("CAST(size(filter(m, x -> x)) * 10000 DIV n AS BIGINT)").alias(
            "corruption_bp"
        ),
    )


@register(
    "mixture_rebalance",
    oracle="""
WITH quota AS (
  SELECT CAST(MIN(cnt) AS BIGINT) AS q
  FROM (SELECT COUNT(*) AS cnt FROM documents GROUP BY lang)
),
ranked AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
  FROM documents
),
kept AS (
  SELECT lang, doc_id FROM ranked WHERE r <= (SELECT q FROM quota)
)
SELECT lang,
       COUNT(*) AS n_kept,
       CAST(SUM(doc_id) AS BIGINT) AS kept_id_checksum
FROM kept GROUP BY lang
""",
    doc="Uniform-mixture rebalancing — the language-mixture step of a "
    "multilingual training recipe: pass 1 derives the per-lang quota "
    "from the DATA (the smallest language's count — the largest "
    "uniform mixture the corpus supports, unlike domain_quota_sample's "
    "fixed cap), pass 2 keeps exactly quota docs per lang by md5-of-id "
    "rank (deterministic on every engine/cluster/rerun) and grades the "
    "kept membership via an id checksum. The 1-row quota broadcasts "
    "into the rank filter. 100 TB: identical shape to the quota "
    "sampler — one lang shuffle for the window, quota_rank's "
    "hash-threshold pre-thinning for giant languages (``prethin_factor`` "
    "arg, default off, fed the data-derived quota Column; skew proof in "
    "tests/test_quota.py); generalizing to arbitrary target shares "
    "replaces MIN(cnt) with round(share * total), same plan.",
)
def q_mixture_rebalance(
    spark: SparkSession, sf_dir: str, prethin_factor: int | None = None
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    quota = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.min("cnt").cast("bigint").alias("q"))
    )
    base = docs.select("lang", "doc_id").crossJoin(F.broadcast(quota))
    ranked = quota_rank(
        base,
        ["lang"],
        "doc_id",
        F.col("q"),
        prethin_factor=prethin_factor,
        rank_col="r",
    )
    kept = ranked.where(F.col("r") <= F.col("q"))
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").cast("bigint").alias("kept_id_checksum"),
    )


#: power-of-two length-bucket boundaries shared by query and oracle
_LEN_BUCKETS = (8, 16, 32, 64, 128)


def _bucket_case_sql(col: str) -> str:
    cases = " ".join(
        f"WHEN {col} <= {b} THEN {b}" for b in _LEN_BUCKETS
    )
    return f"CASE {cases} ELSE {_LEN_BUCKETS[-1] * 2} END"


@register(
    "length_bucketed_batching",
    oracle=rf"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n
  FROM documents
), sized AS (
  SELECT doc_id, n, {_bucket_case_sql('n')} AS bucket FROM toks WHERE n > 0
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       CAST(MAX(n) AS BIGINT) AS max_tokens,
       CAST((COUNT(*) * MAX(n) - SUM(n)) * 10000 // (COUNT(*) * MAX(n)) AS BIGINT) AS padding_waste_bp
FROM sized GROUP BY bucket
""",
    doc="Length-bucketed batching report — the padding-efficiency "
    "analysis behind dynamic batching: docs bucket by token count "
    "into power-of-two boundaries (CASE thresholds shared verbatim "
    "with the oracle — no log2 floats whose boundary rounding could "
    "diverge), and each bucket reports doc count, token mass, the "
    "batch-shaping max, and padding waste in integer bp "
    "((n·max − total)·10⁴ DIV (n·max)) — what fraction of a "
    "rectangular batch padded to the bucket max is wasted. The "
    "operational knob: more buckets → less padding but smaller "
    "batches. Map-only projection + one ≤6-group shuffle; partial agg "
    "makes the shuffle constant-size at any corpus scale.",
)
def q_length_bucketed_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(tokens(F.col("text")))
    bucket = F.lit(_LEN_BUCKETS[-1] * 2)
    for b in reversed(_LEN_BUCKETS):
        bucket = F.when(n <= b, b).otherwise(bucket)
    sized = docs.select(n.alias("n"), bucket.alias("bucket")).where(F.col("n") > 0)
    return sized.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").cast("bigint").alias("total_tokens"),
        F.max("n").cast("bigint").alias("max_tokens"),
        F.expr(
            "CAST((COUNT(*) * MAX(n) - SUM(n)) * 10000 DIV (COUNT(*) * MAX(n)) AS BIGINT)"
        ).alias("padding_waste_bp"),
    ).withColumn("bucket", F.col("bucket").cast("bigint"))


@register(
    "vocab_oov_rates",
    oracle=r"""
WITH words AS (
  SELECT doc_id, lang,
         unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS w
  FROM documents
),
vocab AS (
  SELECT w FROM (
    SELECT w, COUNT(*) AS c FROM words GROUP BY w ORDER BY c DESC, w LIMIT 16
  )
),
per_doc AS (
  SELECT doc_id, lang,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov
  FROM words LEFT JOIN vocab v USING (w)
  GROUP BY doc_id, lang
)
SELECT lang,
       CAST((oov * 10000 // n) // 500 AS BIGINT) AS oov_bucket,
       COUNT(*) AS n_docs
FROM per_doc
GROUP BY lang, oov_bucket
""",
    doc="Tokenizer vocabulary coverage — the OOV audit run before "
    "committing a vocab: pass 1 takes the top-16 words by (count DESC, "
    "word) — a total order, so both engines pick the identical vocab — "
    "pass 2 computes each doc's out-of-vocab token rate against it "
    "(left join, integer bp) and reports the per-lang histogram in 5% "
    "buckets. High-OOV languages tell you the vocab under-serves them "
    "— the signal behind per-language vocab allocation. 100 TB: the "
    "vocab is LIMIT-bounded (broadcastable at any corpus size), the "
    "word join is an equi-join on the token, and the per-doc re-agg "
    "reuses wordcount's explode-scale shuffle shape.",
)
def q_vocab_oov_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("w")
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(16)
        .select("w", F.lit(1).alias("__in_vocab"))
    )
    per_doc = (
        words.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("oov"),
        )
    )
    return (
        per_doc.withColumn("oov_bucket", F.expr("(oov * 10000 DIV n) DIV 500"))
        .groupBy("lang", "oov_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "exact_ngram_decontamination",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(range(1, len(t) - 3),
                                      i -> array_to_string(t[i:i+4], ' '))) AS gs
  FROM toks
),
bench AS (
  SELECT DISTINCT g FROM grams, UNNEST(gs) u(g)
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
),
-- COALESCE: an empty benchmark bucket must yield [] (0 hits, matching
-- Spark's left-join NULL), not a NULL list that nulls every n_hits
bl AS (SELECT COALESCE(list(g), []) AS l FROM bench),
hits AS (
  SELECT doc_id, lang,
         CAST(len(gs) AS BIGINT) AS n_ngrams,
         CAST(len(list_intersect(gs, bl.l)) AS BIGINT) AS n_hits
  FROM grams CROSS JOIN bl
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
)
SELECT doc_id, lang, n_ngrams, n_hits,
       CAST(CASE WHEN n_ngrams > 0 AND 20 * n_hits >= n_ngrams
                 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM hits
""",
    doc="GPT-3-style EXACT n-gram collision decontamination, the "
    "complement of the winnowing variant (`decontamination`): a train "
    "doc is scored by how many of its distinct 5-gram token windows "
    "appear ANYWHERE in the benchmark split (same deterministic md5 "
    "1/16 bucket), flagged at >=5% overlap in exact integer arithmetic "
    "— the published recipe (all n-grams, not a winnowed selection) "
    "when the budget allows the bigger collision set. Per-doc 5-grams "
    "are one codegen projection; the benchmark gram set broadcasts "
    "(benchmark-sized, not corpus-sized), so the corpus NEVER "
    "shuffles: scan → explode → broadcast-hash left join → per-doc "
    "re-aggregation on the same scan partitioning. 100 TB: identical "
    "shape; the gram set fits because benchmarks are MBs, and a bloom "
    "filter stands in if not.",
)
def q_exact_ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.functions.text import shingles

    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    # two-phase select: tokens materialize as a COLUMN before shingles
    # index into them — inlining the tokenizer into every element_at
    # would be O(tokens²·k) per doc (the shingle_hash_sequence lesson,
    # operators/dedup.py:103-109; 87 s → ~1 s at sf0.1 here)
    grams = docs.select(
        "doc_id", "lang", tokens(F.col("text")).alias("__t")
    ).select("doc_id", "lang", shingles(F.col("__t"), 5).alias("gs"))
    # explode_OUTER on purpose: plain explode makes the optimizer infer a
    # size(gs) > 0 filter and push it below the Projects, inlining the
    # whole gram+tokenizer expression into a per-row Filter (the same
    # pathology as operators/dedup.py:103-109, ~1.5 s of the bench time);
    # the null row from empty arrays is dropped AFTER the Generate, where
    # nothing can be pushed through
    bench_grams = (
        grams.where(is_bench)
        .select(F.explode_outer("gs").alias("g"))
        .where(F.col("g").isNotNull())
        .distinct()
        .withColumn("__b", F.lit(1))
    )
    train = grams.where(~is_bench).select(
        "doc_id", "lang", F.size("gs").cast("bigint").alias("n_ngrams"),
        F.explode_outer("gs").alias("g"),
    )
    per_doc = (
        train.join(F.broadcast(bench_grams), "g", "left")
        .groupBy("doc_id", "lang", "n_ngrams")
        .agg(
            F.sum(F.when(F.col("__b").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_hits")
        )
    )
    contaminated = (
        (F.col("n_ngrams") > 0) & (20 * F.col("n_hits") >= F.col("n_ngrams"))
    )
    return per_doc.select(
        "doc_id", "lang", "n_ngrams", "n_hits",
        F.when(contaminated, 1).otherwise(0).cast("bigint").alias("contaminated"),
    )


@register(
    "corpus_shard_plan",
    oracle=r"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))
              AS BIGINT) AS n_tok
  FROM documents
),
cum AS (
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM toks
)
SELECT CAST((cum - n_tok) // 2000 AS BIGINT) AS shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS shard_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM cum GROUP BY shard_id
""",
    doc="Training-shard planning: docs are laid out in a deterministic "
    "pseudo-random order (md5 of doc_id — the reproducible corpus "
    "shuffle every training run needs) and packed greedily into shards "
    "of ~2000 tokens by CUMULATIVE token count; a doc's shard is its "
    "starting offset DIV budget. The prefix sum is the scalable "
    "operator (operators/relational.py prefix_sum_over_total_order: "
    "range exchange + partition-local running sum + broadcast offsets "
    "— NO SinglePartition window), so the plan holds at 100 TB where "
    "the naive SUM-OVER-ORDER-BY would serialize on one task. Output "
    "is the shard manifest (docs, tokens, id checksum per shard).",
)
def q_corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.functions.temporal import idiv_floor
    from ds_mapreduce_spark.operators.relational import prefix_sum_over_total_order

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("__key"),
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok"),
    )
    cum = prefix_sum_over_total_order(
        base, [F.col("__key"), F.col("doc_id")], F.col("n_tok"), "cum"
    )
    return (
        cum.withColumn("shard_id", idiv_floor(F.col("cum") - F.col("n_tok"), 2000))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("shard_tokens"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
    )


@register(
    "pipeline_llm_training_prep",
    oracle=r"""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' AS is_bench,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS tk
  FROM documents
),
t2 AS (
  SELECT doc_id, lang, n_chars, is_bench,
         CAST(len(tk) AS BIGINT) AS n_tok,
         md5(array_to_string(tk[1:8], ' ')) AS fp8,
         list_distinct(list_transform(range(1, len(tk) - 3),
                                      i -> array_to_string(tk[i:i+4], ' '))) AS gs
  FROM t
),
bench AS (SELECT DISTINCT g FROM t2, UNNEST(gs) u(g) WHERE is_bench),
bl AS (SELECT COALESCE(list(g), []) AS l FROM bench),
d AS (
  SELECT t2.*,
         CASE WHEN NOT is_bench AND len(list_intersect(gs, bl.l)) > 0 THEN 1 END AS hit,
         (NOT is_bench AND n_chars >= 200) AS q
  FROM t2 CROSS JOIN bl
),
d2 AS (
  SELECT *, MIN(CASE WHEN q THEN doc_id END) OVER (PARTITION BY fp8) AS keep_id
  FROM d
),
d3 AS (
  SELECT *,
         (q AND doc_id = keep_id) AS keeper,
         (q AND doc_id = keep_id AND hit IS NULL) AS clean
  FROM d2
),
d4 AS (
  SELECT *, row_number() OVER (PARTITION BY lang, clean
                               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
  FROM d3
),
staged AS (
  SELECT lang, n_tok,
         CASE WHEN is_bench THEN 'benchmark'
              WHEN NOT q THEN 'quality_cut'
              WHEN NOT keeper THEN 'duplicate'
              WHEN hit IS NOT NULL THEN 'contaminated'
              WHEN rnk > 50 THEN 'quota_cut'
              ELSE 'final' END AS stage
  FROM d4
)
SELECT lang, stage, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST((SUM(n_tok) + 511) // 512 AS BIGINT) AS n_sequences
FROM staged GROUP BY lang, stage
""",
    doc="THE flagship end-to-end LLM training-prep funnel as ONE "
    "declarative plan: benchmark split-off -> quality gate (length) -> "
    "leading-content dedup (md5 of the first 8 tokens — the boilerplate-"
    "prefix technique; quality survivors only, smallest doc_id kept) -> "
    "exact 5-gram decontamination against the broadcast benchmark gram "
    "set -> per-language md5-rank quota (K=50) -> 512-token packing "
    "arithmetic. Every doc gets a furthest-stage-survived label via "
    "per-stage flag columns, so the whole funnel census (docs + tokens "
    "+ sequences per lang per stage) is ONE aggregation — no per-stage "
    "rescans. Plan: one corpus scan for docs + one for bench grams, a "
    "partial-aggregatable fp8 groupBy joined back (NOT a window — a "
    "hot boilerplate prefix is a skew-splittable join key, never one "
    "window task), a broadcast gram join, the lang-quota rank behind "
    "quota_rank's hash-threshold pre-thin (window partitions stay "
    "~quota-sized under any language skew), one census shuffle. "
    "100 TB: stage flags ride the same rows (no multi-pass), the gram "
    "set is benchmark-sized, and no operator sorts an unbounded hot "
    "partition; plan shape locked in tests/test_plans.py.",
)
def q_pipeline_llm_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.functions.text import shingles

    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    t1 = docs.select(
        "doc_id", "lang", "n_chars", is_bench.alias("is_bench"),
        tokens(F.col("text")).alias("__t"),
    )
    t2 = t1.select(
        "doc_id", "lang", "n_chars", "is_bench",
        F.size("__t").cast("bigint").alias("n_tok"),
        F.md5(F.concat_ws(" ", F.slice("__t", 1, 8))).alias("fp8"),
        shingles(F.col("__t"), 5).alias("gs"),
    )
    bench_grams = (
        t2.where("is_bench")
        .select(F.explode_outer("gs").alias("g"))
        .where(F.col("g").isNotNull())
        .distinct()
        .withColumn("__b", F.lit(1))
    )
    hits = (
        t2.where(~F.col("is_bench"))
        .select("doc_id", F.explode_outer("gs").alias("g"))
        .join(F.broadcast(bench_grams), "g", "left")
        .groupBy("doc_id")
        .agg(F.max("__b").alias("__hit"))
    )
    # fp8 keeper via groupBy + join back, NOT min-over-window: prefix
    # fingerprints are collision-heavy BY DESIGN (boilerplate headers
    # are the thing being deduped), so a window partitioned by fp8
    # would put every copy of a hot template into ONE task. The
    # groupBy is partial-aggregatable (map-side combine) and the join
    # back is AQE-skew-splittable. Same result: min doc_id among
    # quality rows of the group; groups with no quality row get NULL.
    keep = (
        t2.where(~F.col("is_bench") & (F.col("n_chars") >= 200))
        .groupBy("fp8")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    d = (
        t2.drop("gs")
        .join(hits, "doc_id", "left")
        .join(keep, "fp8", "left")
        .withColumn("q", ~F.col("is_bench") & (F.col("n_chars") >= 200))
    )
    d = d.withColumn("keeper", F.col("q") & (F.col("doc_id") == F.col("keep_id")))
    d = d.withColumn("clean", F.col("keeper") & F.col("__hit").isNull())
    # doc-level flag rows (no text/gram columns — ~50 bytes/doc) are
    # checkpointed ONCE so the rank branch + its count aggregation read
    # the materialized rows instead of re-running the tokenize/gram-join
    # pipeline per branch (without this the plan re-scans documents 12x;
    # with it, 4 scans — same discipline as graph_pagerank's edge list).
    d = d.localCheckpoint(eager=True)
    # per-language quota rank over CLEAN rows only (the only rows whose
    # rank the stage cascade ever reads), behind quota_rank's
    # hash-threshold pre-thin: a hot language's window partition stays
    # ~quota-sized; thinned-out rows provably rank > quota and come
    # back as NULL from the left join.
    ranked = quota_rank(
        d.where("clean").select("doc_id", "lang"),
        ["lang"],
        "doc_id",
        50,
        prethin_factor=10,
        rank_col="rnk",
    ).select("doc_id", "rnk")
    # the pre-thin BOUNDS the rank output (<= ~factor*quota rows per
    # language at any corpus size), so broadcasting it back is safe by
    # construction — the corpus never shuffles for the rank join.
    d = d.join(F.broadcast(ranked), "doc_id", "left")
    stage = (
        F.when(F.col("is_bench"), "benchmark")
        .when(~F.col("q"), "quality_cut")
        .when(~F.col("keeper"), "duplicate")
        .when(F.col("__hit").isNotNull(), "contaminated")
        .when(F.col("rnk").isNull() | (F.col("rnk") > 50), "quota_cut")
        .otherwise("final")
    )
    return (
        d.withColumn("stage", stage)
        .groupBy("lang", "stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.expr("CAST((SUM(n_tok) + 511) DIV 512 AS BIGINT)").alias("n_sequences"),
        )
    )


@register(
    "leakage_safe_splits",
    oracle="""
WITH assigned AS (
  SELECT doc_id, source, n_chars, md5(text) AS fp,
         CASE WHEN substr(md5(source), 1, 1) < 'c' THEN 'train'
              WHEN substr(md5(source), 1, 1) < 'e' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
leak AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS leaked FROM (
    SELECT fp FROM assigned GROUP BY fp HAVING COUNT(DISTINCT split) > 1)
)
SELECT split,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       (SELECT leaked FROM leak) AS cross_split_dup_fps
FROM assigned GROUP BY split
""",
    doc="GROUP-level train/val/test split assignment (r5) — the "
    "leakage-safe split discipline of an eval-honest training "
    "pipeline: the split is md5(source) bucketed 12/2/2 sixteenths, so "
    "EVERY doc of a domain lands in one split (near-duplicates cluster "
    "within domains; doc-level hashing scatters them across the "
    "boundary and inflates eval). Deterministic on every engine/rerun, "
    "derivable from the group key alone — assignment is a map-only "
    "projection, NO shuffle, and new docs of a known domain route "
    "identically forever (stable under incremental ingest). The query "
    "also MEASURES residual leakage: cross_split_dup_fps counts exact "
    "text fingerprints that still straddle splits (cross-domain "
    "copies — what dedup_exact must catch before training). Plan: one "
    "scan, one split census shuffle + one fp-distinct branch; both "
    "partial-aggregatable.",
)
def q_leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("source")), 1, 1)
    assigned = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.md5("text").alias("fp"),
        F.when(h < "c", "train").when(h < "e", "val").otherwise("test").alias("split"),
    )
    leak = (
        assigned.groupBy("fp")
        .agg(F.countDistinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("leaked"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        .crossJoin(F.broadcast(leak))
        .withColumnRenamed("leaked", "cross_split_dup_fps")
    )


@register(
    "bpe_pair_merge_stats",
    oracle=rf"""
WITH words AS (
  SELECT unnest(regexp_extract_all(text, '{_BPE_PATTERN}', 1)) AS w
  FROM documents
),
vocab AS (SELECT w, COUNT(*) AS freq FROM words GROUP BY w),
pairs AS (
  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, freq
  FROM vocab CROSS JOIN UNNEST(range(1, len(w))) t(i)
  WHERE len(w) >= 2
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_occurrences
FROM pairs GROUP BY pair
ORDER BY n_occurrences DESC, pair LIMIT 50
""",
    doc="BPE merge-candidate statistics (r5) — the first iteration of "
    "byte-pair-encoding tokenizer TRAINING: adjacent-character pair "
    "frequencies over the corpus, the argmax of which is the next BPE "
    "merge rule. The 100 TB trick is in the shape: pairs are counted "
    "on the DISTINCT-WORD table weighted by word frequency (the "
    "classic BPE optimization), so the pair explosion runs over "
    "|vocab| rows, not |corpus tokens| — the corpus is touched once "
    "for the word census and never again across merge iterations. "
    "Pre-tokenizer is the shared _BPE_PATTERN (letter runs / digit "
    "runs / single symbols — GPT-2-style word boundaries, pairs never "
    "cross them). Top-50 with deterministic tie-break; "
    "TakeOrderedAndProject, no global sort.",
)
def q_bpe_pair_merge_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 1)).alias("w")
    )
    # Codepoint-based pairing (syms array via DOTALL regexp_extract_all
    # '(?s)(.)'): Spark's length()/substr() count UTF-16 code units, so
    # an astral-plane char (emoji) would read as a 2-unit "word" and
    # emit a bogus surrogate-half pair the codepoint-based DuckDB
    # oracle never sees; DOTALL keeps U+2028/U+2029/U+0085 words (one
    # symbol on both engines — plain '.' drops them on Spark only).
    # The array is aliased BEFORE element_at indexing (CLAUDE.md
    # gotcha: inlined builders re-evaluate per index).
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.expr("regexp_extract_all(w, '(?s)(.)', 1)").alias("syms"), "freq")
    )
    pairs = (
        vocab.where(F.size("syms") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.concat(
                        F.element_at(F.col("syms"), i.cast("int")),
                        F.element_at(F.col("syms"), (i + 1).cast("int")),
                    ),
                )
            ).alias("pair"),
            "freq",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("pair"))
        .limit(50)
    )


@register(
    "epoch_shuffle_plan",
    oracle="""
WITH x AS (
  SELECT CAST(e AS BIGINT) AS epoch, doc_id, n_chars,
         md5(CAST(e AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents, UNNEST([0, 1, 2]) t(e)
),
tot AS (SELECT COUNT(*) AS n FROM documents),
c AS (
  SELECT epoch,
         CAST(('0x' || substr(k, 1, 1)) AS BIGINT) // 2 AS shard,
         COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         CAST(SUM(CAST(('0x' || substr(k, 1, 8)) AS BIGINT)) AS BIGINT)
           AS key_checksum,
         MIN(k) AS first_key, MAX(k) AS last_key
  FROM x GROUP BY 1, 2
)
SELECT epoch, shard, n_docs, sum_chars, key_checksum, first_key, last_key,
       CAST((20000 * n_docs + (SELECT n FROM tot))
            // (2 * (SELECT n FROM tot)) AS BIGINT) AS share_bp
FROM c
""",
    doc="Deterministic multi-epoch training-shuffle plan (r5) — the "
    "data-loading contract of an LLM training run: every epoch e "
    "permutes the corpus by k = md5(e || ':' || doc_id), docs route to "
    "8 shards by the key's first nibble, and within a shard the read "
    "order is key order — a reproducible global shuffle with NO "
    "sort and NO shuffle to ASSIGN (the route is a map-only "
    "projection any reader recomputes from (epoch, doc_id) alone; "
    "resumable mid-epoch for free). The census grades the plan: "
    "per-(epoch, shard) doc counts and exact share_bp (half-up "
    "integer bp) expose hash-shard imbalance, the order-independent "
    "key checksum pins membership cross-engine, and first/last keys "
    "are the shard's read-order boundaries. One groupBy over "
    "|docs| x |epochs| rows is the only shuffle, partial-aggregated; "
    "at 100 TB epochs are planned one at a time and equal-SIZE (not "
    "equal-count) sharding swaps in the distributed prefix-sum "
    "(corpus_shard_plan) over the same keys.",
)
def q_epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.functions.temporal import idiv_floor

    docs = load_table(spark, sf_dir, "documents")
    epochs = spark.range(3).select(F.col("id").alias("epoch"))
    k = F.md5(
        F.concat_ws(":", F.col("epoch").cast("string"), F.col("doc_id").cast("string"))
    )
    x = docs.select("doc_id", "n_chars").crossJoin(F.broadcast(epochs)).select(
        "epoch", "n_chars", k.alias("k")
    )
    census = x.groupBy(
        "epoch",
        idiv_floor(
            F.conv(F.substring("k", 1, 1), 16, 10).cast("long"), 2
        ).alias("shard"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.sum(F.conv(F.substring("k", 1, 8), 16, 10).cast("long"))
        .cast("bigint")
        .alias("key_checksum"),
        F.min("k").alias("first_key"),
        F.max("k").alias("last_key"),
    )
    total = docs.agg(F.count(F.lit(1)).alias("__n"))
    return census.crossJoin(F.broadcast(total)).select(
        "epoch",
        "shard",
        "n_docs",
        "sum_chars",
        "key_checksum",
        "first_key",
        "last_key",
        idiv_floor(
            20000 * F.col("n_docs") + F.col("__n"), 2 * F.col("__n")
        ).alias("share_bp"),
    )


@register(
    "entity_resolution_clusters",
    oracle="""
WITH RECURSIVE names AS (
  SELECT DISTINCT p_name,
         list_extract(string_split(p_name, ' '), -1) AS blk
  FROM part
),
pairs AS (
  SELECT a.p_name AS na, b.p_name AS nb
  FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
  WHERE levenshtein(a.p_name, b.p_name) <= 3
),
edges AS (
  SELECT na AS s, nb AS d FROM pairs
  UNION ALL SELECT nb, na FROM pairs
),
reach(id, lab) AS (
  SELECT p_name, p_name FROM names
  UNION
  SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.id
),
labels AS (SELECT id, MIN(lab) AS entity_id FROM reach GROUP BY id)
SELECT l.entity_id,
       CAST(COUNT(DISTINCT l.id) AS BIGINT) AS n_names,
       COUNT(*) AS n_parts
FROM part p JOIN labels l ON p.p_name = l.id
GROUP BY l.entity_id
""",
    doc="Entity resolution end-to-end (r5): blocked-Levenshtein "
    "candidate pairs (operators/dedup.blocked_levenshtein_pairs — the "
    "same blocking-then-verify shape as every dedup operator) fed into "
    "connected components (min-label propagation), then every part row "
    "resolved to its canonical entity (min name of the cluster; "
    "singletons resolve to themselves via the left join). This is the "
    "composition the pairwise fuzzy matcher can't deliver alone — "
    "A~B~C without A~C still lands in ONE entity. Census per entity: "
    "distinct name variants + part-row volume. Scale: pair space is "
    "per-block, the CC edge set is O(matches), per-round CC work is "
    "join+groupBy on that edge set with checkpointed lineage, and the "
    "final resolution join shuffles |part| rows once on the name key. "
    "Oracle: recursive-CTE transitive closure seeded from ALL names.",
)
def q_entity_resolution_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import (
        blocked_levenshtein_pairs,
        connected_components,
    )

    part = load_table(spark, sf_dir, "part")
    names = part.select("p_name").distinct().select(
        "p_name", F.substring_index("p_name", " ", -1).alias("blk")
    )
    pairs = blocked_levenshtein_pairs(names, "p_name", "blk", 3)
    labels = connected_components(pairs, src="name_a", dst="name_b")
    resolved = names.join(
        labels, names.p_name == labels.id, "left"
    ).select(
        "p_name", F.coalesce(F.col("comp"), F.col("p_name")).alias("entity_id")
    )
    return (
        part.select("p_name")
        .join(resolved, "p_name")
        .groupBy("entity_id")
        .agg(
            F.countDistinct("p_name").cast("bigint").alias("n_names"),
            F.count(F.lit(1)).alias("n_parts"),
        )
    )


@register(
    "trigram_substring_search",
    oracle="""
WITH sel AS (
  SELECT substr(text, 10, 12) AS needle
  FROM documents WHERE doc_id = (SELECT MIN(doc_id) FROM documents)
),
ntg AS (
  SELECT DISTINCT substr(needle, CAST(i AS INTEGER), 3) AS tg
  FROM sel, UNNEST(range(1, len(needle) - 1)) t(i)
  WHERE len(needle) >= 3
),
n AS (SELECT COUNT(*) AS k FROM ntg),
hits AS (
  SELECT DISTINCT doc_id, tg FROM (
    SELECT doc_id, substr(text, CAST(i AS INTEGER), 3) AS tg
    FROM documents, UNNEST(range(1, len(text) - 1)) t(i)
    WHERE len(text) >= 3
  ) JOIN ntg USING (tg)
),
cand AS (
  SELECT doc_id FROM hits
  GROUP BY doc_id HAVING COUNT(*) = (SELECT k FROM n)
)
SELECT c.doc_id,
       contains(d.text, (SELECT needle FROM sel)) AS verified
FROM cand c JOIN documents d USING (doc_id)
""",
    doc="Trigram-index substring search (r5) — the pg_trgm pattern that "
    "turns `LIKE '%needle%'` from a full-corpus scan into an index "
    "lookup: every doc posts its distinct character trigrams once (the "
    "INDEX — at 100 TB a bucketed posting-list table built one time, "
    "df-capped like shingles), a query needle decomposes into its own "
    "trigrams, candidate docs are those containing ALL needle trigrams "
    "(broadcast the handful of needle trigrams, count-match per doc), "
    "and only candidates pay the exact contains() verification. The "
    "needle is data-derived (12 chars of the min-doc_id text) so the "
    "result provably contains its source doc. Output: every candidate "
    "with its verification verdict — false rows are the index's false "
    "positives, the selectivity evidence. Candidate generation touches "
    "only posting lists; the verify join re-reads only |candidates| "
    "texts. Plan shape (r6): the needle-trigram broadcast filter sits "
    "BELOW the distinct, so the only corpus-sized exchange carries the "
    "~k needle-matching (doc_id, tg) rows, not every trigram in the "
    "corpus — distinct on (doc_id, tg) commutes with the tg filter. "
    "Sub-3-char texts are filtered on both engines (Spark's "
    "sequence(1, len-2) would otherwise descend and emit bogus "
    "positions).",
)
def q_trigram_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # 1-row needle checkpointed: the three needle branches (trigrams,
    # count, verify) would otherwise each re-run the TakeOrdered scan.
    # In production the needle is a user literal and these scans vanish.
    sel = (
        docs.orderBy("doc_id")
        .limit(1)
        .select(F.substring("text", 10, 12).alias("needle"))
        .localCheckpoint(eager=True)
    )
    ntg = (
        sel.where(F.length("needle") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(needle) - 2),"
                    " i -> substring(needle, i, 3))"
                )
            ).alias("tg")
        )
        .distinct()
    )
    k = ntg.agg(F.count(F.lit(1)).alias("k"))
    # Filter FIRST, distinct AFTER: Catalyst can't push an Aggregate
    # below a Join, so a distinct here would shuffle every trigram
    # occurrence in the corpus before keeping ~k per doc. Joining the
    # broadcast needle set on the raw explode keeps the exchange to
    # needle-matching rows only; distinct on (doc_id, tg) commutes.
    dtg = docs.where(F.length("text") >= 3).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 2),"
                " i -> substring(text, i, 3))"
            )
        ).alias("tg"),
    )
    cand = (
        dtg.join(F.broadcast(ntg), "tg")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__hits"))
        .crossJoin(F.broadcast(k))
        .where(F.col("__hits") == F.col("k"))
        .select("doc_id")
    )
    return (
        cand.join(docs.select("doc_id", "text"), "doc_id")
        .crossJoin(F.broadcast(sel))
        .select("doc_id", F.expr("contains(text, needle)").alias("verified"))
    )


#: BM25 CTE chain through ``agg`` (doc_id, bm25_scaled, n_hit_terms) —
#: shared by bm25_search and hybrid_search_rerank; mirrors
#: _bm25_doc_scores 1:1 (same constants, same floor divisions).
_BM25_CTE = r"""toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks WHERE len(t) > 0),
ex AS (SELECT doc_id, unnest(t) AS tok FROM toks),
dfreq AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS dft FROM ex GROUP BY tok),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS d, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
needle AS (
  SELECT tok, dft FROM (
    SELECT DISTINCT e.tok, f.dft
    FROM ex e JOIN dfreq f USING (tok)
    WHERE e.doc_id = (SELECT MIN(doc_id) FROM documents)
  ) ORDER BY dft, tok LIMIT 5
),
idf AS (
  SELECT tok, ((2 * (g.d - dft) + 1) * 1000000) // (2 * dft + 1) AS idf_int
  FROM needle, g
),
tf AS (
  SELECT e.doc_id, e.tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM ex e JOIN needle n USING (tok)
  GROUP BY e.doc_id, e.tok
),
scored AS (
  SELECT tf.doc_id,
         (i.idf_int * tf.tf * 220)
           // (tf.tf * 100 + (120 * (25 + (75 * dl.dl * g.d) // g.sum_dl)) // 100)
           AS score_t
  FROM tf JOIN idf i USING (tok) JOIN dl USING (doc_id), g
),
agg AS (
  SELECT doc_id, CAST(SUM(score_t) AS BIGINT) AS bm25_scaled,
         CAST(COUNT(*) AS BIGINT) AS n_hit_terms
  FROM scored GROUP BY doc_id
)"""


def _bm25_doc_scores(spark: SparkSession, sf_dir: str):
    """(doc_id, bm25_scaled, n_hit_terms) for every doc matching >=1 of
    the 5 globally rarest tokens of the min-doc_id document — the
    integer-exact Okapi scorer shared by bm25_search and
    hybrid_search_rerank (see bm25_search's doc for the arithmetic and
    the 100 TB inverted-index shape)."""
    from ds_mapreduce_spark.functions.text import tokens
    from ds_mapreduce_spark.operators.search import (
        bm25_idf,
        bm25_needle,
        bm25_score_terms,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    dl = toks.where(F.size("t") > 0).select(
        "doc_id", F.size("t").cast("bigint").alias("dl")
    )
    ex = toks.select("doc_id", F.explode("t").alias("tok"))
    g = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("d"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    ).localCheckpoint(eager=True)
    # document frequency over distinct (doc, tok) — vocab-sized output
    dfreq = (
        ex.distinct().groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("dft"))
    )
    min_doc = docs.agg(F.min("doc_id").alias("mid"))
    # arithmetic + needle selection shared with the streaming index
    # twin (operators/search.py); 5 rows feed idf + the tf semijoin
    needle = bm25_needle(ex, dfreq, min_doc).localCheckpoint(eager=True)
    # needle filter BEFORE the tf aggregation: the only token-scale
    # shuffle carries needle-matching (doc, tok) rows — the streaming
    # twin instead probes its MAINTAINED postings table here
    tf = (
        ex.join(F.broadcast(needle.select("tok")), "tok")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    return bm25_score_terms(tf, bm25_idf(needle, g), dl, g)


@register(
    "bm25_search",
    oracle="WITH "
    + _BM25_CTE
    + """
SELECT doc_id, bm25_scaled, n_hit_terms,
       CAST(row_number() OVER (ORDER BY bm25_scaled DESC, doc_id) AS BIGINT) AS rnk
FROM agg QUALIFY rnk <= 20
""",
    doc="BM25 ranked retrieval (r6) — the Okapi scoring every search "
    "engine (Lucene/ES default) runs, in EXACT integer arithmetic so "
    "the ranking hashes identically cross-engine: per-term weight = "
    "idf_int * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)) with k1=1.2 "
    "b=0.75 at x100 fixed-point, where idf_int is the exact-rational "
    "surrogate (2(N-df)+1)*1e6 DIV (2df+1) of the BM25 idf argument "
    "(monotone in it — the tfidf_top_terms convention: no float ln "
    "crosses the engine boundary) and every DIV is mirrored floor "
    "division, so the per-doc score is an order-independent BIGINT "
    "sum. Query = the 5 globally rarest tokens of the min-doc_id "
    "document (deterministic, provably matches its source). Shape: "
    "the needle set (5 rows, from the df table) broadcasts; tf "
    "counting joins the broadcast needle BEFORE any aggregation (the "
    "trigram lesson — the only token-scale shuffle carries needle-"
    "matching rows); dl/N/sum_dl are map-only projections + one "
    "1-row broadcast; final ranking is TakeOrdered(20). 100 TB: this "
    "is an inverted-index probe — per query, work is proportional to "
    "the needle terms' posting lists, never the corpus.",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    agg = _bm25_doc_scores(spark, sf_dir)
    # TakeOrdered(20) first, THEN rank: the global row_number window
    # runs on <=20 rows (bounded SinglePartition tail), never on the
    # full candidate set — candidate-doc top-k stays distributed.
    top = agg.orderBy(F.col("bm25_scaled").desc(), "doc_id").limit(20)
    w = Window.orderBy(F.col("bm25_scaled").desc(), "doc_id")
    return top.withColumn("rnk", F.row_number().over(w).cast("bigint"))


@register(
    "hybrid_search_rerank",
    oracle="WITH "
    + _BM25_CTE
    + """,
cand AS (
  SELECT doc_id, bm25_scaled FROM agg
  ORDER BY bm25_scaled DESC, doc_id LIMIT 50
),
qe AS (
  SELECT CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings
  WHERE vec_id = (SELECT MIN(doc_id) FROM documents)
),
rr AS (
  SELECT c.doc_id, c.bm25_scaled,
         ROUND(list_cosine_similarity(qe.q_emb, CAST(e.embedding AS DOUBLE[])), 6)
           AS dense_score
  FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id, qe
)
SELECT doc_id, bm25_scaled, dense_score,
       CAST(row_number() OVER (ORDER BY dense_score DESC, doc_id) AS BIGINT) AS rnk
FROM rr QUALIFY rnk <= 10
""",
    doc="Hybrid retrieval (r6) — the modern RAG search stack in one "
    "plan: sparse BM25 retrieval proposes top-50 candidates (shared "
    "scorer _bm25_doc_scores — cheap, inverted-index-shaped, high "
    "recall), then a dense embedding re-rank scores ONLY those 50 "
    "against the query document's vector (cosine, 6dp, knn "
    "conventions) and keeps the top 10 — the retrieve-then-rerank "
    "pattern that makes semantic search affordable: the expensive "
    "dense scoring touches |candidates| vectors, never the corpus "
    "(at 100 TB the re-rank is 50 rows against a broadcast query "
    "vector regardless of corpus size; swap the cosine for a "
    "cross-encoder UDF and the plumbing is unchanged). doc_id is the "
    "embeddings join key (vec_id aligns 1:1 in the test tables — the "
    "doc-to-vector mapping every real corpus maintains).",
)
def q_hybrid_search_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ds_mapreduce_spark.functions.vector import cosine_similarity

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    cand = (
        _bm25_doc_scores(spark, sf_dir)
        .orderBy(F.col("bm25_scaled").desc(), "doc_id")
        .limit(50)
        .select("doc_id", "bm25_scaled")
    )
    qe = (
        emb.join(
            F.broadcast(docs.agg(F.min("doc_id").alias("mid"))),
            F.col("vec_id") == F.col("mid"),
        )
        .select(F.col("embedding").alias("q_emb"))
    )
    rr = (
        cand.join(emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id")
        .crossJoin(F.broadcast(qe))
        .select(
            "doc_id",
            "bm25_scaled",
            F.round(cosine_similarity(F.col("q_emb"), F.col("embedding")), 6).alias(
                "dense_score"
            ),
        )
    )
    top = rr.orderBy(F.col("dense_score").desc(), "doc_id").limit(10)
    w = Window.orderBy(F.col("dense_score").desc(), "doc_id")
    return top.withColumn("rnk", F.row_number().over(w).cast("bigint"))


@register(
    "quality_classifier_linear",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
  FROM documents
),
scored AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(COALESCE(list_sum(list_transform(toks, tok ->
             ((CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 64)
              * 2654435761) % 1001 - 500)), 0) AS BIGINT) AS quality_score
  FROM t
)
SELECT doc_id, n_tokens, quality_score,
       CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
            ELSE (quality_score * 1000) // n_tokens END AS score_per_kilotoken,
       CASE WHEN quality_score >= 0 THEN 'keep' ELSE 'drop' END AS label
FROM scored
""",
    doc="Model-based quality scoring (r7) — the fastText-style hashed "
    "linear classifier every large-corpus pipeline runs (CCNet/LLaMA "
    "quality filtering): each token hashes into one of 64 feature "
    "buckets (md5-portable, the dedup-suite convention) and the doc "
    "score is the sum of per-bucket weights — here a fixed "
    "deterministic weight table ((bucket * 2654435761) % 1001 - 500), "
    "a stand-in for trained weights; the DEPLOYABLE part is the "
    "plumbing: hashed sparse features, integer dot product, "
    "threshold label, all exact so both engines hash-match. "
    "Complements text_quality_score (hand heuristics) with the "
    "model-scoring shape. Plan: ZERO shuffles — the bag-of-hashed-"
    "words dot product folds into one F.aggregate over the token "
    "array, map-only end to end (the cheapest possible per-doc "
    "classifier: at 100 TB this is scan-bound and scales by adding "
    "executors; swapping in trained weights is a broadcast join or a "
    "literal CASE table, unchanged shape).",
)
def q_quality_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    w = (
        lambda tok: (
            F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % 64
        )
        * F.lit(2654435761).cast("long")
        % 1001
        - 500
    )
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    scored = toks.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.aggregate(
            "toks", F.lit(0).cast("long"), lambda acc, tok: acc + w(tok)
        ).alias("quality_score"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "quality_score",
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("bigint"))
        .otherwise(F.expr("(quality_score * 1000) DIV n_tokens"))
        .alias("score_per_kilotoken"),
        F.when(F.col("quality_score") >= 0, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("label"),
    )


@register(
    "ingest_manifest_pipeline",
    oracle=r"""
WITH scrub AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(text,
            '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
            '\b555-[0-9]{4}\b', '<PHONE>', 'g'),
            '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS rt
  FROM documents
),
scored AS (
  SELECT doc_id, rt,
         CAST(len(list_filter(regexp_split_to_array(rt, '\s+'), x -> x <> ''))
              AS BIGINT) AS n_tok,
         CAST(COALESCE(list_sum(list_transform(
             list_filter(regexp_split_to_array(rt, '\s+'), x -> x <> ''),
             tok -> ((CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 64)
                     * 2654435761) % 1001 - 500)), 0) AS BIGINT) AS q,
         md5(trim(regexp_replace(lower(rt), '\s+', ' ', 'g'))) AS fp,
         md5(CAST(doc_id AS VARCHAR)) AS okey
  FROM scrub
),
owner AS (
  SELECT doc_id, okey, n_tok,
         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY okey, doc_id) AS rn
  FROM scored WHERE q >= 0
),
kept AS (
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY okey, doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM owner WHERE rn = 1
)
SELECT s.doc_id,
       CASE WHEN s.q < 0 THEN 'low_quality'
            WHEN k.doc_id IS NOT NULL THEN 'kept'
            ELSE 'dup' END AS verdict,
       s.n_tok,
       CAST(COALESCE((k.cum - k.n_tok) // 2000, -1) AS BIGINT) AS shard_id
FROM scored s LEFT JOIN kept k ON s.doc_id = k.doc_id
""",
    doc="Ingest admission manifest (r7) — the training-data ingest "
    "tier as ONE composed pipeline: unconditional PII scrub (redacted "
    "text flows into every branch, including rejects bound for audit "
    "logs), hashed-linear quality gate (quality_classifier_linear's "
    "scorer), canonical-md5 exact dedup with min-(okey, doc_id) "
    "ownership, and token-budget shard routing over the SAME md5 "
    "total order the dedup owns by — emitting per-doc (verdict, "
    "shard) decision rows. Composing ownership and routing on one "
    "total order is what lets the streaming twin "
    "(run_streaming_ingest_manifest) converge exactly under ordered "
    "arrival, the corpus_shard_plan contract. Plan: two map-only "
    "documents scans (scored branch + manifest join-back), one fp "
    "window (partition = duplicate-group size), the distributed "
    "prefix sum (zero SinglePartition), one doc_id join. See "
    "operators/ingest.py.",
)
def q_ingest_manifest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.ingest import ingest_manifest

    return ingest_manifest(
        load_table(spark, sf_dir, "documents"), budget=2000, quality_threshold=0
    )


@register(
    "hybrid_rrf_fusion",
    oracle="WITH "
    + _BM25_CTE
    + """,
sparse AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY bm25_scaled DESC, doc_id) AS BIGINT) AS rs
  FROM agg QUALIFY rs <= 50
),
qe AS (
  SELECT CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings
  WHERE vec_id = (SELECT MIN(doc_id) FROM documents)
),
dense AS (
  SELECT vec_id AS doc_id,
         CAST(row_number() OVER (
            ORDER BY ROUND(list_cosine_similarity(qe.q_emb,
                                                  CAST(e.embedding AS DOUBLE[])), 6)
                     DESC, vec_id) AS BIGINT) AS rd
  FROM embeddings e, qe
  QUALIFY rd <= 50
),
fused AS (
  SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
         COALESCE(s.rs, -1) AS bm25_rank,
         COALESCE(d.rd, -1) AS dense_rank,
         CAST(COALESCE(1000000 // (60 + s.rs), 0)
              + COALESCE(1000000 // (60 + d.rd), 0) AS BIGINT) AS rrf_score
  FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
)
SELECT doc_id, bm25_rank, dense_rank, rrf_score,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rnk
FROM fused QUALIFY rnk <= 10
""",
    doc="Reciprocal Rank Fusion (r7) — the OTHER standard hybrid "
    "combiner next to retrieve-then-rerank (hybrid_search_rerank): "
    "sparse BM25 top-50 and dense cosine top-50 are fused by "
    "score = sum of 1e6 DIV (60 + rank) (Cormack et al.'s RRF with "
    "k=60 at integer fixed point — no float crosses the engine "
    "boundary), a doc absent from one list contributing 0 from it. "
    "RRF needs only RANKS, not comparable scores, which is why "
    "production search uses it to merge heterogeneous retrievers. "
    "Plan: the shared BM25 scorer (needle below the tf agg) + one "
    "brute-force dense ranking of the embeddings table against the "
    "1-row broadcast query vector (TakeOrdered(50) — at 100 TB this "
    "side swaps to the IVF probe with the same rank contract), a "
    "50x50 full-outer fuse, rank window on <=60 fused rows. Bounded "
    "everywhere below the two retrievals.",
)
def q_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ds_mapreduce_spark.functions.vector import cosine_similarity

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    sparse = (
        _bm25_doc_scores(spark, sf_dir)
        .orderBy(F.col("bm25_scaled").desc(), "doc_id")
        .limit(50)
        .withColumn(
            "rs",
            F.row_number()
            .over(Window.orderBy(F.col("bm25_scaled").desc(), "doc_id"))
            .cast("bigint"),
        )
        .select("doc_id", "rs")
    )
    qe = (
        emb.join(
            F.broadcast(docs.agg(F.min("doc_id").alias("mid"))),
            F.col("vec_id") == F.col("mid"),
        )
        .select(F.col("embedding").alias("q_emb"))
    )
    dense_scored = emb.crossJoin(F.broadcast(qe)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(cosine_similarity(F.col("q_emb"), F.col("embedding")), 6).alias(
            "cs"
        ),
    )
    dense = (
        dense_scored.orderBy(F.col("cs").desc(), "doc_id")
        .limit(50)
        .withColumn(
            "rd",
            F.row_number()
            .over(Window.orderBy(F.col("cs").desc(), "doc_id"))
            .cast("bigint"),
        )
        .select("doc_id", "rd")
    )
    fused = (
        sparse.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("rs", F.lit(-1)).cast("bigint").alias("bm25_rank"),
            F.coalesce("rd", F.lit(-1)).cast("bigint").alias("dense_rank"),
            (
                F.coalesce(F.expr("1000000 DIV (60 + rs)"), F.lit(0))
                + F.coalesce(F.expr("1000000 DIV (60 + rd)"), F.lit(0))
            )
            .cast("bigint")
            .alias("rrf_score"),
        )
    )
    top = fused.orderBy(F.col("rrf_score").desc(), "doc_id").limit(10)
    w = Window.orderBy(F.col("rrf_score").desc(), "doc_id")
    return top.withColumn("rnk", F.row_number().over(w).cast("bigint"))


@register(
    "dsir_importance_select",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
  FROM documents
),
tb AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 1024 AS bucket
  FROM tok
),
wts AS (
  SELECT bucket,
         ((SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1) * 131072)
           // (COUNT(*) + 1) AS w
  FROM tb GROUP BY bucket
),
scored AS (
  SELECT t.doc_id, t.lang,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(w.w) // COUNT(*) AS BIGINT) AS importance
  FROM tb t JOIN wts w USING (bucket)
  GROUP BY t.doc_id, t.lang
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY importance DESC, doc_id) AS BIGINT) AS rnk,
       doc_id, lang, n_tokens, importance
FROM scored
ORDER BY importance DESC, doc_id
LIMIT 50
""",
    doc="DSIR-shaped data selection (Xie et al. 2023, 'Data Selection "
    "for Language Models via Importance Resampling'): hashed-unigram "
    "importance weights learned from a TARGET corpus (here lang='en' "
    "docs) against the RAW corpus, then every doc scored by its "
    "per-token average weight and the top-50 selected. Engine-exact "
    "surrogate for the paper's log-ratio: per-bucket Laplace-smoothed "
    "frequency ratio in 2^17 fixed point, ((t+1)*131072) DIV (r+1) — "
    "pure BIGINT, no float crosses the boundary; the corpus-size "
    "normalization constant is uniform across buckets and omitted "
    "(rank-order invariant). Two-pass plan, DSIR's inherent shape: "
    "pass 1 aggregates token->1024 md5 buckets into a weight table "
    "(localCheckpoint'ed — 1024 rows, the SMALL intermediate), pass 2 "
    "re-tokenizes and scores via a broadcast join (no shuffle beyond "
    "the per-doc agg) and TakeOrdered(50) picks the selection; the "
    "rank window rides the bounded 50-row tail. 100 TB: the weight "
    "table is fixed-size whatever the corpus, scoring is map-side + "
    "one doc_id agg, and selection is top-k, never a global sort.",
)
def q_dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.importance import (
        dsir_bucket_partial,
        dsir_rank_top,
        dsir_token_buckets,
        dsir_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    tok = dsir_token_buckets(docs)
    # the SMALL intermediate (<=1024 rows at ANY corpus scale)
    wts = dsir_weights(dsir_bucket_partial(tok)).localCheckpoint(eager=True)
    scored = (
        tok.join(F.broadcast(wts), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("w").cast("bigint").alias("sw"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.expr("sw DIV n_tokens").alias("importance"),
        )
    )
    return dsir_rank_top(scored, 50)


def _bpe_train_oracle(n_merges: int = 3) -> str:
    """Unrolled BPE training loop: per merge, a pair census CTE, a
    1-row argmax CTE, and a merged-vocab CTE whose list_reduce fold is
    the string-accumulator twin of operators/bpe._merge_pair (symbols
    joined by chr(31); the accumulator's LAST segment is read with
    string_split(acc, chr(31))[-1] and rewritten by substr arithmetic —
    deliberately NO regex anywhere in the fold, so a merge winner
    containing regex metacharacters or backslashes can never be
    misinterpreted as an RE2 replacement). Merge winners are in fact
    always alphanumeric — _BPE_PATTERN's punctuation alternative
    matches ONE char, so punctuation words are single-symbol arrays
    that never produce an adjacent pair — but the fold no longer
    depends on that argument (tests/test_bpe.py pins both the
    invariant and fold parity on a metacharacter-laden corpus).
    Both engines split words into symbols by CODEPOINT
    (DOTALL regexp_extract_all(w, '(?s)(.)', 1) ≙ substr(w, i, 1) —
    '(?s)' is load-bearing: plain '.' skips the U+2028/U+2029/U+0085
    line-terminator words, ADVICE r8 item 1); a UTF-16 code-unit
    split would hand Spark a 2-symbol array for a single astral-plane
    char (emoji) where DuckDB sees one symbol."""
    ctes, selects = _bpe_vocab_ctes(n_merges), []
    for i in range(1, n_merges + 1):
        selects.append(
            f"""SELECT CAST({i} AS BIGINT) AS step, a AS sym_a, b AS sym_b,
       a || b AS merged, cnt AS n_occurrences,
       (SELECT CAST(SUM(freq * len(syms)) AS BIGINT) FROM v{i})
         AS n_symbol_occurrences
FROM b{i}"""
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def _bpe_vocab_ctes(n_merges: int) -> list[str]:
    """The CTE chain both BPE oracles share (training + encode —
    one implementation so they can never drift): filtered word census,
    codepoint-split v0, and per-merge p{i} (pair census) / b{i}
    (argmax rule) / v{i} (fold-applied vocab, carrying w so the encode
    oracle can join segmentations back onto the corpus)."""
    ctes = [
        f"""words AS (
  SELECT w
  FROM (SELECT unnest(regexp_extract_all(text, '{_BPE_PATTERN}', 1)) AS w
        FROM documents)
  WHERE strpos(w, chr(31)) = 0
),
vw AS (SELECT w, COUNT(*) AS freq FROM words GROUP BY w),
v0 AS (
  SELECT w, list_transform(range(1, len(w) + 1),
                           i -> substr(w, CAST(i AS INTEGER), 1)) AS syms, freq
  FROM vw
)"""
    ]
    for i in range(1, n_merges + 1):
        p = i - 1
        ctes.append(
            f"""p{i} AS (
  SELECT syms[CAST(j AS INTEGER)] AS a, syms[CAST(j AS INTEGER) + 1] AS b, freq
  FROM v{p} CROSS JOIN UNNEST(range(1, len(syms))) t(j)
  WHERE len(syms) >= 2
),
b{i} AS (
  SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM p{i} GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1
),
v{i} AS (
  SELECT w, string_split(
    list_reduce(syms, (acc, s) ->
      CASE WHEN string_split(acc, chr(31))[-1] = b{i}.a AND s = b{i}.b
           THEN substr(acc, 1, len(acc) - len(b{i}.a)) || b{i}.a || b{i}.b
           ELSE acc || chr(31) || s END), chr(31)) AS syms, freq
  FROM v{p} CROSS JOIN b{i}
)"""
        )
    return ctes


def _bpe_encode_oracle(n_merges: int = 3) -> str:
    """Encode-census oracle: the shared training CTE chain, then the
    final vocab's per-word segmentation joined back onto the
    (doc_id, word) stream and aggregated per document."""
    ctes = _bpe_vocab_ctes(n_merges)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
stats AS (
  SELECT w, CAST(len(w) AS BIGINT) AS n_char,
         CAST(len(syms) AS BIGINT) AS n_bpe
  FROM v{n_merges}
),
dw AS (
  SELECT doc_id, lang, w
  FROM (SELECT doc_id, lang,
               unnest(regexp_extract_all(text, '{_BPE_PATTERN}', 1)) AS w
        FROM documents)
  WHERE strpos(w, chr(31)) = 0
)
SELECT dw.doc_id, dw.lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(s.n_char) AS BIGINT) AS n_char_tokens,
       CAST(SUM(s.n_bpe) AS BIGINT) AS n_bpe_tokens,
       CAST((20000 * (SUM(s.n_char) - SUM(s.n_bpe)) + SUM(s.n_char))
            // (2 * SUM(s.n_char)) AS BIGINT) AS saved_bp
FROM dw JOIN stats s USING (w)
GROUP BY dw.doc_id, dw.lang"""
    )


@register(
    "bpe_train_merges",
    oracle=_bpe_train_oracle(3),
    doc="Iterative BPE tokenizer TRAINING (Sennrich et al. 2016) — 3 "
    "learned merge rules on top of bpe_pair_merge_stats' one-step "
    "census: per iteration, corpus-weighted adjacent-pair census over "
    "the DISTINCT-WORD symbol table -> argmax (count DESC, pair ASC "
    "tie-break) -> left-to-right non-overlapping merge applied as a "
    "map-only array fold -> checkpointed vocab state (constant-size "
    "iteration plans, the pagerank discipline). The corpus is read "
    "ONCE for the word census; every iteration runs on |vocab| rows "
    "(Heaps' law: millions at 100 TB, whatever the corpus size). The "
    "per-iteration argmax is one bounded driver-side row — the merge "
    "RULE itself, tokenizer training's output artifact. Oracle: the "
    "same loop unrolled, merges applied by a list_reduce fold that "
    "mirrors the Spark fold exactly. See operators/bpe.py.",
)
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.bpe import bpe_train_merges

    return bpe_train_merges(
        load_table(spark, sf_dir, "documents"), _BPE_PATTERN, n_merges=3
    )


@register(
    "bpe_encode_census",
    oracle=_bpe_encode_oracle(3),
    doc="BPE tokenizer APPLY (r8) — the encode side that closes the "
    "training loop: learn the same 3 merge rules as bpe_train_merges "
    "(shared _train_vocab, bit-identical argmax), then score every "
    "document by what the tokenizer does to it — pre-merge codepoint "
    "token count, post-merge BPE token count, and the half-up "
    "basis-point compression the merges bought. The classic "
    "distributed-apply shape: segmentation is computed ONCE PER "
    "DISTINCT WORD (the final vocab already holds each word's merged "
    "symbol array — encoding is a lookup, not a per-occurrence "
    "re-fold), joined back onto the (doc_id, word) stream on the word "
    "key — a vocab-sized join (Heaps' law: millions of words at "
    "100 TB), NOT broadcast, AQE decides — and one doc_id agg. "
    "Oracle: the shared training CTE chain (_bpe_vocab_ctes — the "
    "fold carries each word through the merges) plus the same "
    "join-back and census; exact integers only. See "
    "operators/bpe.py:bpe_encode_census.",
)
def q_bpe_encode_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.bpe import bpe_encode_census

    return bpe_encode_census(
        load_table(spark, sf_dir, "documents"), _BPE_PATTERN, n_merges=3
    )


def priority_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, priority): the deterministic priority-sampling
    score (Duffield/Lund/Thorup) — priority = (w * 2^20) DIV u with u
    the md5-portable hash of doc_id folded into [1, 2^20], pure BIGINT.
    Shared by the batch ``weighted_priority_sample`` and its streaming
    twin: the score depends only on the row, so any chunking of the
    corpus scores identically."""
    return docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.expr(
            "(n_chars * 1048576) DIV ((CAST(conv(substring(md5(CAST(doc_id"
            " AS STRING)), 1, 8), 16, 10) AS BIGINT) % 1048576) + 1)"
        ).alias("priority"),
    )


def priority_top_k(scored: DataFrame, k: int = 50) -> DataFrame:
    """The k highest priorities (deterministic doc_id tie-break) —
    TakeOrderedAndProject, never a global sort. Mergeable:
    top_k(A ∪ B) = top_k(top_k(A) ∪ top_k(B)), which is what makes the
    streaming twin's O(k) landed state exact under any chunking."""
    return scored.orderBy(F.col("priority").desc(), "doc_id").limit(k)


def priority_sample_present(top: DataFrame) -> DataFrame:
    """Rank the bounded k-row sample for presentation — shared tail."""
    w = Window.orderBy(F.col("priority").desc(), "doc_id")
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rnk"),
        "doc_id",
        "n_chars",
        "priority",
    )


@register(
    "weighted_priority_sample",
    oracle="""
WITH pr AS (
  SELECT doc_id, n_chars,
         (n_chars * 1048576)
           // ((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 1048576) + 1) AS priority
  FROM documents
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) AS BIGINT) AS rnk,
       doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(priority AS BIGINT) AS priority
FROM pr ORDER BY priority DESC, doc_id LIMIT 50
""",
    doc="Weighted sampling without replacement by PRIORITY SAMPLING "
    "(Duffield, Lund & Thorup 2007): each doc gets priority = w/u for "
    "weight w = n_chars and u uniform on (0,1], and the k highest "
    "priorities form a sample whose inclusion probabilities are "
    "proportional to weight (large docs almost surely in, small docs "
    "by lottery) with unbiased subset-sum estimators — THE way to cut "
    "a weighted sub-corpus at 100 TB in one pass. Engine-exact form: "
    "u is the md5-portable hash of doc_id folded into [1, 2^20] and "
    "priority = (w * 2^20) DIV u in pure BIGINT (deterministic: the "
    "same corpus always yields the same sample — reproducibility is "
    "the dataloader contract, epoch_shuffle_plan's convention). Plan: "
    "map-only scoring + TakeOrdered(50); the rank window rides the "
    "bounded 50-row tail; zero shuffles of corpus rows.",
)
def q_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return priority_sample_present(priority_top_k(priority_scores(docs), 50))


@register(
    "bloom_ngram_decontamination",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(range(1, len(t) - 3),
                                      i -> array_to_string(t[i:i+4], ' '))) AS gs
  FROM toks
),
bench AS (
  SELECT DISTINCT g FROM grams, UNNEST(gs) u(g)
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
),
positions AS (
  SELECT CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % 65536 AS p1,
         CAST(('0x' || substr(md5('b2:' || g), 1, 8)) AS BIGINT) % 65536 AS p2
  FROM bench
),
bloom AS (
  SELECT p // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS bits
  FROM (SELECT p1 AS p FROM positions UNION ALL SELECT p2 FROM positions)
  GROUP BY p // 32
),
cg AS (
  SELECT doc_id, lang, u.g,
         CAST(('0x' || substr(md5(u.g), 1, 8)) AS BIGINT) % 65536 AS p1,
         CAST(('0x' || substr(md5('b2:' || u.g), 1, 8)) AS BIGINT) % 65536 AS p2
  FROM grams, UNNEST(gs) u(g)
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
),
flags AS (
  SELECT cg.doc_id, cg.lang, cg.g,
         CASE WHEN ((COALESCE(b1.bits, 0) >> CAST(cg.p1 % 32 AS INTEGER)) & 1) = 1
               AND ((COALESCE(b2.bits, 0) >> CAST(cg.p2 % 32 AS INTEGER)) & 1) = 1
              THEN 1 ELSE 0 END AS bloomhit,
         CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END AS exacthit
  FROM cg
  LEFT JOIN bloom b1 ON b1.word = cg.p1 // 32
  LEFT JOIN bloom b2 ON b2.word = cg.p2 // 32
  LEFT JOIN bench ON bench.g = cg.g
),
agg AS (
  SELECT doc_id, CAST(SUM(bloomhit) AS BIGINT) AS n_bloom_hits,
         CAST(SUM(exacthit) AS BIGINT) AS n_exact_hits
  FROM flags GROUP BY doc_id
)
SELECT c.doc_id, c.lang, CAST(len(c.gs) AS BIGINT) AS n_ngrams,
       COALESCE(a.n_bloom_hits, 0) AS n_bloom_hits,
       COALESCE(a.n_exact_hits, 0) AS n_exact_hits,
       CAST(CASE WHEN len(c.gs) > 0 AND 20 * COALESCE(a.n_exact_hits, 0) >= len(c.gs)
                 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM grams c LEFT JOIN agg a USING (doc_id)
WHERE substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 1) <> '0'
""",
    doc="Bloom-prescreened n-gram decontamination — the two-tier form "
    "the exact query's docstring promises when the benchmark gram set "
    "outgrows a broadcast: benchmark 5-grams fold into a FIXED-SIZE "
    "Bloom bitmap (2^16 bits packed into <=2048 (word, bits) BIGINT "
    "rows via bit_or; k=2 md5-portable hash functions, so both "
    "engines set identical bits), the corpus probes the broadcast "
    "bitmap map-side, and ONLY Bloom-positive grams are verified "
    "against the exact gram store (here the broadcast bench set; a "
    "keyed store at 100 TB — the point is the exact probe touches "
    "candidates, not every gram). No false negatives by construction "
    "(n_exact_hits <= n_bloom_hits is asserted per row by the test), "
    "and the emitted n_bloom_hits exposes the false-positive overhead "
    "the bitmap size buys. Same md5 1/16 benchmark split, 5-gram unit, "
    "and >=5%% exact-integer contamination flag as "
    "exact_ngram_decontamination, so the two are directly comparable. "
    "100 TB: the bitmap is KBs whatever the benchmark; the corpus "
    "never shuffles — scan -> explode -> three broadcast joins -> one "
    "doc_id re-aggregation.",
)
def q_bloom_ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.functions.text import shingles

    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    grams = docs.select(
        "doc_id", "lang", tokens(F.col("text")).alias("__t")
    ).select("doc_id", "lang", shingles(F.col("__t"), 5).alias("gs"))

    def pos(g, salt=""):
        src = F.concat(F.lit(salt), g) if salt else g
        return (
            F.conv(F.substring(F.md5(src), 1, 8), 16, 10).cast("bigint") % 65536
        )

    # benchmark-gram set checkpointed ONCE (benchmark-sized, MBs at any
    # corpus scale): three consumers (both bitmap hash branches + the
    # exact-verify broadcast) would otherwise re-tokenize the 1/16
    # benchmark slice per branch
    bench_grams = (
        grams.where(is_bench)
        .select(F.explode_outer("gs").alias("g"))
        .where(F.col("g").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    positions = bench_grams.select(pos(F.col("g")).alias("p")).unionByName(
        bench_grams.select(pos(F.col("g"), "b2:").alias("p"))
    )
    bloom = positions.groupBy(F.expr("p DIV 32").alias("word")).agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT)))").alias(
            "bits"
        )
    )
    cg = (
        grams.where(~is_bench)
        .select("doc_id", "lang", F.explode_outer("gs").alias("g"))
        .withColumn("p1", pos(F.col("g")))
        .withColumn("p2", pos(F.col("g"), "b2:"))
    )
    b1 = bloom.select(F.col("word").alias("w1"), F.col("bits").alias("bits1"))
    b2 = bloom.select(F.col("word").alias("w2"), F.col("bits").alias("bits2"))
    flags = (
        cg.join(F.broadcast(b1), F.expr("p1 DIV 32") == F.col("w1"), "left")
        .join(F.broadcast(b2), F.expr("p2 DIV 32") == F.col("w2"), "left")
        .join(
            F.broadcast(bench_grams.withColumn("__b", F.lit(1))), "g", "left"
        )
        .select(
            "doc_id",
            "lang",
            "g",
            F.when(
                F.col("g").isNotNull()
                & (
                    F.expr(
                        "((coalesce(bits1, 0) >> CAST(p1 % 32 AS INT)) & 1) = 1"
                    )
                )
                & (
                    F.expr(
                        "((coalesce(bits2, 0) >> CAST(p2 % 32 AS INT)) & 1) = 1"
                    )
                ),
                1,
            )
            .otherwise(0)
            .alias("bloomhit"),
            F.when(F.col("__b").isNotNull(), 1).otherwise(0).alias("exacthit"),
        )
    )
    return flags.groupBy("doc_id", "lang").agg(
        F.count("g").cast("bigint").alias("n_ngrams"),
        F.sum("bloomhit").cast("bigint").alias("n_bloom_hits"),
        F.sum("exacthit").cast("bigint").alias("n_exact_hits"),
        F.expr(
            "CAST(CASE WHEN count(g) > 0 AND 20 * sum(exacthit) >= count(g)"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("contaminated"),
    )


@register(
    "collocation_pmi_topk",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
uni AS (
  SELECT u.w, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks, UNNEST(t) u(w) GROUP BY u.w
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
big AS (
  SELECT t[CAST(i AS INTEGER)] AS wa, t[CAST(i AS INTEGER) + 1] AS wb,
         COUNT(*) AS c_ab
  FROM toks CROSS JOIN UNNEST(range(1, len(t))) u(i)
  WHERE len(t) >= 2
  GROUP BY 1, 2
),
scored AS (
  SELECT b.wa, b.wb, CAST(b.c_ab AS BIGINT) AS c_ab, ua.c AS c_a, ub.c AS c_b,
         CAST((CAST(b.c_ab AS HUGEINT) * tot.n * 1000000)
              // (CAST(ua.c AS HUGEINT) * ub.c) AS BIGINT) AS pmi_fp
  FROM big b
  JOIN uni ua ON ua.w = b.wa
  JOIN uni ub ON ub.w = b.wb
  CROSS JOIN tot
  WHERE b.c_ab >= 5
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY pmi_fp DESC, wa, wb) AS BIGINT) AS rnk,
       wa, wb, c_ab, c_a, c_b, pmi_fp
FROM scored ORDER BY pmi_fp DESC, wa, wb LIMIT 30
""",
    doc="Collocation extraction by pointwise mutual information — the "
    "classic 'which word pairs belong together' statistic (Church & "
    "Hanks 1990) behind phrase detection and tokenizer merge "
    "candidates. Log-free engine-exact form: PMI = log(N*c_ab/"
    "(c_a*c_b)) is RANK-equivalent to its argument, so the score is "
    "the fixed-point integer ratio (c_ab*N*1e6) DIV (c_a*c_b), "
    "computed in 128-bit exact arithmetic (Spark DECIMAL(38,0) DIV ≙ "
    "DuckDB HUGEINT //, verified bit-identical) because c_ab*N blows "
    "the BIGINT budget once it passes ~9.2e18 — N alone is ~1e13 at "
    "100 TB, and DuckDB's DECIMAL // would detour through DOUBLE and "
    "round. No float crosses the boundary, ties lexicographic; a "
    "c_ab >= 5 support floor keeps the rare-pair noise PMI is famous "
    "for out of the top-k. Plan: one scan fans into the unigram "
    "census and the adjacent-bigram census (both partial-agged "
    "vocab-sized shuffles); unigram counts join BACK onto bigrams on "
    "the token key (vocab-sized joins — NOT broadcast: vocab scales "
    "with the corpus, AQE picks the strategy); TakeOrdered(30) with "
    "the rank window on the bounded tail. 100 TB: everything after "
    "the two censuses is vocab-sized (Heaps' law), and both censuses "
    "absorb hot tokens map-side.",
)
def q_collocation_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # partials + scoring tail shared with the streaming twin
    # (run_streaming_pmi_counts): the counts are associative, so the
    # one-shot composition here and the per-batch merge there are the
    # same three functions — see operators/colloc.py
    from ds_mapreduce_spark.operators.colloc import (
        pmi_bigram_partial,
        pmi_topk_from_counts,
        pmi_unigram_partial,
    )

    docs = load_table(spark, sf_dir, "documents")
    return pmi_topk_from_counts(
        pmi_unigram_partial(docs), pmi_bigram_partial(docs), floor=5, k=30
    )
