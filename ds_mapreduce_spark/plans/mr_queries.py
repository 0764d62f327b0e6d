"""MapReduce-core queries: the reference's capability surface (E2-E5).

Flagship is ``wordcount`` — the one job the reference ships
(src/implm/word_count.rs), run with intended GLOBAL group-by semantics
(SURVEY.md §1.4: the reference only emits per-chunk partial counts; a
global count is what its API contract means).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ds_mapreduce_spark.operators.mapreduce import (
    WordCount,
    run_mapreduce,
    run_mapreduce_capped,
    run_mapreduce_salted,
    word_count,
)
from ds_mapreduce_spark.functions.temporal import epoch_sec
from ds_mapreduce_spark.plans.registry import register
from ds_mapreduce_spark.sources.catalog import load_table

# Tokenizer parity note: Spark `split(text, '\\s+')` and DuckDB
# `regexp_split_to_array(text, '\s+')` both yield empty strings at
# leading separators; both sides filter them (matching the reference's
# split_ascii_whitespace, which never yields empties).
_WORDS_ORACLE = r"""
SELECT word, count(*) AS cnt
FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
"""


@register(
    "wordcount",
    oracle=_WORDS_ORACLE,
    doc="E4 flagship: global word count over documents.text, pure expressions "
    "(scan → split/explode → partial count → shuffle → final count).",
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return word_count(load_table(spark, sf_dir, "documents"))


@register(
    "mr_generic_wordcount",
    oracle=r"""
SELECT word AS key, CAST(count(*) AS VARCHAR) AS value
FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
""",
    doc="G1-G3: the generic MapReducer trait surface (string k/v, arbitrary "
    "Python map + reduce) driven through mapInPandas + applyInPandas. Same "
    "job as `wordcount` but through the UDF escape hatch, proving any "
    "reference MapReducer ports 1:1.",
)
def q_mr_generic_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    kv = docs.select(
        F.col("doc_id").cast("string").alias("key"),
        F.col("text").alias("value"),
    )
    return run_mapreduce(kv, WordCount())


@register(
    "mr_salted_wordcount",
    oracle=r"""
SELECT word AS key, CAST(count(*) AS VARCHAR) AS value
FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
""",
    doc="G1-G3 with the salted combiner: every key pre-reduces in "
    "salt_buckets independent sub-groups before the final reduce, "
    "bounding any task's group to 1/buckets of a hot key — the skew "
    "strategy for the UDF reduce path at 100 TB. Identical result to "
    "mr_generic_wordcount (sum is associative+commutative).",
)
def q_mr_salted_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    kv = docs.select(
        F.col("doc_id").cast("string").alias("key"),
        F.col("text").alias("value"),
    )
    return run_mapreduce_salted(kv, WordCount(), salt_buckets=32)


@register(
    "mr_inverted_index",
    oracle=r"""
SELECT word AS key,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS value
FROM (
  SELECT DISTINCT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS word
  FROM documents
)
GROUP BY word
""",
    doc="G1-G3 classic MapReduce job #3: inverted index (word -> sorted "
    "distinct doc list). Non-numeric reduce — the value is a structured "
    "join of the group, exercising the arbitrary-reducer contract the "
    "relational agg path can't express. Posting lists for ultra-common "
    "words are the skew hazard at 100 TB; production caps or shards "
    "them (the salted combiner handles the count half, not the "
    "concatenation, which is order-dependent).",
)
def q_mr_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    class InvertedIndex:
        def map(self, key: str, value: str):
            for word in set(value.split()):
                yield word, key

        def reduce(self, key: str, values: list[str]) -> str:
            return ",".join(str(d) for d in sorted({int(v) for v in values}))

    docs = load_table(spark, sf_dir, "documents")
    kv = docs.select(
        F.col("doc_id").cast("string").alias("key"),
        F.col("text").alias("value"),
    )
    return run_mapreduce(kv, InvertedIndex())


@register(
    "mr_inverted_index_capped",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT word, CAST(doc_id AS VARCHAR) AS d
  FROM (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS word
    FROM documents
  )
), capped AS (
  SELECT word, d, row_number() OVER (PARTITION BY word ORDER BY d) AS rn
  FROM pairs
)
SELECT word AS key, string_agg(d, ',' ORDER BY d) AS value
FROM capped WHERE rn <= 16
GROUP BY word
""",
    doc="The bounded-fan-in answer to mr_inverted_index's documented "
    "hot-key hazard, graded: posting lists are capped to the 16 "
    "lexicographically-smallest doc ids per word via "
    "run_mapreduce_capped — a map-side partial cap per Arrow batch "
    "(shuffle carries ≤ cap rows per key per batch) plus a global "
    "row_number cap (JVM sort, spillable), so the Python reduce never "
    "sees more than 16 values however common the word. The oracle "
    "applies the same cap with a window. 100 TB: the ultra-common-word "
    "group that would land ~1 TB in one applyInPandas call is bounded "
    "to 16 rows; the full-list variant stays available for corpora "
    "where completeness beats boundedness.",
)
def q_mr_inverted_index_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    class InvertedIndexLex:
        def map(self, key: str, value: str):
            for word in set(value.split()):
                yield word, key

        def reduce(self, key: str, values: list[str]) -> str:
            return ",".join(sorted(set(values)))

    docs = load_table(spark, sf_dir, "documents")
    kv = docs.select(
        F.col("doc_id").cast("string").alias("key"),
        F.col("text").alias("value"),
    )
    return run_mapreduce_capped(kv, InvertedIndexLex(), per_key_cap=16)


@register(
    "mr_generic_charcount",
    oracle="""
SELECT source AS key, CAST(CAST(sum(n_chars) AS BIGINT) AS VARCHAR) AS value
FROM documents GROUP BY source
""",
    doc="G1-G3 with a second MapReducer instantiation (chars per source) — "
    "demonstrates the trait is runtime-pluggable, unlike the reference "
    "which compile-time binds WordCount (src/worker.rs:121,145).",
)
def q_mr_generic_charcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    class CharCount:
        def map(self, key: str, value: str):
            source, n_chars = value.split("\x00", 1)
            yield source, n_chars

        def reduce(self, key: str, values: list[str]) -> str:
            return str(sum(int(v) for v in values))

    docs = load_table(spark, sf_dir, "documents")
    kv = docs.select(
        F.col("doc_id").cast("string").alias("key"),
        F.concat_ws("\x00", F.col("source"), F.col("n_chars").cast("string")).alias("value"),
    )
    return run_mapreduce(kv, CharCount())


@register(
    "wordcount_topk",
    oracle=r"""
SELECT word, cnt, rnk FROM (
  SELECT word, cnt,
         row_number() OVER (ORDER BY cnt DESC, word ASC) AS rnk
  FROM (
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
  )
) WHERE rnk <= 25
""",
    doc="E12 top-k on the wordcount result: deterministic total order "
    "(cnt DESC, word ASC). TakeOrderedAndProject — no full sort at scale.",
)
def q_wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    wc = word_count(load_table(spark, sf_dir, "documents"))
    # distributed top-k first (TakeOrderedAndProject: each task keeps its
    # local top 25, driver merges) — the global row_number window then
    # runs over 25 rows, not the full distinct-word set
    top = wc.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(25)
    w = Window.orderBy(F.col("cnt").desc(), F.col("word").asc())
    return top.withColumn("rnk", F.row_number().over(w))


@register(
    "mr_secondary_sort",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS ts_sec, event_id, event_type
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       array_to_string(list(event_type ORDER BY ts_sec, event_id)[1:5], ',') AS first5_types,
       MIN(ts_sec) AS first_ts
FROM e GROUP BY user_id
""",
    doc="Classic MapReduce 'secondary sort' (values ordered within each "
    "key group — in the reference's model this needs a composite-key "
    "partitioner + grouping comparator the framework doesn't have; "
    "src/worker.rs:163-177 hands reducers UNORDERED value lists). "
    "Spark-first form: collect_list(struct(sort_key, value)) + "
    "sort_array — the per-key sort happens inside the aggregate "
    "buffer, one shuffle, no global sort. Tie-broken on event_id so "
    "the order (and hash) is total. At 100 TB the bounded per-user "
    "event count keeps buffers small; unbounded keys would switch to "
    "window row_number + filter (same single shuffle). Output joins "
    "the first-5 list to a CSV string: the driver canonicalizer hashes "
    "atomic columns only (tests/test_driver_contract.py).",
)
def q_mr_secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        epoch_sec("ts").alias("ts_sec"),
        "event_id",
        "event_type",
    )
    ordered = F.sort_array(F.collect_list(F.struct("ts_sec", "event_id", "event_type")))
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.slice(F.transform(ordered, lambda s: s["event_type"]), 1, 5), ","
        ).alias("first5_types"),
        F.min("ts_sec").alias("first_ts"),
    )


@register(
    "mr_distributed_grep",
    oracle=r"""
SELECT word AS key, CAST(count(DISTINCT doc_id) AS VARCHAR) AS value
FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS word
      FROM documents)
WHERE len(word) >= 3 AND word LIKE '%er'
GROUP BY word
""",
    doc="Dean & Ghemawat classic job #1 — distributed grep — through "
    "the generic MapReducer trait: a SELECTIVE map (emit only matching "
    "tokens, with their source doc) whose output is a sliver of the "
    "input, the opposite cardinality profile of WordCount; reduce is "
    "an order-insensitive distinct-source count (the reference hands "
    "reducers UNORDERED value lists — src/worker.rs:163-177). "
    "Completes the paper's canonical job set on this engine next to "
    "wordcount and mr_inverted_index. 100 TB: the map-side filter "
    "means the shuffle carries only matches — grep's whole point as a "
    "MapReduce job.",
)
def q_mr_distributed_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.mapreduce import DistributedGrep

    docs = load_table(spark, sf_dir, "documents")
    kv = docs.select(
        F.col("doc_id").cast("string").alias("key"),
        F.col("text").alias("value"),
    )
    return run_mapreduce(kv, DistributedGrep())
