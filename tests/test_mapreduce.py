"""Unit tests for the generic MapReduce surface (SURVEY.md §2.2).

The load-bearing test is the §1.4 regression: the reference never
globally merges — the same word in two chunks yields two output rows
(src/task_manager.rs:63-70 flips each map task to reduce its OWN
output only). Our engine must produce exactly ONE row per key no
matter how the input is partitioned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_mapreduce_spark.operators.mapreduce import WordCount, run_mapreduce, word_count


def test_wordcount_is_global_across_partitions(spark):
    # words repeated across many partitions — the reference would emit
    # per-chunk partial counts; we must emit one global row per word
    rows = [(i, "alpha beta alpha") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    out = {r["word"]: r["cnt"] for r in word_count(docs).collect()}
    assert out == {"alpha": 40, "beta": 20}


def test_wordcount_tokenizer_matches_reference_semantics(spark):
    # split_ascii_whitespace: runs of whitespace, no empties, case kept,
    # punctuation kept (src/implm/word_count.rs:9-11)
    docs = spark.createDataFrame(
        [(1, "  Hello  hello\tworld! "), (2, ""), (3, " \t ")],
        "doc_id long, text string",
    )
    out = {r["word"]: r["cnt"] for r in word_count(docs).collect()}
    assert out == {"Hello": 1, "hello": 1, "world!": 1}


def test_generic_mapreduce_matches_expression_wordcount(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i % 3} common") for i in range(30)], "doc_id long, text string"
    ).repartition(4)
    kv = docs.select(
        F.col("doc_id").cast("string").alias("key"), F.col("text").alias("value")
    )
    mr = {r["key"]: int(r["value"]) for r in run_mapreduce(kv, WordCount()).collect()}
    expr = {r["word"]: r["cnt"] for r in word_count(docs).collect()}
    assert mr == expr == {"w0": 10, "w1": 10, "w2": 10, "common": 30}


def test_generic_mapreduce_custom_job(spark):
    # values containing spaces are legal; keys must not contain spaces
    # (the reference's first-space-split schema, src/utils.rs:86)
    class MaxLen:
        def map(self, key, value):
            yield value.split(" ", 1)[0], str(len(value))

        def reduce(self, key, values):
            return str(max(int(v) for v in values))

    kv = spark.createDataFrame(
        [("1", "a short"), ("2", "a much longer value"), ("3", "b x")],
        "key string, value string",
    )
    out = {r["key"]: r["value"] for r in run_mapreduce(kv, MaxLen()).collect()}
    assert out == {"a": "19", "b": "3"}


def test_mapreduce_empty_input(spark):
    kv = spark.createDataFrame([], "key string, value string")
    assert run_mapreduce(kv, WordCount()).count() == 0


def test_capped_mapreduce_bounds_reduce_fanin(spark):
    """A hot key with 100 values reduces over exactly the cap smallest
    (lexicographic) values; cold keys are untouched. The reduce records
    the group size it saw, proving the bound held inside Python."""
    from ds_mapreduce_spark.operators.mapreduce import run_mapreduce_capped

    class Passthrough:
        def map(self, key, value):
            yield value.split(":", 1)[0], value.split(":", 1)[1]

        def reduce(self, key, values):
            return f"{len(values)}|" + ",".join(sorted(values))

    rows = [("r", f"hot:{i:03d}") for i in range(100)] + [
        ("r", "cold:x"), ("r", "cold:y")
    ]
    kv = spark.createDataFrame(rows, "key string, value string").repartition(8)
    out = {
        r["key"]: r["value"]
        for r in run_mapreduce_capped(kv, Passthrough(), per_key_cap=5).collect()
    }
    assert out["hot"] == "5|" + ",".join(f"{i:03d}" for i in range(5))
    assert out["cold"] == "2|x,y"


def test_capped_mapreduce_matches_uncapped_when_under_cap(spark):
    from ds_mapreduce_spark.operators.mapreduce import (
        run_mapreduce,
        run_mapreduce_capped,
    )

    class Join:
        def map(self, key, value):
            for w in set(value.split()):
                yield w, key

        def reduce(self, key, values):
            return ",".join(sorted(set(values)))

    kv = spark.createDataFrame(
        [("1", "a b"), ("2", "b c"), ("3", "a c d")], "key string, value string"
    ).repartition(3)
    capped = sorted(map(tuple, run_mapreduce_capped(kv, Join(), 100).collect()))
    full = sorted(map(tuple, run_mapreduce(kv, Join()).collect()))
    assert capped == full
