"""The generic MapReduce surface (SURVEY.md §2.2 rows G1-G3).

Reference parity: the ``MapReducer`` trait (reference
src/map_reduce.rs:4-7) is the reference's ENTIRE query language — one
user flatMap, one group-by-key, one user reduce, strings end-to-end.
We mirror the trait 1:1 so any reference job ports unchanged, but run
it as a Spark plan:

- map phase  → ``mapInPandas`` (Arrow batches, one Python call per
  batch instead of per record — the vectorized analogue of
  src/worker.rs:113-133 ``map_runner``)
- group+reduce → ``groupBy("key").applyInPandas`` (Spark's shuffle
  supplies the global hash partitioning the reference omits — see
  SURVEY.md §1.4: the reference only ever groups per-chunk, producing
  partial counts; we implement the intended global semantics)

Scale notes (100 TB): both phases stream Arrow batches; nothing is
collected on the driver. ``applyInPandas`` materializes ONE KEY GROUP
per call, which is the same memory contract as the reference's
per-key reduce (src/worker.rs:144-149) but distributed; for aggregations
expressible as Spark expressions, prefer the relational operators in
``relational.py`` — they get partial (map-side) aggregation and
whole-stage codegen, and are the fast path. This module is the
arbitrary-UDF escape hatch, exactly like the trait it mirrors.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the reference's fixed record schema: string key, string value
#: (reference src/map_reduce.rs:5-6 — keys/values are String end-to-end)
KV_SCHEMA = "key string, value string"


class MapReducer(Protocol):
    """1:1 mirror of the reference trait (src/map_reduce.rs:4-7).

    ``map``    : one record → 0..n key/value pairs   (G1)
    ``reduce`` : key + all its values → one value    (G3)
    """

    def map(self, key: str, value: str) -> Iterable[tuple[str, str]]: ...

    def reduce(self, key: str, values: list[str]) -> str: ...


class WordCount:
    """The reference's single packaged job (src/implm/word_count.rs:1-25).

    Tokenization matches ``split_ascii_whitespace`` semantics: split on
    runs of whitespace, drop empties, case-sensitive, no punctuation
    stripping (src/implm/word_count.rs:9-11).
    """

    def map(self, key: str, value: str) -> Iterable[tuple[str, str]]:
        for word in value.split():
            yield word, "1"

    def reduce(self, key: str, values: list[str]) -> str:
        # src/implm/word_count.rs:21 parses each value and sums
        return str(sum(int(v) for v in values))


class DistributedGrep:
    """Dean & Ghemawat's distributed grep (MapReduce paper §2.3, the
    canonical selective-map job) on the reference's MapReducer trait:
    map emits (matched_token, source_doc) only for tokens matching the
    predicate — the map output is a tiny FILTERED slice of the input,
    the opposite cardinality profile of WordCount — and reduce counts
    the distinct source docs per match. The reducer sees an UNORDERED
    value list (src/worker.rs:163-177 hands reducers unordered values),
    so it must be order-insensitive: set-size is.

    The predicate is suffix matching (no regex engine in the hot path:
    str.endswith in the Arrow batch, LIKE in the oracle — identical
    semantics, no RE dialect to reconcile).
    """

    def __init__(self, suffix: str = "er", min_len: int = 3) -> None:
        self.suffix = suffix
        self.min_len = min_len

    def map(self, key: str, value: str) -> Iterable[tuple[str, str]]:
        for word in value.split():
            if len(word) >= self.min_len and word.endswith(self.suffix):
                yield word, key

    def reduce(self, key: str, values: list[str]) -> str:
        return str(len(set(values)))


def run_mapreduce(kv: DataFrame, mr: MapReducer) -> DataFrame:
    """Run an arbitrary MapReducer over a (key, value) DataFrame.

    Equivalent of ``MapReduce::run`` (src/map_reduce.rs:12-17) minus the
    hand-rolled scheduler: Spark stages replace the Map→Reduce task flip
    (src/task_manager.rs:63-70), the shuffle replaces the intermediate
    ``inter/`` files (src/utils.rs:64-77).
    """

    def map_phase(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out_k: list[str] = []
            out_v: list[str] = []
            for key, value in zip(batch["key"], batch["value"]):
                for k, v in mr.map(key, value):
                    out_k.append(k)
                    out_v.append(v)
            yield pd.DataFrame({"key": out_k, "value": out_v})

    def reduce_phase(group: pd.DataFrame) -> pd.DataFrame:
        key = group["key"].iloc[0]
        value = mr.reduce(key, group["value"].tolist())
        return pd.DataFrame({"key": [key], "value": [value]})

    mapped = kv.mapInPandas(map_phase, schema=KV_SCHEMA)
    return mapped.groupBy("key").applyInPandas(reduce_phase, schema=KV_SCHEMA)


def run_mapreduce_salted(
    kv: DataFrame, mr: MapReducer, salt_buckets: int = 32
) -> DataFrame:
    """``run_mapreduce`` with a salted combiner stage, for ASSOCIATIVE +
    COMMUTATIVE reducers (word count's sum qualifies; a median would not).

    Hot keys are the scale hazard of the generic surface: ``applyInPandas``
    materializes one key group per call, so a key holding 1% of a 100 TB
    map output lands 1 TB in one task. Salting splits every key into
    ``salt_buckets`` sub-groups reduced independently (bounding any
    task's group to 1/salt_buckets of the key), then a second reduce over
    the ≤ salt_buckets partial values per key produces the final value.
    The salt is a deterministic hash of the VALUE so the same record
    always lands in the same bucket (retry-stable); it never leaves the
    plan. This is the combiner (map-side pre-aggregation) the reference
    accidentally approximated with its per-chunk grouping (SURVEY.md
    §1.4), done on purpose and made globally correct.
    """

    def map_phase(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out_k: list[str] = []
            out_v: list[str] = []
            for key, value in zip(batch["key"], batch["value"]):
                for k, v in mr.map(key, value):
                    out_k.append(k)
                    out_v.append(v)
            yield pd.DataFrame({"key": out_k, "value": out_v})

    def reduce_partial(group: pd.DataFrame) -> pd.DataFrame:
        key = group["key"].iloc[0]
        value = mr.reduce(key, group["value"].tolist())
        return pd.DataFrame({"key": [key], "value": [value]})

    mapped = kv.mapInPandas(map_phase, schema=KV_SCHEMA)
    salted = mapped.withColumn(
        "__salt", F.pmod(F.xxhash64("value"), F.lit(salt_buckets))
    )
    partials = (
        salted.groupBy("key", "__salt")
        .applyInPandas(
            lambda g: reduce_partial(g[["key", "value"]]), schema=KV_SCHEMA
        )
    )
    return partials.groupBy("key").applyInPandas(reduce_partial, schema=KV_SCHEMA)


def word_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Flagship query (E4): global word count, pure Spark expressions.

    The declarative fast path for the job the reference hard-codes
    (src/worker.rs:121,145 bind ``WordCount`` at compile time). Catalyst
    plans this as scan → whole-stage-codegen'd split/explode → partial
    count → shuffle on word → final count: the reference's per-chunk
    grouping (SURVEY.md §1.4) is subsumed as the partial-agg half, and
    the shuffle provides the global merge it lacks.

    Scale notes (100 TB): no Python in the plan; skew on ultra-common
    words is absorbed by partial aggregation (each task pre-counts its
    partition, so the shuffle carries one row per distinct word per
    task, not one per occurrence).
    """
    return (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def run_mapreduce_capped(
    kv: DataFrame, mr: MapReducer, per_key_cap: int
) -> DataFrame:
    """``run_mapreduce`` with a BOUNDED reduce fan-in, for reducers that
    are not associative (so ``run_mapreduce_salted`` does not apply) but
    tolerate truncation — the inverted-index posting-list case: an
    ultra-common word's doc list is capped, not materialized whole.

    Contract: each key's reduce receives the ``per_key_cap``
    lexicographically-smallest values (deterministic, retry-stable).
    Two-level enforcement, mirroring partial aggregation:

    1. map-side partial cap — each Arrow batch keeps only its own
       ``per_key_cap`` smallest values per key, so the shuffle carries
       at most cap × distinct-keys-per-batch rows (the global smallest
       cap values are a subset of every partial's, so this loses
       nothing);
    2. a ``row_number`` window on (key, value) keeps the global
       smallest ``per_key_cap`` — the per-key sort is JVM-side and
       spillable, and at most ``per_key_cap`` rows per key ever reach
       the Python reduce.

    At 100 TB this bounds the hot-key group that would otherwise land
    ~1 TB in one ``applyInPandas`` call (the hazard documented on
    ``mr_inverted_index``) to ``per_key_cap`` rows.
    """
    from pyspark.sql import Window

    def map_phase(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out_k: list[str] = []
            out_v: list[str] = []
            for key, value in zip(batch["key"], batch["value"]):
                for k, v in mr.map(key, value):
                    out_k.append(k)
                    out_v.append(v)
            out = pd.DataFrame({"key": out_k, "value": out_v})
            yield (
                out.sort_values(["key", "value"], kind="mergesort")
                .groupby("key", sort=False)
                .head(per_key_cap)
            )

    def reduce_phase(group: pd.DataFrame) -> pd.DataFrame:
        key = group["key"].iloc[0]
        value = mr.reduce(key, group["value"].tolist())
        return pd.DataFrame({"key": [key], "value": [value]})

    mapped = kv.mapInPandas(map_phase, schema=KV_SCHEMA)
    w = Window.partitionBy("key").orderBy("value")
    capped = (
        mapped.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= per_key_cap)
        .drop("__rn")
    )
    return capped.groupBy("key").applyInPandas(reduce_phase, schema=KV_SCHEMA)
