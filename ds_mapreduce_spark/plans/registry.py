"""Query registry: the engine's public query surface.

Every implemented operator from SURVEY.md §2 registers here with
(a) a Spark callable ``(spark, sf_dir) -> DataFrame`` and (b) where
SQL-expressible, an ANSI-SQL oracle DuckDB runs on the same parquet
tables. The driver hash-compares the two at sf0.01 — column names are
matched by sorting, so every computed column is aliased identically on
both sides.

Oracle-parity conventions used throughout (chosen so value hashes agree
bit-for-bit across engines):

- computed doubles are ``ROUND(x, 4)`` on BOTH sides (summation order
  differs between engines; 4dp absorbs last-ulp drift);
- integer sums are ``CAST(... AS BIGINT)`` in the oracle (DuckDB sums
  integers to HUGEINT, Spark to BIGINT);
- no raw timestamps in outputs — epoch seconds (BIGINT) or formatted
  strings instead (timezone-representation differences);
- portable hashing (md5 of strings) wherever both engines must compute
  the same hash (MinHash/LSH, fingerprints);
- any top-k has a total deterministic ORDER BY (tie-broken by a key).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every plan module (side-effect: fills REGISTRY)."""
    from ds_mapreduce_spark.plans import (  # noqa: F401
        dedup_queries,
        mr_queries,
        multimodal_queries,
        relational_queries,
        similarity_queries,
        stream_queries,
        temporal_queries,
        text_queries,
    )

    return REGISTRY
