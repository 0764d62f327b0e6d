"""Format round-trip queries: grade the non-parquet source/sink paths.

Reference parity (SURVEY.md §2.1 R1/R4/R5/R6): the reference's entire
I/O surface is text files — chunked scans (src/utils.rs:9-45) and
``"key value\\n"`` interchange files (src/utils.rs:47-92). The parquet
queries grade X1; this module grades the text path end-to-end by
ROUND-TRIPPING real table data through the kv_text sink+source and
hash-comparing an aggregate of the parsed-back rows against a DuckDB
oracle that never saw the text files. Any corruption in the write, the
line split, or the first-space parse diverges the hash.

Scale notes (100 TB): the rendering is a map-only projection, the sink
a per-partition text write (no shuffle, no driver), the re-scan a
line-aware text split at ``maxPartitionBytes``; the only shuffle in the
graded plan is the final aggregation's.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ds_mapreduce_spark.plans.registry import register
from ds_mapreduce_spark.sources.catalog import load_table
from ds_mapreduce_spark.sources.kv_text import read_kv_text, write_kv_text


def _scratch_dir(tag: str, sf_dir: str) -> str:
    """Deterministic per-(query, sf) scratch path in the system tmp dir
    (Spark's own scratch space lives there too); overwritten each run."""
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(tempfile.gettempdir(), "ds_mapreduce_spark", f"{tag}_{sf}")


@register(
    "kv_text_roundtrip",
    oracle="""
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang, source
""",
    doc="R1/R4/R5/R6 graded end-to-end: documents → 'key value' lines "
    "(key = doc_id, value = 'lang source n_chars' — value KEEPS its "
    "spaces, exercising the reference's first-space split_once parse, "
    "src/utils.rs:79-92) → kv_text sink → kv_text source → parse → "
    "aggregate. The oracle aggregates the original parquet directly, "
    "so the hash only matches if the text round trip is lossless. "
    "100 TB: map-only render, per-partition write, line-aware re-scan; "
    "one aggregation shuffle total.",
)
def q_kv_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rendered = docs.select(
        F.col("doc_id").alias("key"),
        F.concat_ws(" ", "lang", "source", F.col("n_chars").cast("string")).alias("value"),
    )
    out = _scratch_dir("kv_text_roundtrip", sf_dir)
    write_kv_text(rendered, out)
    back = read_kv_text(spark, out)
    parts = F.split("value", " ")
    parsed = back.select(
        parts.getItem(0).alias("lang"),
        parts.getItem(1).alias("source"),
        parts.getItem(2).cast("bigint").alias("n_chars"),
    )
    return parsed.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
