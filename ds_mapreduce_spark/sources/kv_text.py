"""KV text sink/source: the reference's on-disk interchange format.

Reference parity (SURVEY.md §2.1 R5/R6): the reference serializes every
result as ``"key value\\n"`` lines (src/utils.rs:47-53,64-77) and parses
them back with a first-space split (src/utils.rs:79-92) — keys must not
contain spaces, values may. We keep that exact format contract but fix
its defects: output files are one-per-partition under a directory (the
Spark analogue of one file per reduce task) instead of randomly-named
``u64`` files (src/utils.rs:65), and writes are atomic via Spark's
commit protocol.

Scale notes (100 TB): the sink is a straight per-partition text write —
no shuffle, no driver involvement; the source is a line-aware text scan
that splits at ``maxPartitionBytes``. For anything beyond reference
interchange, prefer Parquet (typed, columnar, prunable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_kv_text(df: DataFrame, out_dir: str, key_col: str = "key", value_col: str = "value") -> None:
    """Write (key, value) rows as ``"key value"`` lines, one file per
    partition (reference src/utils.rs:64-77 ``write_result``)."""
    df.select(
        F.concat_ws(" ", F.col(key_col).cast("string"), F.col(value_col).cast("string")).alias(
            "value"
        )
    ).write.mode("overwrite").text(out_dir)


def read_kv_text(spark: SparkSession, path: str) -> DataFrame:
    """Parse ``"key value"`` lines back to (key, value) string rows via
    first-space split (reference src/utils.rs:79-92
    ``retrieve_parsed_intermediate_file``): ``split(value, " ", 2)``
    is ``split_once`` — the value keeps any further spaces."""
    parts = F.split("value", " ", 2)
    return spark.read.text(path).select(
        parts.getItem(0).alias("key"),
        F.coalesce(parts.getItem(1), F.lit("")).alias("value"),
    )
