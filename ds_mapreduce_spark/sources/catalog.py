"""Sources: the engine's scan surface.

Reference parity (SURVEY.md §2.1): the reference's entire source layer
is "open one local text file, chop it into 1024-byte chunks, one task
per chunk" (reference src/utils.rs:9-45, src/master.rs:34-46). Spark's
input-split machinery subsumes it (``spark.sql.files.maxPartitionBytes``);
the defects we deliberately do NOT replicate are its dropped final
partial chunk (src/utils.rs:30 ``read_exact``) and mid-word byte splits
— Spark text splits are line-aware.

Scale notes (100 TB): ``spark.read.parquet`` on a 100 TB table gives
columnar scans with predicate pushdown + column pruning; the catalog
here never collects, caches, or repartitions at read time, so partition
pruning and AQE stay fully in play downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the driver-generated star schema + LLM-pipeline tables (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to LTZ TIMESTAMP whatever the physical encoding.

    The SINGLE place that knows the driver's on-disk ts encodings (batch
    ``load_table`` and every streaming reader call this):

    - INT64 nanos (read as long under ``nanosAsLong``) → µs truncation
      then ``timestamp_micros``;
    - ``timestamp[us]`` without tz (Spark: TIMESTAMP_NTZ) → cast to
      TIMESTAMP; with the session tz pinned UTC the cast preserves the
      wall-clock value, so ``unix_micros`` ≙ DuckDB ``epoch_us``.

    Works on both batch and streaming DataFrames (pure column expr).
    """
    ts_type = dict(df.dtypes).get("ts")
    if ts_type in ("bigint", "long"):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar Parquet scan of one catalog table.

    Reference parity: R1 text-file scan (src/map_reduce.rs:12-17)
    generalized to typed Parquet (extension X1).

    Determinism guards (idempotent, safe under any driver session):
    - session timezone pinned to UTC so timestamp literals/formatting
      match a timezone-naive oracle;
    - ``events.ts`` has shipped in two physical encodings across driver
      rounds, and ALL ts-encoding knowledge lives here (nowhere else):

      * nanosecond INT64 — Spark 4 cannot read it as a timestamp; read
        as long (``nanosAsLong``) and convert at microsecond precision
        (the same truncation every µs-native engine applies);
      * ``timestamp[us]`` with no timezone — Spark 4 reads it as
        TIMESTAMP_NTZ, which ``unix_micros``/``window``/``unix_timestamp``
        reject; cast NTZ→TIMESTAMP (LTZ). The session tz is pinned UTC
        above, so the cast is wall-clock-preserving and ``unix_micros``
        equals DuckDB ``epoch_us`` on the same naive value.

      Downstream code may therefore assume ``ts`` is always LTZ
      TIMESTAMP in UTC, whatever the driver regenerates next round.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return normalize_events_ts(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_text_corpus(spark: SparkSession, path: str, wholetext: bool = False) -> DataFrame:
    """Line- (or file-) oriented text scan → (key, value) string rows.

    Reference parity: R1+R4 (src/worker.rs:119-120 reads a whole chunk
    as one record keyed by its filename). ``wholetext=True`` reproduces
    the whole-chunk-as-one-record shape; default is line-oriented,
    which is what a scalable tokenizer wants.

    Scale notes: Spark splits text inputs by line boundaries at
    ``maxPartitionBytes``; no driver-side file listing loops.
    """
    df = spark.read.text(path, wholetext=wholetext)
    return df.select(
        F.input_file_name().alias("key"),
        F.col("value").alias("value"),
    )
