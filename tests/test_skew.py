"""salted_join must be row-identical to the plain join on skewed data
(one key holding most rows), for inner and left joins including
unmatched left keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_mapreduce_spark.operators.skew import salted_join


def _skewed(spark):
    # key "hot" has 500 rows; 10 cold keys have 1 each; "orphan" unmatched
    rows = [("hot", i) for i in range(500)]
    rows += [(f"cold{i}", i) for i in range(10)]
    rows += [("orphan", 99)]
    left = spark.createDataFrame(rows, "k string, v bigint")
    right = spark.createDataFrame(
        [("hot", "H"), ("cold3", "C3"), ("cold7", "C7")], "k string, tag string"
    )
    return left, right


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_salted_inner_equals_plain(spark):
    left, right = _skewed(spark)
    plain = left.join(right, "k", "inner")
    salted = salted_join(left, right, "k", "inner", salt_buckets=4)
    assert _sorted_rows(salted) == _sorted_rows(plain)
    assert salted.count() == 502  # 500 hot + cold3 + cold7


def test_salted_left_preserves_unmatched(spark):
    left, right = _skewed(spark)
    plain = left.join(right, "k", "left")
    salted = salted_join(left, right, "k", "left", salt_buckets=4)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salt_actually_splits_hot_key(spark):
    left, _ = _skewed(spark)
    salt = F.pmod(F.xxhash64("v"), F.lit(4))
    n_buckets = (
        left.where(F.col("k") == "hot")
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n_buckets == 4  # the hot key's rows spread over all buckets
