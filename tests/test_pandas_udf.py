"""The vectorized scalar-UDF path: an Arrow-batched @pandas_udf cosine
must agree with the JVM expression cosine to float tolerance. The
engine keeps vector math JVM-side (functions/vector.py) because
expressions win at typical dims; this pins the escape hatch for
very high dims (>4k) where numpy's BLAS path becomes competitive —
and proves the two paths are interchangeable."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ds_mapreduce_spark.functions.vector import cosine_similarity
from ds_mapreduce_spark.sources.catalog import load_table


def test_pandas_udf_cosine_matches_expression(spark, sf_dir):
    # defined inside the test: pandas_udf registration needs a live session
    @pandas_udf("double")
    def np_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        # upcast like the expression path (per-element cast to double);
        # arrow delivers the stored float32, which would otherwise
        # accumulate in single precision
        ma = np.stack(a.values).astype(np.float64)
        mb = np.stack(b.values).astype(np.float64)
        num = (ma * mb).sum(axis=1)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(num / den)

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("ia") < F.col("ib"))
    both = pairs.select(
        "ia",
        "ib",
        cosine_similarity(F.col("ea"), F.col("eb")).alias("expr_cos"),
        np_cosine(F.col("ea"), F.col("eb")).alias("udf_cos"),
    ).collect()
    assert len(both) == 50 * 49 // 2
    for r in both:
        assert r.expr_cos == pytest.approx(r.udf_cos, rel=1e-9, abs=1e-12)
