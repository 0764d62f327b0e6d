from ds_mapreduce_spark.functions.temporal import epoch_day, epoch_sec, epoch_us
from ds_mapreduce_spark.functions.text import norm_text, portable_fingerprint, shingles, tokens
from ds_mapreduce_spark.functions.vector import cosine_similarity, dot, l2_norm

__all__ = [
    "cosine_similarity",
    "dot",
    "epoch_day",
    "epoch_sec",
    "epoch_us",
    "l2_norm",
    "norm_text",
    "portable_fingerprint",
    "shingles",
    "tokens",
]
