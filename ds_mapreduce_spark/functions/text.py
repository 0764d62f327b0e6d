"""Text primitives shared by wordcount, dedup, and text analysis.

Tokenization contract matches the reference's
``split_ascii_whitespace`` (reference src/implm/word_count.rs:9-11):
split on whitespace runs, drop empties, case-sensitive, no punctuation
stripping. Everything here is a Catalyst expression builder — no UDFs.

Portability contract: anywhere a hash value itself is part of the
result (fingerprints, MinHash signatures, LSH band keys) we use
``md5`` of UTF-8 strings, which DuckDB / Spark / every engine computes
identically — NOT ``F.hash`` (Spark-private Murmur3 seed).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """array<string> of whitespace tokens, empties dropped."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != F.lit(""))


def shingles(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a token array (order-preserving join
    with single spaces), the unit of near-dup comparison.

    Expression shape: sequence(1, n-k+1) → transform(i → concat of the
    k tokens at i..i+k-1) → array_distinct; entirely codegen'd.
    """
    def make(i):
        return F.concat_ws(" ", *[F.element_at(toks, (i + j).cast("int")) for j in range(k)])

    seq = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    # guard: sequence(1, n) descends when n < 1, so short docs get []
    return F.when(
        F.size(toks) >= k, F.array_distinct(F.transform(seq, make))
    ).otherwise(F.array().cast("array<string>"))


def norm_text(text: Column) -> Column:
    """Canonical form for exact dedup: lowercase, whitespace-collapsed."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def portable_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the canonical form.

    Reference parity: replaces the reference's random u64 output names
    (src/utils.rs:65) with a content-derived, engine-portable id.
    """
    return F.md5(norm_text(text))
