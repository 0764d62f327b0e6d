"""Deduplication operators (E6/E7 + BASELINE.json 'dedup' extension).

Five strategies, all shuffle-scalable (no driver-side state, no
collect, no cross join of the full table against itself):

- exact            : hash groupBy on canonical text
- ngram_jaccard    : min-md5-shingle blocking → exact Jaccard on
                     candidates (MinHash-LSH with 1 band × 1 row, then
                     exact verify — fully oracle-checkable)
- minhash_lsh      : k md5-minhashes → b bands → band-key self-join
- simhash          : per-bit majority over md5-derived 32-bit token
                     hashes → hamming-bucket candidates
- embedding_cosine : pairwise cosine ≥ τ (LSH/IVF bucketing is the
                     scale path — see similarity.py; exact form here)

Portable hashing note: every hash that must match an external oracle
is md5-of-string; Spark's native ``F.hash``/``F.xxhash64`` are used
nowhere results leave the engine.

Scale notes (100 TB): blocking keys (min-shingle-md5, LSH band keys,
simhash prefix) turn the O(n²) pair space into groupBy-sized buckets;
the self-joins are equi-joins on those keys, so they shuffle-partition
cleanly. Skewed buckets (a shingle appearing in millions of docs) are
handled by AQE skew-join locally; at true 100 TB you additionally cap
bucket width (drop shingles with doc-frequency above a threshold —
they carry no dedup signal anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ds_mapreduce_spark.functions.text import norm_text, shingles, tokens
from ds_mapreduce_spark.functions.vector import cosine_similarity


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """One row per distinct canonical text: representative (min doc_id),
    duplicate count, and the portable group fingerprint."""
    return (
        docs.select(F.col("doc_id"), F.md5(norm_text(F.col("text"))).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def doc_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct k-word shingles per document."""
    return docs.select(
        "doc_id",
        F.explode(shingles(tokens(F.col("text")), k)).alias("shingle"),
    ).where(F.col("shingle") != "")


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.8) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard, min-md5-shingle blocked.

    Blocking: two documents with Jaccard ≥ τ share ≥ τ/(1+τ) of their
    shingle union, so P(same min-md5 shingle) ≥ τ/(1+τ) — for τ=0.8
    that's ≥0.44 per independent hash; with one block this is a recall
    heuristic exactly like a 1-row MinHash band, and it is DETERMINISTIC
    (md5), so the oracle reproduces it bit-for-bit.
    """
    sh = doc_shingles(docs, k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    blocks = sh.groupBy("doc_id").agg(F.min(F.md5("shingle")).alias("block"))

    a = blocks.alias("a")
    b = blocks.alias("b")
    cand = a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.doc_id") < F.col("b.doc_id"))).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )

    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(docs: DataFrame, k: int = 3, num_hashes: int = 8) -> DataFrame:
    """(doc_id, h0..h{n-1}) — md5-based MinHash signature columns.

    minhash_i(doc) = min over shingles of md5('<i>:' || shingle); the
    seed-prefixed md5 family is a valid (if slow) universal hash and,
    critically, portable across engines.
    """
    sh = doc_shingles(docs, k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame, k: int = 3, num_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """Candidate near-dup pairs via MinHash banding.

    num_hashes/band_size bands; docs agreeing on ALL hashes of any band
    are candidates. Output is the distinct candidate pair set — the
    standard LSH recall/precision trade (verify with ngram_jaccard_pairs
    for the filtered version).
    """
    sig = minhash_signatures(docs, k, num_hashes)
    n_bands = num_hashes // band_size
    bands = None
    for b in range(n_bands):
        cols = [F.col(f"h{b * band_size + j}") for j in range(band_size)]
        part = sig.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.concat_ws("|", *cols).alias("band_key"),
        )
        bands = part if bands is None else bands.unionAll(part)

    x = bands.alias("x")
    y = bands.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """(doc_id, simhash BIGINT) — per-bit majority vote over md5-derived
    token hashes (token hash = first 8 md5 hex chars as a 32-bit int).

    Near-identical documents differ in few bits; pairs within hamming
    distance d are found by exact-match on hash chunks (the standard
    pigeonhole trick) — see ``simhash_candidate_pairs``.
    """
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    tok = tok.withColumn("th", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"))
    bit_sums = [
        F.sum(F.when(F.col("th").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(bits)
    ]
    per_doc = tok.groupBy("doc_id").agg(*bit_sums)
    sim = F.lit(0).cast("long")
    for i in range(bits):
        sim = sim + F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(0)
    return per_doc.select("doc_id", sim.alias("simhash"))


def simhash_candidate_pairs(docs: DataFrame, bits: int = 32, chunks: int = 4) -> DataFrame:
    """Pairs agreeing on ≥1 of `chunks` simhash chunks (hamming ≤ chunks-1
    guaranteed found), with exact hamming distance attached."""
    sh = simhash(docs, bits)
    width = bits // chunks
    mask = (1 << width) - 1
    parts = None
    for cix in range(chunks):
        p = sh.select(
            "doc_id",
            "simhash",
            F.lit(cix).alias("chunk"),
            F.shiftright("simhash", cix * width).bitwiseAND(F.lit(mask)).alias("chunk_val"),
        )
        parts = p if parts is None else parts.unionAll(p)
    a = parts.alias("a")
    b = parts.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    xor = F.col("sh_a").bitwiseXOR(F.col("sh_b"))
    return pairs.select("doc_a", "doc_b", F.bit_count(xor).alias("hamming"))


def embedding_cosine_pairs(emb: DataFrame, threshold: float) -> DataFrame:
    """Exact pairwise cosine near-dup over an embedding table.

    This is the exact O(n²) form — correct at any n but quadratic; the
    scale path buckets first (similarity.py ivf_topk / LSH) and only
    cross-joins within buckets. Kept exact here because dedup demands
    recall=1 semantics when used as an oracle-checked operator.
    """
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity(F.col("e_a"), F.col("e_b")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
