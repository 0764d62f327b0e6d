"""Deduplication operators (E6/E7 + BASELINE.json 'dedup').

Five strategies, all shuffle-scalable (no driver-side state, no
collect, no O(n²) pair space except where exactness demands it):

- exact            : hash groupBy on canonical text
- ngram_jaccard    : min-md5-shingle blocking → exact Jaccard on
                     candidates (deterministic 1-band MinHash blocking
                     + exact verify — fully oracle-checkable)
- minhash_lsh      : md5-derived MinHash signatures → banding →
                     band-key self-join
- simhash          : per-bit majority over md5-derived 32-bit token
                     hashes → hamming-bucket candidates
- embedding_cosine : exact pairwise cosine ≥ τ (IVF/LSH bucketing in
                     similarity.py is the approximate scale path)

Plan-shape note (this is the perf-critical part): shingle sets are
computed ONCE per document as an array column inside a single
projection — tokenize → shingle → distinct → per-doc hashes all fuse
into one whole-stage-codegen'd map over the documents scan, with NO
explode and NO shuffle until the (tiny) candidate-pair join. An
earlier explode-then-groupBy formulation shuffled |docs|×|shingles|
rows three times and was ~5× slower at sf0.1.

Portability: every hash whose value reaches a result is md5-of-string
(identical in every engine); Spark-private hashes (F.hash/xxhash64)
appear nowhere results leave the engine.

Rounding: Jaccard is rounded half-up in EXACT integer arithmetic
((20000·i + u) DIV 2u) — float ROUND at a 4dp boundary is engine-
dependent when the true ratio terminates at 5 decimals (u a multiple
of 32·5^b makes that systematic, not rare).

Scale notes (100 TB): blocking keys (min-shingle-md5, LSH bands,
simhash chunks) turn the pair space into groupBy-sized buckets; the
self-joins are equi-joins on those keys. Skewed buckets are handled
by AQE skew-join; at true 100 TB additionally pass
``max_shingle_df`` (``capped_shingle_profiles``) to drop shingles
with doc-frequency above a cap — they carry no dedup signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ds_mapreduce_spark.functions.text import norm_text, portable_fingerprint, tokens
from ds_mapreduce_spark.functions.vector import dot, l2_norm


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """One row per distinct canonical text: representative (min doc_id),
    duplicate count, and the portable group fingerprint."""
    return (
        docs.select(F.col("doc_id"), F.md5(norm_text(F.col("text"))).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


#: Mersenne prime 2^31-1; every hashed shingle / minhash value lives in
#: [0, P). All arithmetic stays under 2^62, overflow-free in BIGINT.
HASH_P = 2_147_483_647
#: shingle combiner coefficients (k consecutive token hashes → one int)
SHINGLE_C = (1_000_003, 999_983, 1)
#: (a, b) pairs for the LCG MinHash family h_i(x) = (a·x + b) mod P
MINHASH_AB = (
    (1_103_515_245, 12_345),
    (214_013, 2_531_011),
    (69_069, 362_437),
    (1_664_525, 1_013_904_223),
    (22_695_477, 1),
    (134_775_813, 1_023),
    (1_099_087_573, 715_136_305),
    (747_796_405, 2_891_336_453 % HASH_P),
)


def _token_hashes(text: Column = None) -> Column:
    """array<long> of 32-bit md5-derived token hashes (portable: the
    first 8 md5 hex chars as an int — one md5 per TOKEN, the only
    cryptographic hash in the whole dedup pipeline)."""
    t = tokens(text if text is not None else F.col("text"))
    return F.transform(t, lambda tok: F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long"))


def shingle_hash_sequence(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shseq array<long>): the POSITIONAL k-gram hash sequence
    (rolling-hash stream, duplicates and order preserved) — the input
    to winnowing fingerprints, where window positions matter. Same
    arithmetic as ``shingle_profiles`` minus the distinct."""
    assert k == len(SHINGLE_C), "combiner coefficients are fixed at k=3"
    th = _token_hashes()

    def combine(i: Column) -> Column:
        parts = None
        for j, c in enumerate(SHINGLE_C):
            term = (F.element_at(F.col("__th"), (i + j).cast("int")) % HASH_P) * c
            parts = term if parts is None else parts + term
        return parts % HASH_P

    sh = F.transform(F.sequence(F.lit(1), F.size("__th") - (k - 1)), combine)
    # Filter on the CHEAP token count BEFORE any hashing: a post-hoc
    # size(__th) >= k filter gets substituted below the projection by
    # predicate pushdown, inlining the md5 transform into the Filter —
    # and worse, a downstream size(shseq) filter inlines __th into
    # every element_at, turning O(n) per doc into O(n²·k) md5 calls
    # (41 s -> 1.5 s at sf0.1 for winnowing). The token-count filter
    # is equivalent (tokens drive both sizes) and hash-free.
    return (
        docs.where(F.size(tokens(F.col("text"))) >= k)
        .select("doc_id", th.alias("__th"))
        .select("doc_id", sh.alias("shseq"))
    )


def winnowing_fingerprints(docs: DataFrame, k: int = 3, w: int = 4) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken MOSS scheme): the distinct
    minima of every ``w``-wide window over the rolling k-gram hash
    stream. Guarantees any match of length ≥ w+k-1 tokens shares a
    fingerprint — the content-defined selection that plain min-hashing
    lacks. One row per (doc_id, fingerprint); map-only until the
    explode, no shuffle."""
    # docs long enough for >= 1 window: n - k + 1 >= w tokens. Filtering
    # the raw token count here (instead of size(shseq) afterwards) keeps
    # predicate pushdown from inlining the whole hash pipeline into the
    # Filter node — see the note in shingle_hash_sequence.
    seq = shingle_hash_sequence(docs.where(F.size(tokens(F.col("text"))) >= w + k - 1), k)
    # window min as least(element_at x w): no per-window array alloc
    # (slice + array_min built w-element arrays per position; in the
    # interpreted higher-order-function path that allocation dominates)
    minima = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("shseq") - (w - 1)),
            lambda i: F.least(
                *[F.element_at(F.col("shseq"), (i + j).cast("int")) for j in range(w)]
            ),
        )
    )
    return seq.select("doc_id", F.explode(minima).alias("fp"))


def shingle_profiles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, sh array<long>, n_shingles, block) in one projection.

    Shingle identity is arithmetic, not string: k consecutive token
    hashes combine as Σ Cᵢ·(hᵢ mod P) mod P — no shingle strings are
    ever built and md5 runs once per token, which is ~5× cheaper than
    md5-per-shingle-string (higher-order array functions are
    interpreted, so constant factors here dominate the whole dedup
    suite). ``block`` = min shingle hash: a deterministic 1-row MinHash
    band used as the blocking key (share probability ≥ τ/(1+τ) for
    Jaccard-τ pairs).
    """
    assert k == len(SHINGLE_C), "combiner coefficients are fixed at k=3"
    th = _token_hashes()

    def combine(i: Column) -> Column:
        parts = None
        for j, c in enumerate(SHINGLE_C):
            term = (F.element_at(F.col("__th"), (i + j).cast("int")) % HASH_P) * c
            parts = term if parts is None else parts + term
        return parts % HASH_P

    sh = F.array_distinct(F.transform(F.sequence(F.lit(1), F.size("__th") - (k - 1)), combine))
    return (
        docs.where(F.size(tokens(F.col("text"))) >= k)
        .select("doc_id", th.alias("__th"))
        .select("doc_id", sh.alias("sh"))
        .select(
            "doc_id",
            "sh",
            F.size("sh").alias("n_shingles"),
            F.array_min("sh").alias("block"),
        )
    )


def capped_shingle_profiles(
    docs: DataFrame, k: int = 3, max_shingle_df: int | None = None
) -> DataFrame:
    """``shingle_profiles`` with an optional corpus doc-frequency cap:
    shingles appearing in more than ``max_shingle_df`` documents are
    dropped before signatures/blocking — they carry no dedup signal
    (boilerplate, headers) but create giant LSH buckets and hot blocks.
    Default ``None`` = off, so graded oracles are untouched.

    Scale (100 TB): the df pass is one explode+count shuffle
    (partial-aggregated map-side); the hot set is bounded by
    total_shingle_instances / cap — tiny for any useful cap — and
    collapses to a single-row array that broadcasts, so the removal is
    a map-only ``array_except`` with NO per-doc shuffle. Docs whose
    shingles are all hot drop out (nothing left to block on). Exact
    verification should still run on UNCAPPED profiles — the cap is a
    candidate-generation device, not a similarity redefinition.
    """
    p = shingle_profiles(docs, k)
    if max_shingle_df is None:
        return p
    hot = (
        p.select(F.explode("sh").alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > max_shingle_df)
        .agg(F.collect_list("s").alias("hot"))
    )
    return (
        p.crossJoin(F.broadcast(hot))
        .select("doc_id", F.array_except("sh", "hot").alias("sh"))
        .where(F.size("sh") > 0)
        .select(
            "doc_id",
            "sh",
            F.size("sh").alias("n_shingles"),
            F.array_min("sh").alias("block"),
        )
    )


def _block_pairs(profiles: DataFrame, payload: list[str]) -> DataFrame:
    """All (a, b) doc pairs sharing a block, via ONE computation of the
    profile subtree: groupBy(block) → collect_list → explode nested
    pair combinations. Block buckets are small by construction (the
    blocking key exists to make them small), so the per-group pair
    expansion is bounded; the profile pipeline — the expensive part —
    runs once instead of twice per self-join side.
    """
    packed = profiles.groupBy("block").agg(
        F.collect_list(F.struct("doc_id", *payload)).alias("ds")
    )
    packed = packed.where(F.size("ds") >= 2)
    n = F.size("ds")
    pair_idx = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n), lambda j: F.struct(i.alias("i"), j.alias("j"))
            ),
        )
    )
    pairs = packed.select(F.col("ds"), F.explode(pair_idx).alias("ij")).select(
        F.element_at(F.col("ds"), F.col("ij.i").cast("int")).alias("a"),
        F.element_at(F.col("ds"), F.col("ij.j").cast("int")).alias("b"),
    )
    # canonical orientation: doc_a < doc_b
    return pairs.select(
        F.when(F.col("a.doc_id") < F.col("b.doc_id"), F.col("a")).otherwise(F.col("b")).alias("a"),
        F.when(F.col("a.doc_id") < F.col("b.doc_id"), F.col("b")).otherwise(F.col("a")).alias("b"),
    )


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.8) -> DataFrame:
    """Near-dup pairs by exact k-gram Jaccard on blocked candidates.

    A length prefilter discards most false candidates before the set
    intersection. Its bound is IMPLIED by the half-up-rounded acceptance
    predicate, not by the raw threshold: the best possible Jaccard for
    sizes (n_a, n_b) is min/max (subset case, i=min, u=max), and the
    acceptance ``(20000·i + u) DIV (2·u) >= T`` (T = threshold·10⁴)
    rewrites to ``20000·i >= (2T−1)·u`` — so a pair survives the filter
    iff ``20000·min >= (2T−1)·max``. A strict ratio ≥ τ filter would be
    TIGHTER than acceptance and could drop a pair whose rounded Jaccard
    equals exactly τ while the (prefilter-free) oracle keeps it; this
    form is provably equivalent, so the oracle reproduces it
    bit-for-bit at any document sizes.
    """
    pairs = _block_pairs(shingle_profiles(docs, k), ["sh", "n_shingles"])
    t4 = int(threshold * 10000)
    sized = pairs.where(
        (F.col("a.n_shingles") * (2 * t4 - 1) <= F.col("b.n_shingles") * 20000)
        & (F.col("b.n_shingles") * (2 * t4 - 1) <= F.col("a.n_shingles") * 20000)
    )
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))).cast("long")
    union = (F.col("a.n_shingles") + F.col("b.n_shingles")).cast("long") - inter
    scored = sized.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        inter.alias("__i"),
        union.alias("__u"),
    ).withColumn("__jacc", F.expr("(20000 * __i + __u) DIV (2 * __u)"))
    return scored.where(F.col("__jacc") >= int(threshold * 10000)).select(
        "doc_a", "doc_b", (F.col("__jacc") / 10000.0).alias("jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    k: int = 3,
    num_hashes: int = 8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(doc_id, h0..h{n-1}) MinHash signature columns, md5-derived.

    Hash family: seed-prefixed md5 split into four 8-hex-char chunks —
    ``h[4·seed + j] = min over shingles of md5(seed||':'||s)[8j..8j+8)``.
    One md5 pass per seed (¼ the hashing of a per-hash md5) and still
    engine-portable. All computed in a single no-shuffle projection.
    ``max_shingle_df`` (default off) drops corpus-hot shingles first —
    see ``capped_shingle_profiles``.
    """
    assert num_hashes <= len(MINHASH_AB), "extend MINHASH_AB for more hashes"
    p = capped_shingle_profiles(docs, k, max_shingle_df)

    # closure factory: F.transform treats a 2-arg lambda as
    # (element, index), so loop variables must be captured by closure,
    # never by a second default parameter
    def sig_col(i: int):
        a, b = MINHASH_AB[i]
        return F.array_min(
            F.transform(F.col("sh"), lambda x: (x * a + b) % HASH_P)
        ).alias(f"h{i}")

    return p.select("doc_id", *[sig_col(i) for i in range(num_hashes)])


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash banding: docs agreeing on
    ALL hashes of any band are candidates (standard LSH recall/precision
    trade; verify with ngram_jaccard_pairs for the filtered version).
    ``max_shingle_df`` (default off) is the 100 TB hot-bucket guard —
    see ``capped_shingle_profiles``."""
    sig = minhash_signatures(docs, k, num_hashes, max_shingle_df)
    return lsh_band_pairs(sig, num_hashes, band_size)


def lsh_bands(sig: DataFrame, num_hashes: int, band_size: int) -> DataFrame:
    """(doc_id, band, band_key): the banded LSH index rows for a
    signature table — the per-doc map-only explosion shared by the
    batch pair expansion (``lsh_band_pairs``) and the streaming ingest
    twin (``streaming.jobs.run_streaming_minhash_lsh``), where this
    table IS the maintained index state (append-only: n_bands rows per
    doc, fixed size, the production LSH-at-ingest shape)."""
    n_bands = num_hashes // band_size
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|", *[F.col(f"h{b * band_size + j}") for j in range(band_size)]
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def lsh_band_pairs(sig: DataFrame, num_hashes: int, band_size: int) -> DataFrame:
    """Banding + bucket-local pair expansion over an ALREADY-computed
    signature table (doc_id, h0..h{n-1}) — split out so a band-size
    sweep (``dedup_lsh_band_sweep``) pays the corpus-sized signature
    pipeline ONCE (checkpoint it) and only the cheap band explosion
    varies per configuration."""
    return lsh_bucket_pairs(lsh_bands(sig, num_hashes, band_size))


def lsh_bucket_pairs(bands: DataFrame) -> DataFrame:
    """Bucket-local pair expansion over an ALREADY-banded index table
    (doc_id, band, band_key) — the second split point: the streaming
    ingest twin checkpoints its per-batch band rows (they also append
    into the index state) and derives within-batch pairs from the
    SAME materialized table, so the signature pipeline runs once per
    micro-batch, not once per consumer."""
    # bucket-local pair expansion (signature pipeline runs ONCE; a
    # band-key self-join would recompute it per join branch)
    packed = (
        bands.groupBy("band", "band_key")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .where(F.size("ds") >= 2)
    )
    n = F.size("ds")
    pair_idx = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n), lambda j: F.struct(i.alias("i"), j.alias("j"))
            ),
        )
    )
    return (
        packed.select(F.col("ds"), F.explode(pair_idx).alias("ij"))
        .select(
            F.element_at(F.col("ds"), F.col("ij.i").cast("int")).alias("doc_a"),
            F.element_at(F.col("ds"), F.col("ij.j").cast("int")).alias("doc_b"),
        )
        .distinct()
    )


def minhash_verified_pairs(
    docs: DataFrame,
    k: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """The production dedup pipeline: MinHash-LSH candidate generation
    (recall) followed by exact Jaccard verification (100% precision).

    Candidates join back to the shingle profiles; at 100 TB the
    profiles are persisted once (columnar) and both stages read them —
    the candidate set is O(n·bands), so the verify join is tiny
    relative to the corpus. ``max_shingle_df`` caps candidate
    generation only; verification always scores UNCAPPED shingle sets,
    so a cap can lower recall but never changes a reported Jaccard."""
    cand = minhash_lsh_pairs(docs, k, num_hashes, band_size, max_shingle_df)
    prof = shingle_profiles(docs, k).select("doc_id", "sh", "n_shingles")
    return jaccard_verify_pairs(cand, prof, threshold)


def jaccard_verify_pairs(
    cand: DataFrame, prof: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs
    against a (doc_id, sh, n_shingles) profile table — the scoring tail
    of ``minhash_verified_pairs``, split out so the streaming
    connected-components twin can verify arrival-time candidates
    against its LANDED profile state with the identical integer
    half-up arithmetic (a pair's Jaccard depends only on the two
    docs' shingle sets, so batch and streaming verdicts cannot
    diverge)."""
    a = prof.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), F.col("n_shingles").alias("n_a")
    )
    b = prof.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), F.col("n_shingles").alias("n_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("long")
    union = (F.col("n_a") + F.col("n_b")).cast("long") - inter
    scored = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", inter.alias("__i"), union.alias("__u"))
    )
    # aggregation barrier: (doc_a, doc_b) is unique so first() is a
    # semantic no-op, but it stops Catalyst pushing the Jaccard filter
    # down INTO the broadcast join as a non-equi condition — that
    # pushdown inlined array_intersect into the join stage and made it
    # ~30x slower at sf0.1 (40s -> 1.3s with the barrier)
    scored = scored.groupBy("doc_a", "doc_b").agg(
        F.first("__i").alias("__i"), F.first("__u").alias("__u")
    )
    scored = scored.withColumn("__jacc", F.expr("(20000 * __i + __u) DIV (2 * __u)"))
    return scored.where(F.col("__jacc") >= int(threshold * 10000)).select(
        "doc_a", "doc_b", (F.col("__jacc") / 10000.0).alias("jaccard")
    )


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """(doc_id, simhash BIGINT): per-bit majority vote over md5-derived
    32-bit token hashes (token multiplicity counts, like classic
    simhash term weighting).

    MAP-ONLY: the bit-count vector folds over the per-doc token-hash
    array in one ``aggregate`` pass — no explode, no shuffle. The
    earlier explode+groupBy formulation shuffled one row per TOKEN
    (at 100 TB, the whole corpus re-keyed by doc_id); this one shuffles
    nothing and was 2× faster at sf0.1 even locally.
    """
    assert bits == 32, "simhash is fixed at 32 bits (md5-derived token hashes)"
    th = _token_hashes()
    # cheap token-count filter BEFORE the projection (the
    # shingle_hash_sequence rule, :103-109): a post-hoc size(th) filter
    # is pushed below the Project and re-evaluates the md5 transform in
    # the Filter — one wasted full pass per row
    d = docs.where(F.size(tokens(F.col("text"))) >= 1).select("doc_id", th.alias("th"))
    return simhash_fold(d)


def simhash_fold(d: DataFrame) -> DataFrame:
    """(doc_id, simhash BIGINT) from any (doc_id, th array<long>) hash
    stream — the per-bit-majority fold shared by the token simhash and
    the byte-gram payload simhash (multimodal)."""
    bitsums = F.expr(
        "aggregate(th, array_repeat(0, 32), (acc, x) -> "
        "zip_with(acc, sequence(0, 31), (a, i) -> "
        "a + CASE WHEN (x >> i) & 1 = 1 THEN 1 ELSE -1 END))"
    )
    sim = F.expr(
        "aggregate(zip_with(bs, sequence(0, 31), (b, i) -> "
        "CASE WHEN b > 0 THEN CAST(pow(2, i) AS BIGINT) ELSE CAST(0 AS BIGINT) END), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    # coalesce-with-literal makes simhash provably NON-NULLABLE, so the
    # downstream join's inferred isnotnull(chunk_val) constraint folds to
    # true instead of being pushed below the Projects with the WHOLE
    # simhash expression substituted into a per-row Filter (locked by
    # tests/test_plans.py::test_no_filter_inlines_the_tokenizer)
    sim_nn = F.coalesce(sim, F.lit(0).cast("bigint"))
    return d.select("doc_id", bitsums.alias("bs")).select(
        "doc_id", sim_nn.alias("simhash")
    )


def simhash_candidate_pairs(docs: DataFrame, bits: int = 32, chunks: int = 4) -> DataFrame:
    """Pairs agreeing on ≥1 of `chunks` simhash chunks (pigeonhole:
    hamming ≤ chunks-1 is guaranteed found), with exact hamming."""
    return simhash_pairs_from_signatures(simhash(docs, bits), bits, chunks)


def simhash_pairs_from_signatures(
    sh: DataFrame, bits: int = 32, chunks: int = 4
) -> DataFrame:
    """The chunk-pigeonhole pairing over any (doc_id, simhash BIGINT)
    signature table — shared by the token simhash (dedup_simhash) and
    the byte-gram payload simhash (multimodal_payload_simhash)."""
    width = bits // chunks
    mask = (1 << width) - 1
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright("simhash", c * width).bitwiseAND(F.lit(mask)).alias("chunk_val"),
            )
            for c in range(chunks)
        ]
    )
    parts = sh.select("doc_id", "simhash", F.explode(chunk_structs).alias("c")).select(
        "doc_id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.chunk_val").alias("chunk_val")
    )
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


def srp_signs(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 random-hyperplane matrix (LCG bits — identical
    constants reproduce it in the SQL oracle, no RNG library involved)."""
    x = 123_456_789
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row: list[float] = []
        for _ in range(dim):
            x = (1_103_515_245 * x + 12_345) % (1 << 31)
            row.append(1.0 if (x >> 16) & 1 else -1.0)
        planes.append(row)
    return planes


def embedding_srp_lsh_pairs(
    emb: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 16,
    band_bits: int = 4,
) -> DataFrame:
    """Embedding near-dup at scale: sign-random-projection LSH.

    Each vector gets an ``n_planes``-bit signature (sign of the dot
    product with fixed ±1 hyperplanes — P[bits agree] = 1 - θ/π), bits
    band into ``n_planes/band_bits`` buckets, candidates share a band,
    and an EXACT cosine ≥ threshold filter keeps precision at 100%.
    Signatures are one whole-stage-codegen'd projection (n_planes·dim
    fused multiply-adds per row, no shuffle); the pair space is bucket-
    local, never O(n²). Trades recall (borderline pairs may land in no
    shared band) for a corpus-linear plan — the 100 TB path next to
    the exact-quadratic ``embedding_cosine_pairs`` baseline.
    """
    planes = srp_signs(n_planes, dim)
    bits = [
        (dot(F.col("embedding"), F.array(*[F.lit(s) for s in row])) >= 0).cast("int")
        for row in planes
    ]
    n_bands = n_planes // band_bits
    band_key = [
        sum(bits[b * band_bits + j] * (1 << j) for j in range(band_bits))
        for b in range(n_bands)
    ]
    blocks = F.array(
        *[F.concat_ws("|", F.lit(b), band_key[b].cast("string")) for b in range(n_bands)]
    )
    profiles = emb.select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("e"),
        l2_norm(F.col("embedding")).alias("nrm"),
        F.explode(blocks).alias("block"),
    )
    pairs = _block_pairs(profiles, ["e", "nrm"])
    return (
        pairs.select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.round(
                dot(F.col("a.e"), F.col("b.e")) / (F.col("a.nrm") * F.col("b.nrm")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
    )


def embedding_cosine_pairs(emb: DataFrame, threshold: float) -> DataFrame:
    """Exact pairwise cosine near-dup over an embedding table.

    Exact O(n²) form — correct at any n but quadratic; the scale path
    buckets first (similarity.py) and only cross-joins within buckets.
    """
    # norms are computed ONCE per row before the pair join (identical
    # doubles to a per-pair cosine — same inputs, same operation order —
    # at 1/3 the per-pair FLOPs, which dominates an O(n²) plan)
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("e_a"),
        l2_norm(F.col("embedding")).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("e_b"),
        l2_norm(F.col("embedding")).alias("nb"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("e_a"), F.col("e_b")) / (F.col("na") * F.col("nb")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 15
) -> DataFrame:
    """(id, comp) connected components of an undirected pair graph by
    iterative min-label propagation: every node repeatedly adopts the
    smallest label among itself and its neighbors until fixpoint.
    comp = min node id in the component — the canonical representative
    the dedup keep/drop decision hangs off.

    This is the missing last stage of every pairwise dedup operator
    here: near-dup PAIRS don't partition a corpus (A~B, B~C but A≁C);
    components do. The reference has no analogue (its reduce is
    single-key); this is a genuinely iterative multi-pass op, so it
    can't be one SQL query — each round is a shuffle-scalable
    join+groupBy, and ``localCheckpoint`` truncates the lineage so the
    plan doesn't grow exponentially across rounds.

    Scale (100 TB): the edge set of a near-dup graph is O(n·dup_rate),
    orders smaller than the corpus; simple propagation needs
    O(component diameter) rounds, which for dedup clusters (dense,
    tiny) is 2-3. For adversarial long-chain graphs switch to
    large-star/small-star (Kiveris et al.), same per-round primitives,
    O(log²n) rounds. The early-exit check is one count() per round —
    driver-side control flow, never driver-side data.
    """
    # the edge list is read by EVERY round's join and every convergence
    # count — without this checkpoint the caller's whole pair-generation
    # subtree (LSH banding, blocked Levenshtein, within-cluster cosine…)
    # re-executes per round (measured on dedup_semdedup at sf0.1:
    # 13.3 s -> 4.5 s build). The edge set is O(n·dup_rate) by the
    # operator's contract, so materializing it is the SMALL-intermediate
    # checkpoint, not a corpus write.
    bidir = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .localCheckpoint(eager=True)
    )
    labels = (
        bidir.select(F.col("s").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        msgs = bidir.join(labels, bidir["s"] == labels["id"]).select(
            F.col("d").alias("id"), F.col("comp")
        )
        new_labels = (
            labels.select("id", "comp")
            .union(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def cc_fold(prev_labels: DataFrame, edges: DataFrame) -> DataFrame:
    """Fold a batch of new undirected edges (doc_a, doc_b) into a
    maintained min-id component partition (id, comp) COMPONENT-LOCALLY:
    only components touched by a new edge endpoint re-solve — their
    landed labels re-enter ``connected_components`` as star edges
    (id -> comp), which preserve node sets, connectivity, and min-id
    canonicality — while untouched components pass through unread.
    CC(star(CC(E1)) ∪ E2) = CC(E1 ∪ E2), so folding any chunking of an
    edge stream from an empty partition converges to the one-shot CC
    labels exactly (tests/test_properties.py pins this against a
    union-find ground truth over random edge streams and chunkings;
    the streaming twin ``run_streaming_connected_components`` is this
    fold per micro-batch).

    Scale (100 TB): per fold the work is the touched components' star
    edges plus the new edges — dedup clusters are tiny and dense, so
    the re-solved subgraph is a few edges per new pair, never the
    corpus and never the untouched partition."""
    touched = (
        edges.select(F.col("doc_a").alias("id"))
        .union(edges.select(F.col("doc_b").alias("id")))
        .distinct()
    )
    touched_comps = prev_labels.join(touched, "id").select("comp").distinct()
    sub = prev_labels.join(touched_comps, "comp").select("id", "comp")
    untouched = prev_labels.join(touched_comps, "comp", "left_anti")
    star = sub.where(F.col("id") != F.col("comp")).select(
        F.col("id").alias("doc_a"), F.col("comp").alias("doc_b")
    )
    resolved = connected_components(
        star.unionByName(edges.select("doc_a", "doc_b")),
        src="doc_a",
        dst="doc_b",
    )
    return untouched.select("id", "comp").unionByName(
        resolved.select("id", "comp")
    )


def incremental_dedup(
    history: DataFrame, batch: DataFrame
) -> DataFrame:
    """Incremental exact dedup: classify each BATCH doc against the
    historical fingerprint store and its own batch — the production
    shape where yesterday's 100 TB corpus is never re-read, only its
    (md5, keep_id) fingerprint table.

    Verdict per batch doc (priority order):
      ``dup_of_history`` — canonical hash already in the store;
      ``dup_in_batch``   — first seen in this batch, but a smaller
                           doc_id in the SAME batch holds the hash;
      ``new``            — this doc owns the hash (min id of its
                           intra-batch group, unseen in history).

    Plan: history collapses to one row per hash (aggregate, bounded by
    distinct content); the batch left-joins it on the hash and takes a
    min-id window within the batch group. Two key shuffles, both on
    the md5 — no text moves after fingerprinting. 100 TB: the store is
    the only historical state (fingerprints, not documents), append-
    only, and bucketed by hash so the daily batch join is co-located.
    Ref parity: generalizes E6 (exact dedup) to the incremental-ingest
    contract; reference has no analogue (batch-only, SURVEY §2.3).
    """
    from pyspark.sql import Window

    hist_fp = (
        history.select(portable_fingerprint(F.col("text")).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.lit(1).alias("__seen"))
    )
    b = batch.select(
        "doc_id", portable_fingerprint(F.col("text")).alias("text_md5")
    )
    w = Window.partitionBy("text_md5")
    b = b.withColumn("batch_keep", F.min("doc_id").over(w))
    joined = b.join(hist_fp, "text_md5", "left")
    verdict = (
        F.when(F.col("__seen").isNotNull(), "dup_of_history")
        .when(F.col("doc_id") != F.col("batch_keep"), "dup_in_batch")
        .otherwise("new")
    )
    return joined.select(
        "doc_id", "text_md5", verdict.alias("verdict"), "batch_keep"
    )


def blocked_levenshtein_pairs(
    names: DataFrame, name_col: str, block_col: str, max_dist: int
) -> DataFrame:
    """Candidate fuzzy-match pairs: block on ``block_col`` (the equi-join
    key that keeps the pair space per-block instead of O(n²)), verify
    with exact Levenshtein ≤ ``max_dist`` inside each block. Returns
    (name_a, name_b, dist) with name_a < name_b. The blocking-then-
    verify shape shared by every dedup operator here — edit distance is
    just a different verifier. Shared by ``fuzzy_name_pairs`` and
    ``entity_resolution_clusters``."""
    a = names.select(F.col(name_col).alias("name_a"), F.col(block_col).alias("__blk"))
    b = names.select(F.col(name_col).alias("name_b"), F.col(block_col).alias("__blk"))
    return (
        a.join(b, "__blk")
        .where(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a", "name_b", F.levenshtein("name_a", "name_b").alias("dist")
        )
        .where(F.col("dist") <= max_dist)
    )


def prefix_filter_jaccard_pairs(
    docs: DataFrame, k: int = 3, threshold: float = 0.8
) -> DataFrame:
    """EXACT k-gram-shingle Jaccard self-join via prefix filtering —
    the PPJoin/AllPairs candidate-generation strategy (Bayardo et al.
    WWW'07; Xiao et al. WWW'08), the third candidate family here
    beside min-shingle blocking and MinHash-LSH, and the only one with
    a completeness THEOREM instead of a probability: J(a,b) ≥ τ
    implies |a∩b| ≥ ceil(τ·max(n_a, n_b)), so under any fixed global
    element order, a's prefix (its first n_a − ceil(τ·n_a) + 1
    shingles) and b's prefix must share a shingle. Posting ONLY prefix
    shingles therefore generates a candidate superset — zero false
    negatives — and the exact verify makes the join exact: the result
    is a provable SUPERSET of ngram_jaccard_pairs' (same similarity,
    same acceptance; the blocked variant loses block-missed pairs —
    tests/test_dedup_truth_bound.py asserts the containment). The
    global order is ascending document frequency (ties by shingle id),
    which is also the performance lever: prefixes consist of each
    doc's RAREST shingles, so posting lists stay short and no
    boilerplate shingle ever becomes a hot key.

    The similarity domain is k-gram SHINGLES, not unigram token sets,
    deliberately: order-encoding shingles are discriminative enough
    that τ-similar pairs are genuinely rare, whereas unigram sets on
    short template-heavy docs make the TRUE result itself quadratic
    (measured at sf0.1: 3M token-set pairs vs 256 shingle pairs) — no
    candidate strategy can fix an output that big.

    Shape: one explode for the df table (shingle-vocab-sized), a df
    join + one (doc_id)-window for prefix positions, a prefix-postings
    self-join, and a verify join on the candidate ids only. 100 TB:
    every stage is keyed and partial-aggregatable; candidate volume is
    bounded by posting-list lengths, which the rare-first order
    minimizes — the df-cap knob LSH needs (max_shingle_df) is built
    into the ordering itself.

    Same half-up integer acceptance as ngram_jaccard_pairs; returns
    (doc_a, doc_b, jaccard).
    """
    from pyspark.sql import Window

    t4 = int(threshold * 10000)
    tt = (
        shingle_profiles(docs, k)
        .select("doc_id", F.col("sh").alias("ts"), F.col("n_shingles").alias("n"))
        # the shingle-set table feeds the df pass, the prefix pass, and
        # BOTH verify sides: checkpoint so the documents scan runs once
        .localCheckpoint(eager=True)
    )
    ex = tt.select("doc_id", "n", F.explode("ts").alias("tok"))
    dfreq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("dft"))
    pos_w = Window.partitionBy("doc_id").orderBy("dft", "tok")
    # prefix length n − ceil(τ·n) + 1, ceil in exact integer arithmetic
    prefix = (
        ex.join(dfreq, "tok")
        .withColumn("pos", F.row_number().over(pos_w))
        .where(F.col("pos") <= F.expr(f"n - (({t4} * n + 9999) DIV 10000) + 1"))
        .select("doc_id", "tok")
    )
    cand = (
        prefix.select(F.col("doc_id").alias("doc_a"), "tok")
        .join(prefix.select(F.col("doc_id").alias("doc_b"), "tok"), "tok")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    a = tt.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"), F.col("n").alias("n_a"))
    b = tt.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"), F.col("n").alias("n_b"))
    inter = F.size(F.array_intersect("ts_a", "ts_b")).cast("long")
    union = (F.col("n_a") + F.col("n_b")).cast("long") - inter
    scored = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", inter.alias("__i"), union.alias("__u"))
        .withColumn("__jacc", F.expr("(20000 * __i + __u) DIV (2 * __u)"))
    )
    return scored.where(F.col("__jacc") >= t4).select(
        "doc_a", "doc_b", (F.col("__jacc") / 10000.0).alias("jaccard")
    )


def duplicate_span_excision(
    docs: DataFrame,
    n: int = 5,
    min_count: int = 2,
    min_span_tokens: int = 0,
    hash_grams: bool = False,
) -> DataFrame:
    """Corpus-level duplicate-SPAN removal (the ExactSubstr dedup of
    Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", at n-gram granularity): any n-token sequence that
    occurs >= ``min_count`` times ANYWHERE in the corpus (other docs
    or the same doc) marks its token interval for excision; per doc,
    overlapping/adjacent marked intervals merge into maximal spans
    (gaps-and-islands) and the retained text is reconstructed from the
    surviving token positions. Unlike whole-doc near-dedup this keeps
    the unique remainder of a partially-duplicated document instead of
    dropping or keeping it wholesale — the difference between losing a
    page because it embeds a boilerplate footer and just cutting the
    footer.

    Returns one row per document:
      (doc_id, n_tokens, n_spans, n_tokens_removed, n_tokens_kept,
       removed_bp, retained_md5)
    where removed_bp is half-up integer basis points and retained_md5
    is md5 of the space-joined retained tokens (clean docs get the
    md5 of their space-joined full token stream, so the column is
    defined — and whitespace-normalized — for every row).

    ``min_span_tokens`` > 0 restores Lee et al.'s length floor
    (they excise duplicated substrings of >= 50 tokens): marked n-gram
    hits merge into maximal islands FIRST, then islands shorter than
    the floor are dropped (one filter on the merged span table), so a
    lone boilerplate n-gram survives but a long duplicated passage is
    cut. Approximation vs the paper: two distinct short duplicated
    substrings that overlap or touch merge into one island and are
    length-tested TOGETHER — the granularity cost of marking via
    n-grams rather than a suffix array. That caveat VANISHES when the
    floor is encoded in the gram size instead (set n = L,
    min_span_tokens = 0): "position p lies in some corpus-duplicated
    substring of length >= L" is EXACTLY "p is covered by some
    duplicated L-gram" — any duplicated substring of length m >= L
    contains, around each of its positions, a length-L window that is
    itself duplicated (substrings of duplicated strings are
    duplicated), and conversely a duplicated L-gram IS a duplicated
    substring of length L. So n = L computes Lee et al.'s
    suffix-array excision-set semantics with no suffix array and no
    island-level test (`dedup_span_excision_exact20`).

    ``hash_grams=True`` replaces the gram STRING with its md5 as the
    census/join key — at L-gram sizes the raw key is ~6L bytes and the
    hash a fixed 32, so the count-then-filter shuffle carries 10x less
    at L=50 (the standard practice in distributed ExactSubstr
    implementations; a 128-bit collision inside one corpus is
    ~2^-64-improbable, and the hash never reaches the output).

    Plan shape (the classic count-then-filter two-pass, like C4
    boilerplate): pass 1 counts positional n-gram occurrences (one
    linear shuffle, partial agg absorbs hot boilerplate grams
    map-side); pass 2 joins the gram stream back against the
    >= min_count tail. Honest accounting (ADVICE r6): the gram
    posexplode subtree evaluates TWICE inside the span-checkpoint
    action — once under the count aggregate and once as the join
    probe (inherent to count-then-filter; the exchanges differ, so
    Catalyst cannot reuse them) — and ``documents`` is additionally
    scanned by the tokpos and lens map-only projections, ~3 fact
    scans total. Both are deliberate: checkpointing the corpus-sized
    gram or token stream to avoid a rescan would write more bytes
    than the scan reads, and materializing the (smaller) duplicated-
    gram set was tried and REJECTED — a LogicalRDD checkpoint drops
    the aggregate's distinct-key statistics, inflating the merged-
    span size estimate ~10^4x (24.6 KiB -> 272.9 MiB at sf0.001) and
    flipping the three downstream per/rebuilt/semi joins from
    broadcast to sort-merge. ONE bounded per-doc window pair does the
    interval merge (partition size = per-doc hit count <= token
    count). Reconstruction deliberately runs ONLY on docs that have
    surviving spans (semi-join): at 100 TB the overwhelmingly common
    clean doc pays one map-side md5 and never re-explodes. The three
    consumers of the merged span table (stats, covered-position
    explode, dirty semi-join) share one localCheckpoint so the gram
    pipeline runs once per pass, not once per consumer.
    """
    from pyspark.sql import Window

    from ds_mapreduce_spark.functions.text import tokens

    base = docs.select("doc_id", tokens(F.col("text")).alias("toks"))

    def gram(i):
        g = F.concat_ws(" ", F.slice(F.col("toks"), i, n))
        return F.md5(g) if hash_grams else g

    grams = F.transform(F.sequence(F.lit(1), F.size("toks") - (n - 1)), gram)
    occ = (
        base.where(F.size("toks") >= n)
        .select("doc_id", F.posexplode(grams).alias("p0", "g"))
        .select("doc_id", (F.col("p0") + 1).alias("s"), "g")
    )
    dup = (
        occ.groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
        .select("g")
    )
    hits = occ.join(dup, "g").select("doc_id", "s", (F.col("s") + (n - 1)).alias("e"))
    w_prev = Window.partitionBy("doc_id").orderBy("s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_run = Window.partitionBy("doc_id").orderBy("s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # new island iff this hit starts past every previous end + 1
    # (adjacent spans merge: contiguous removed text is ONE cut)
    isl = hits.withColumn(
        "__ni",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)) + 1, 1
        ).otherwise(0),
    ).withColumn("__island", F.sum("__ni").over(w_run))
    spans = isl.groupBy("doc_id", "__island").agg(
        F.min("s").alias("ss"), F.max("e").alias("se")
    )
    if min_span_tokens > 0:
        # length floor AFTER the merge (Lee et al.'s >=50-token rule):
        # tested on maximal islands, so overlapping short hits that
        # chain into a long duplicated passage still get excised
        spans = spans.where(
            F.col("se") - F.col("ss") + 1 >= F.lit(min_span_tokens)
        )
    spans = spans.localCheckpoint(eager=True)
    per = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.col("se") - F.col("ss") + 1).cast("bigint").alias("n_tokens_removed"),
    )
    covered = spans.select("doc_id", F.explode(F.sequence("ss", "se")).alias("p"))
    tokpos = (
        base.join(per.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", F.posexplode("toks").alias("p0", "tok"))
        .select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    )
    rebuilt = (
        tokpos.join(covered, ["doc_id", "p"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("p", "tok"))),
                        lambda x: x["tok"],
                    ),
                )
            ).alias("retained_md5")
        )
    )
    lens = base.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "toks")).alias("__clean_md5"),
    )
    out = (
        lens.join(per, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("n_tokens_removed", F.lit(0))
            .cast("bigint")
            .alias("n_tokens_removed"),
            (
                F.col("n_tokens") - F.coalesce("n_tokens_removed", F.lit(0))
            ).cast("bigint").alias("n_tokens_kept"),
            F.when(F.col("n_tokens") == 0, F.lit(0).cast("bigint"))
            .otherwise(
                F.expr(
                    "(20000 * coalesce(n_tokens_removed, 0) + n_tokens)"
                    " DIV (2 * n_tokens)"
                )
            )
            .alias("removed_bp"),
            # a fully-covered doc has no kept rows -> md5 of ''
            F.when(F.col("n_spans").isNull(), F.col("__clean_md5"))
            .otherwise(F.coalesce("retained_md5", F.md5(F.lit(""))))
            .alias("retained_md5"),
        )
    )
    return out


def winnow_flagged_docs(docs: DataFrame, L: int = 20, k: int = 3) -> DataFrame:
    """The winnowing SCREEN itself: distinct doc_ids sharing >= 1
    winnowing fingerprint (window w = L - k + 1) with at least one
    other document. `winnowing_fingerprints` emits distinct (doc, fp)
    rows, so the fp census count equals the number of distinct docs
    carrying the fp and >= 2 means a genuine cross-doc collision.

    Shared between the batch eval rows (`winnow_screen_eval`,
    `winnow_screen_eval_entropic` — where truth joins against it) and
    the streaming ingest twin (`run_streaming_winnow_screen`, which
    reproduces the same set incrementally against an accumulated fp
    index). 100 TB: one census shuffle of 8-byte fps at winnowing's
    ~2/(w+1) density, one AQE-broadcast semi join, one distinct."""
    w = L - k + 1
    fps = winnowing_fingerprints(docs, k=k, w=w)
    shared = (
        fps.groupBy("fp").agg(F.count(F.lit(1)).alias("c")).where(F.col("c") >= 2)
    )
    return (
        fps.join(shared.select("fp"), "fp", "left_semi").select("doc_id").distinct()
    )


def winnow_screen_eval(docs: DataFrame, L: int = 20, k: int = 3) -> DataFrame:
    """Evaluate a winnowing-fingerprint PRESCREEN against the exact-L
    ExactSubstr touchstone (VERDICT r8's suggested comparison row):
    can the cheap content-defined screen decide WHICH docs to hand the
    expensive exact excision (``duplicate_span_excision`` with n = L)?

    Truth: docs containing >= 1 CROSS-doc duplicated L-gram — i.e.
    sharing some L-token substring with at least one OTHER document
    (the distinct-doc form of exact-L's census; within-doc repeats
    are out of scope for a cross-doc screen and excluded from BOTH
    sides). Screen: docs sharing >= 1 winnowing fingerprint (window
    w = L - k + 1 over the k-gram hash stream) with another doc.

    The Schleimer/Wilkerson/Aiken guarantee makes this the canonical
    pairing: any cross-doc match of length >= w + k - 1 = L tokens
    contains an identical w-wide hash window in both docs, whose
    minimum is selected as a fingerprint in both — so recall is
    EXACTLY 10000 bp by theorem (tests/test_winnow_screen.py pins it;
    a screen miss would be an implementation bug, not tuning), and
    precision_bp is the measured quantity: the fraction of flagged
    docs that actually carry a full L-token duplicate (the rest
    share only shorter passages whose window minima happened to
    collide). One summary row:
      (n_docs, n_truth, n_flagged, tp, fp, fn, precision_bp,
       recall_bp)
    over the eval population of docs with >= L tokens.

    100 TB: the screen is the cheap pass — fingerprints are ~2/(w+1)
    of gram positions (winnowing's density bound), the census
    shuffles fixed 8-byte fps instead of exact-L's 32-char md5 grams
    (~4x less shuffle traffic at the same row count, before the
    density saving), and the flagged set (boilerplate-bearing docs, a
    small fraction of a crawl) is all the exact pass re-reads —
    count-then-filter twice, but the second pass over a corpus
    subset. Both censuses partial-aggregate map-side; no collects."""
    from ds_mapreduce_spark.functions.text import tokens

    base = docs.select("doc_id", tokens(F.col("text")).alias("toks")).where(
        F.size("toks") >= L
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - (L - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i, L))),
        )
    )
    occ = base.select("doc_id", F.explode(grams).alias("g"))
    dup_g = (  # rows are distinct (doc, gram): count == distinct docs
        occ.groupBy("g").agg(F.count(F.lit(1)).alias("c")).where(F.col("c") >= 2)
    )
    truth = occ.join(dup_g.select("g"), "g", "left_semi").select("doc_id").distinct()
    flagged = winnow_flagged_docs(docs, L=L, k=k)
    ev = (
        base.select("doc_id")
        .join(truth.withColumn("in_truth", F.lit(True)), "doc_id", "left")
        .join(flagged.withColumn("in_screen", F.lit(True)), "doc_id", "left")
        .select(
            F.coalesce("in_truth", F.lit(False)).alias("in_truth"),
            F.coalesce("in_screen", F.lit(False)).alias("in_screen"),
        )
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return (
        ev.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("in_truth"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_truth"),
            F.sum(F.when(F.col("in_screen"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_flagged"),
            F.sum(F.when(F.col("in_truth") & F.col("in_screen"), 1).otherwise(0))
            .cast("bigint")
            .alias("tp"),
            F.sum(F.when(F.col("in_screen") & ~F.col("in_truth"), 1).otherwise(0))
            .cast("bigint")
            .alias("fp"),
            F.sum(F.when(F.col("in_truth") & ~F.col("in_screen"), 1).otherwise(0))
            .cast("bigint")
            .alias("fn"),
        )
        .select(
            "n_docs",
            "n_truth",
            "n_flagged",
            "tp",
            "fp",
            "fn",
            F.when(tp + fp == F.lit(0), F.lit(10000))
            .otherwise(F.expr("(20000 * tp + tp + fp) DIV (2 * (tp + fp))"))
            .cast("bigint")
            .alias("precision_bp"),
            F.when(tp + fn == F.lit(0), F.lit(10000))
            .otherwise(F.expr("(20000 * tp + tp + fn) DIV (2 * (tp + fn))"))
            .cast("bigint")
            .alias("recall_bp"),
        )
    )


def entropic_screen_corpus(docs: DataFrame) -> DataFrame:
    """Deterministic HIGH-ENTROPY eval corpus for the winnowing screen
    (VERDICT r9 #4): on the raw synthetic documents the trigram
    vocabulary is so small that k-gram fingerprints collide corpus-wide
    and ~99.7% of docs get flagged — the precision measurement cannot
    distinguish a good screen from ``lit(True)``. This derives, from
    doc_id alone (the documents scan prunes to one column), a corpus
    whose FILLER tokens are globally unique 8-hex md5 prefixes — no
    accidental collisions — with deterministically injected SHARED
    passages in four tiers:

      tier    doc_id%10  injected span          expected screen verdict
      truth   0,1        20 tokens (= L)        flagged — recall theorem
      near19  2          19 tokens (= L-1)      no 20-gram dup; flagged
                                                only if a window MINIMUM
                                                collides (the guarantee's
                                                one-sided edge)
      near12  3          12 tokens              shorter overlap — window
                                                minima mostly fall in
                                                unique territory
      clean   4-9        none                   flagged only by genuine
                                                hash accident

    Docs in the same (decade % 16) group share the same passage, so
    every tier has real cross-doc sharing; lengths 40-69 tokens mirror
    the base corpus. Precision/recall then measure SCREEN SELECTIVITY,
    not corpus degeneracy.

    The doc_id projection repartitions to the session's parallelism
    BEFORE the text synthesis — the partition-for-output-width rule
    from plans/multimodal_queries.py:_doc_ids_spread: the scan reads
    one 8-byte column (a single split at test scale), but each row
    expands into ~50 md5 tokens that then feed two gram/fingerprint
    censuses, so input-byte-sized tasks serialize all that CPU onto
    one core (measured in the r11 instrumented bench: 4.0 s with 1.8
    cores busy on a 32-core box; 3.4 s with every subtree at 7-14
    cores after — the residual is the two census aggregations, not
    serialization). The shuffle carries only the narrow ids."""
    spread = docs.select("doc_id").repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    return spread.select(
        "doc_id",
        F.expr(
            "CASE WHEN doc_id % 10 < 2 THEN 'truth' "
            "WHEN doc_id % 10 = 2 THEN 'near19' "
            "WHEN doc_id % 10 = 3 THEN 'near12' "
            "ELSE 'clean' END"
        ).alias("tier"),
        F.expr(
            """array_join(transform(sequence(0, 39 + CAST(doc_id % 30 AS INT)), j ->
  substr(md5(CASE
    WHEN doc_id % 10 < 2 AND j >= 7 AND j < 27
      THEN concat('T:', CAST((doc_id DIV 10) % 16 AS STRING), ':',
                  CAST(j - 7 AS STRING))
    WHEN doc_id % 10 = 2 AND j >= 7 AND j < 26
      THEN concat('N:', CAST((doc_id DIV 10) % 16 AS STRING), ':',
                  CAST(j - 7 AS STRING))
    WHEN doc_id % 10 = 3 AND j >= 7 AND j < 19
      THEN concat('M:', CAST((doc_id DIV 10) % 16 AS STRING), ':',
                  CAST(j - 7 AS STRING))
    ELSE concat('U:', CAST(doc_id AS STRING), ':', CAST(j AS STRING))
  END), 1, 8)), ' ')"""
        ).alias("text"),
    )


def winnow_screen_eval_entropic(
    docs: DataFrame, L: int = 20, k: int = 3
) -> DataFrame:
    """`winnow_screen_eval` over the entropic corpus, reported PER TIER
    (ROLLUP: one row per tier plus an 'all' summary). Same truth
    (cross-doc duplicated L-gram) and same screen (shared winnowing
    fingerprint, w = L - k + 1); the tier column turns the single
    precision number into a selectivity CURVE — full-length overlaps
    must all flag (theorem), L-1 overlaps sit on the guarantee's edge,
    short overlaps and clean docs measure how sharply the screen's
    false-positive rate falls off once token entropy is realistic.

    100 TB: identical plan shape to the base eval (two censuses +
    distinct flag sets + one bounded aggregate); the synth corpus adds
    one map-side projection, no extra shuffle.

    The synthesized corpus is localCheckpoint'd: five branches
    reference it (gram census x2, fingerprint census x2, the tier
    spine) and Catalyst re-executes an un-checkpointed subtree per
    branch — including its spread exchange, which the shuffle-budget
    lock would count five times. The corpus is ~n_docs x ~500 B
    (2.5 MB at sf0.1), far under the events_hourly_resample-style
    rollup this convention was set for; join strategies verified
    unchanged after adding it (4 BroadcastHashJoin / 0 SortMergeJoin
    before and after — the CLAUDE.md checkpoint-statistics check)."""
    from ds_mapreduce_spark.functions.text import tokens

    sdocs = entropic_screen_corpus(docs).localCheckpoint(eager=True)
    base = sdocs.select("doc_id", "tier", tokens(F.col("text")).alias("toks")).where(
        F.size("toks") >= L
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - (L - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i, L))),
        )
    )
    occ = base.select("doc_id", F.explode(grams).alias("g"))
    dup_g = (
        occ.groupBy("g").agg(F.count(F.lit(1)).alias("c")).where(F.col("c") >= 2)
    )
    truth = occ.join(dup_g.select("g"), "g", "left_semi").select("doc_id").distinct()
    flagged = winnow_flagged_docs(sdocs, L=L, k=k)
    ev = (
        base.select("doc_id", "tier")
        .join(truth.withColumn("in_truth", F.lit(True)), "doc_id", "left")
        .join(flagged.withColumn("in_screen", F.lit(True)), "doc_id", "left")
        .select(
            "tier",
            F.coalesce("in_truth", F.lit(False)).alias("in_truth"),
            F.coalesce("in_screen", F.lit(False)).alias("in_screen"),
        )
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return (
        ev.rollup("tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("in_truth"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_truth"),
            F.sum(F.when(F.col("in_screen"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_flagged"),
            F.sum(F.when(F.col("in_truth") & F.col("in_screen"), 1).otherwise(0))
            .cast("bigint")
            .alias("tp"),
            F.sum(F.when(F.col("in_screen") & ~F.col("in_truth"), 1).otherwise(0))
            .cast("bigint")
            .alias("fp"),
            F.sum(F.when(F.col("in_truth") & ~F.col("in_screen"), 1).otherwise(0))
            .cast("bigint")
            .alias("fn"),
        )
        .select(
            F.coalesce("tier", F.lit("all")).alias("tier"),
            "n_docs",
            "n_truth",
            "n_flagged",
            "tp",
            "fp",
            "fn",
            F.when(tp + fp == F.lit(0), F.lit(10000))
            .otherwise(F.expr("(20000 * tp + tp + fp) DIV (2 * (tp + fp))"))
            .cast("bigint")
            .alias("precision_bp"),
            F.when(tp + fn == F.lit(0), F.lit(10000))
            .otherwise(F.expr("(20000 * tp + tp + fn) DIV (2 * (tp + fn))"))
            .cast("bigint")
            .alias("recall_bp"),
        )
    )


def semdedup_verdicts(
    emb: DataFrame,
    k: int = 8,
    threshold: float = 0.45,
    quant: int = 10_000,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): semantic near-dup
    removal that bounds the pairwise-cosine blowup by CLUSTERING first —
    exact cosine is computed only WITHIN a cluster, so the pair space is
    O(sum cluster_size^2) = O(n^2 / k) instead of O(n^2), and at 100 TB
    k grows with the corpus so per-cluster size (and thus per-key join
    fan-out) stays bounded. The paper's recipe verbatim: (1) k-means
    cluster the embeddings, (2) within each cluster mark pairs with
    cosine >= threshold as semantic duplicates, (3) group duplicates
    (connected components — A~B~C must dedup together even when A!~C),
    (4) from each duplicate group KEEP the vector farthest from its
    cluster centroid (the paper keeps low-centroid-similarity examples:
    they carry the most marginal information) and remove the rest.

    Engine-exact determinism: cluster assignment uses the repo's
    integer-quantized squared-L2 convention (components floor(x*quant)
    BIGINT, distances exact integer folds — `kmeans_lloyd_refine`),
    seeded by the first k vec_ids — or, when ``centroids`` (cid, cv
    BIGINT-array) is passed, against TRAINED centroids (the r7
    paper-fidelity gap closed in r8: `operators.similarity.
    lloyd_centroids` runs the paper's actual k-means step and the
    verdicts hang off its output; see `dedup_semdedup_trained`);
    pair verification uses raw-float
    cosine ROUND(6) (the `dedup_embedding_cosine` convention, threshold
    chosen with >= 1e-4 margin); keep rule is (dist DESC, vec_id ASC)
    over exact integers — every tie deterministic, so a DuckDB oracle
    (argmin CTE + recursive-CTE closure) matches bit-for-bit.

    Plan shape: assignment is a pure MAP — the k centroids are packed
    into ONE broadcast row (collect_list into a 1-row aggregate, never
    the driver) and each vector folds an argmin over that array with
    F.least on (dist, cid) structs: zero exchanges, no row replication,
    no window (the crossJoin+row_number form costs a n·k-row shuffle
    and measured 2-3 s extra at sf0.1). The assignment is materialized
    ONCE (localCheckpoint here; a table write at 100 TB — production
    SemDeDup persists cluster ids, because three consumers read it:
    both pair-join sides and the final verdict join). The
    within-cluster self-join shuffles on cid; components run on the
    pair graph (O(n * dup_rate) edges); the keep window partitions by
    component — tiny groups, no skew.

    Returns one row per vector:
      (vec_id, cluster_id, comp_id, dist_to_centroid, is_kept)
    comp_id = min vec_id of the duplicate group (singletons: own id).
    """
    from pyspark.sql import Window

    v = emb.select(
        "vec_id",
        F.col("embedding").alias("e"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * quant).cast("bigint"),
        ).alias("qv"),
    )
    # the k centroids packed into ONE row: array<struct<cid, cv>>,
    # cid-sorted so the argmin fold's strict < keeps the lowest cid on
    # distance ties
    cent = (
        centroids.select("cid", "cv")
        if centroids is not None
        else v.where(F.col("vec_id") < k).select(
            F.col("vec_id").alias("cid"), F.col("qv").alias("cv")
        )
    )
    cent_packed = cent.agg(
        F.array_sort(F.collect_list(F.struct("cid", "cv"))).alias("cs")
    )
    zero = F.lit(0).cast("bigint")

    def cdist(c):
        return F.aggregate(
            F.zip_with(F.col("qv"), c["cv"], lambda a, b: (a - b) * (a - b)),
            zero,
            lambda acc, x: acc + x,
        )

    init = F.struct(
        F.lit(2**62).cast("bigint").alias("dist"),
        F.lit(-1).cast("bigint").alias("cid"),
    )
    argmin = F.aggregate(
        F.col("cs"),
        init,
        lambda acc, c: F.least(
            acc, F.struct(cdist(c).alias("dist"), c["cid"].alias("cid"))
        ),
    )
    asg = (
        v.crossJoin(F.broadcast(cent_packed))
        .select("vec_id", "e", argmin.alias("m"))
        .select(
            "vec_id", "e", F.col("m.cid").alias("cid"), F.col("m.dist").alias("dist")
        )
        .localCheckpoint(eager=True)
    )
    a = asg.select(
        "cid",
        F.col("vec_id").alias("id_a"),
        F.col("e").alias("e_a"),
        l2_norm(F.col("e")).alias("na"),
    )
    b = asg.select(
        "cid",
        F.col("vec_id").alias("id_b"),
        F.col("e").alias("e_b"),
        l2_norm(F.col("e")).alias("nb"),
    )
    pairs = (
        a.join(b, ["cid"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("e_a"), F.col("e_b")) / (F.col("na") * F.col("nb")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
    )
    labels = connected_components(pairs, src="id_a", dst="id_b")
    w_keep = Window.partitionBy("comp_id").orderBy(
        F.col("dist_to_centroid").desc(), F.col("vec_id")
    )
    return (
        asg.join(labels.withColumnRenamed("id", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.col("cid").alias("cluster_id"),
            F.coalesce("comp", "vec_id").cast("bigint").alias("comp_id"),
            F.col("dist").alias("dist_to_centroid"),
        )
        .withColumn("is_kept", F.row_number().over(w_keep) == 1)
    )
