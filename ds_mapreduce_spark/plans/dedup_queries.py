"""Dedup queries (E6/E7): exact, n-gram Jaccard, MinHash-LSH, SimHash,
embedding-cosine. Every one is oracle-checked — the md5-portable-hash
design makes even MinHash/SimHash reproducible in ANSI SQL.

Oracle CTE conventions mirror the Spark operators 1:1:
  toks  = whitespace tokens, empties dropped (reference tokenizer)
  sh    = DISTINCT 3-word shingles per doc
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ds_mapreduce_spark.operators.dedup import (
    embedding_cosine_pairs,
    embedding_srp_lsh_pairs,
    exact_dedup_groups,
    minhash_lsh_pairs,
    minhash_verified_pairs,
    ngram_jaccard_pairs,
    simhash_candidate_pairs,
    srp_signs,
)
from ds_mapreduce_spark.plans.registry import register
from ds_mapreduce_spark.sources.catalog import load_table

from ds_mapreduce_spark.operators.dedup import HASH_P, MINHASH_AB, SHINGLE_C  # noqa: E402

_TOKS_CTE = r"""
toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
)"""

# int-hash shingle profile mirroring operators/dedup.shingle_profiles:
# md5 once per TOKEN (first 8 hex chars as int), k consecutive token
# hashes combined arithmetically mod P — no shingle strings, no unnest
_COMBINE = " + ".join(
    f"(th[i+{j}] % {HASH_P}) * {c}" for j, c in enumerate(SHINGLE_C)
)
_PROFILE_CTE = (
    _TOKS_CTE
    + f""",
th AS (
  SELECT doc_id,
         list_transform(t, tok -> CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)) AS th
  FROM toks
),
prof AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(th) - 1),
                                      i -> ({_COMBINE}) % {HASH_P})) AS sh
  FROM th WHERE len(th) >= 3
),
profiles AS (
  SELECT doc_id, sh, len(sh) AS n_shingles, list_aggregate(sh, 'min') AS block
  FROM prof
)"""
)


@register(
    "dedup_exact",
    oracle=r"""
SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS text_md5,
       MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents GROUP BY 1
""",
    doc="E6 exact dedup: canonicalize (lower, collapse whitespace) → md5 → "
    "hash groupBy; representative = min doc_id. One shuffle of (hash, id).",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    oracle="WITH "
    + _PROFILE_CTE
    + """,
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS i,
         CAST(a.n_shingles + b.n_shingles - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS u
  FROM profiles a JOIN profiles b ON a.block = b.block AND a.doc_id < b.doc_id
),
scored AS (
  SELECT doc_a, doc_b, CAST((20000 * i + u) // (2 * u) AS BIGINT) AS jacc_scaled FROM cand
)
SELECT doc_a, doc_b, jacc_scaled / 10000.0 AS jaccard
FROM scored WHERE jacc_scaled >= 8000
""",
    doc="E7 near-dup by exact 3-gram Jaccard on min-md5-shingle-blocked "
    "candidate pairs (deterministic 1-band MinHash blocking + exact "
    "verify); Jaccard rounded half-up in integer arithmetic.",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), k=3, threshold=0.8)


def _minhash_oracle(num_hashes: int = 8, band_size: int = 2) -> str:
    sig_cols = ",\n         ".join(
        f"list_aggregate(list_transform(sh, x -> (x * {a} + {b}) % {HASH_P}), 'min') AS h{i}"
        for i, (a, b) in enumerate(MINHASH_AB[:num_hashes])
    )
    band_rows = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS band_key FROM sig".format(
            b=b,
            key=" || '|' || ".join(f"h{b * band_size + j}" for j in range(band_size)),
        )
        for b in range(num_hashes // band_size)
    )
    return (
        "WITH "
        + _PROFILE_CTE
        + f""",
sig AS (
  SELECT doc_id,
         {sig_cols}
  FROM profiles
),
bands AS (
  {band_rows}
)
SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
FROM bands x
JOIN bands y ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id
"""
    )


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_oracle(8, 2),
    doc="E7 MinHash-LSH candidate pairs: 8 LCG minhashes over int shingle "
    "hashes (one md5 per token total) → 4 bands of 2 → bucket-local pair "
    "expansion. O(n) shuffle rows, never O(n²); signatures computed in "
    "one no-shuffle projection.",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"), k=3, num_hashes=8, band_size=2)


def _minhash_verified_oracle(
    threshold: float = 0.8, num_hashes: int = 8, band_size: int = 2
) -> str:
    sig_cols, band_rows = _band_parts(num_hashes, band_size)
    thr = int(threshold * 10000)
    return (
        "WITH "
        + _verified_pair_ctes(sig_cols, band_rows)
        + f"""
SELECT doc_a, doc_b, CAST((20000 * i + u) // (2 * u) AS BIGINT) / 10000.0 AS jaccard
FROM scored WHERE (20000 * i + u) // (2 * u) >= {thr}
"""
    )


def _band_parts(num_hashes: int, band_size: int) -> tuple[str, str]:
    sig_cols = ",\n         ".join(
        f"list_aggregate(list_transform(sh, x -> (x * {a} + {b}) % {HASH_P}), 'min') AS h{i}"
        for i, (a, b) in enumerate(MINHASH_AB[:num_hashes])
    )
    band_rows = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS band_key FROM sig".format(
            b=b,
            key=" || '|' || ".join(f"h{b * band_size + j}" for j in range(band_size)),
        )
        for b in range(num_hashes // band_size)
    )
    return sig_cols, band_rows


def _verified_pair_ctes(sig_cols: str, band_rows: str) -> str:
    """CTE chain ending at ``scored`` (doc_a, doc_b, i, u) — the exact
    Jaccard-verified MinHash-LSH candidate pairs, shared by the pair
    query's oracle and the connected-components oracle."""
    return (
        _PROFILE_CTE
        + f""",
sig AS (
  SELECT doc_id,
         {sig_cols}
  FROM profiles
),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x
  JOIN bands y ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id
),
scored AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(pa.sh, pb.sh)) AS BIGINT) AS i,
         CAST(pa.n_shingles + pb.n_shingles - len(list_intersect(pa.sh, pb.sh)) AS BIGINT) AS u
  FROM cand c
  JOIN profiles pa ON pa.doc_id = c.doc_a
  JOIN profiles pb ON pb.doc_id = c.doc_b
)"""
    )


@register(
    "dedup_minhash_verified",
    oracle=_minhash_verified_oracle(0.8, 8, 2),
    doc="E7 end-to-end near-dedup pipeline: MinHash-LSH candidates "
    "(recall stage) joined back to shingle profiles for exact Jaccard "
    "verification (precision stage) — the production two-phase shape; "
    "candidate set is O(n·bands) so the verify join is corpus-"
    "independent in relative cost.",
)
def q_dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_verified_pairs(
        load_table(spark, sf_dir, "documents"), k=3, num_hashes=8, band_size=2, threshold=0.8
    )


def _simhash_oracle(
    bits: int = 32,
    chunks: int = 4,
    max_hamming: int = 8,
    th_prelude: str | None = None,
) -> str:
    """``th_prelude`` overrides the grams: any CTE chain ending at
    ``th(doc_id, h BIGINT)`` (default: md5 token hashes; the multimodal
    payload variant passes byte-4-gram hashes)."""
    width = bits // chunks
    mask = (1 << width) - 1
    bit_sums = ",\n         ".join(
        f"SUM(CASE WHEN (h & {1 << i}) != 0 THEN 1 ELSE -1 END) AS b{i}" for i in range(bits)
    )
    sim_expr = " + ".join(f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(bits))
    chunk_rows = "\n  UNION ALL ".join(
        f"SELECT doc_id, simhash, {c} AS chunk, (simhash >> {c * width}) & {mask} AS chunk_val FROM sim"
        for c in range(chunks)
    )
    prelude = th_prelude or r"""toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
  FROM documents
),
th AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h FROM toks)"""
    return rf"""
WITH {prelude},
bitsum AS (
  SELECT doc_id,
         {bit_sums}
  FROM th GROUP BY doc_id
),
sim AS (SELECT doc_id, CAST({sim_expr} AS BIGINT) AS simhash FROM bitsum),
chunked AS (
  {chunk_rows}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS sh_a, b.simhash AS sh_b
  FROM chunked a
  JOIN chunked b ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
"""


@register(
    "dedup_simhash",
    oracle=_simhash_oracle(32, 4, 8),
    doc="E7 SimHash near-dup: 32-bit per-bit-majority fingerprint from "
    "md5-derived token hashes; candidates via the pigeonhole chunk trick "
    "(4 chunks → any pair with hamming ≤ 3 is guaranteed found), filtered "
    "to hamming ≤ 8.",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_candidate_pairs(
        load_table(spark, sf_dir, "documents"), bits=32, chunks=4
    ).where(F.col("hamming") <= 8)


def _srp_oracle(
    threshold: float, dim: int = 64, n_planes: int = 16, band_bits: int = 4
) -> str:
    rows = ",\n    ".join(
        f"({p}, [{', '.join(str(s) for s in row)}]::DOUBLE[])"
        for p, row in enumerate(srp_signs(n_planes, dim))
    )
    return f"""
WITH planes(p, s) AS (VALUES
    {rows}
),
sigs AS (
  SELECT e.vec_id, pl.p,
         CASE WHEN list_sum(list_transform(range(1, {dim + 1}),
                    i -> CAST(e.embedding[i] AS DOUBLE) * pl.s[i])) >= 0
              THEN 1 ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN planes pl
),
keys AS (
  SELECT vec_id, p // {band_bits} AS band,
         CAST(SUM(bit << (p % {band_bits})) AS BIGINT) AS bkey
  FROM sigs GROUP BY vec_id, p // {band_bits}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM keys a JOIN keys b
    ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
)
SELECT id_a, id_b,
       ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                    CAST(eb.embedding AS DOUBLE[])), 6) AS cosine
FROM cand
JOIN embeddings ea ON ea.vec_id = id_a
JOIN embeddings eb ON eb.vec_id = id_b
WHERE ROUND(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                   CAST(eb.embedding AS DOUBLE[])), 6) >= {threshold}
"""


@register(
    "dedup_embedding_srp",
    oracle=_srp_oracle(0.45),
    doc="E7 embedding near-dup at scale: sign-random-projection LSH "
    "(16 deterministic ±1 hyperplanes → 4 bands of 4 bits → bucket-local "
    "pairs) with exact cosine ≥ 0.45 verification. Corpus-linear plan: "
    "signatures are one codegen'd projection, pair space is bucket-"
    "bounded — the scale path next to the exact-quadratic "
    "dedup_embedding_cosine baseline.",
)
def q_dedup_embedding_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_srp_lsh_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.45, dim=64
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.45
""",
    doc="E7/E8 embedding near-dup: exact pairwise cosine ≥ 0.45 (threshold "
    "chosen with ≥1e-4 margin to the nearest pair so engines agree). Exact "
    "quadratic form — the LSH/IVF bucketed variant in similarity_queries "
    "is the 100 TB path.",
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_cosine_pairs(load_table(spark, sf_dir, "embeddings"), threshold=0.45)


def _cc_oracle(threshold: float = 0.8, num_hashes: int = 8, band_size: int = 2) -> str:
    sig_cols, band_rows = _band_parts(num_hashes, band_size)
    thr = int(threshold * 10000)
    return (
        "WITH RECURSIVE "
        + _verified_pair_ctes(sig_cols, band_rows)
        + f""",
pairs AS (
  SELECT doc_a, doc_b FROM scored WHERE (20000 * i + u) // (2 * u) >= {thr}
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT s AS id FROM edges),
reach(id, lab) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.id
)
SELECT id AS doc_id, MIN(lab) AS comp_id FROM reach GROUP BY id
"""
    )


@register(
    "dedup_connected_components",
    oracle=_cc_oracle(0.8, 8, 2),
    doc="E7 dedup clustering: connected components over the Jaccard-"
    "verified MinHash-LSH pair graph (near-dup PAIRS don't partition a "
    "corpus — A~B~C without A~C — components do). Iterative min-label "
    "propagation with per-round localCheckpoint and a count()-based "
    "early exit; each round is one join + one groupBy on the edge set, "
    "which is O(n·dup_rate) — orders smaller than the corpus. comp_id = "
    "min doc_id of the cluster, the canonical keep representative. "
    "Oracle: DuckDB recursive CTE transitive closure over the same pairs.",
)
def q_dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import connected_components

    pairs = minhash_verified_pairs(
        load_table(spark, sf_dir, "documents"), k=3, num_hashes=8, band_size=2, threshold=0.8
    )
    labels = connected_components(pairs, src="doc_a", dst="doc_b")
    return labels.select(F.col("id").alias("doc_id"), F.col("comp").alias("comp_id"))


@register(
    "dedup_incremental",
    oracle=r"""
WITH hist AS (
  SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS text_md5
  FROM documents WHERE doc_id % 3 <> 0
),
b AS (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS text_md5
  FROM documents WHERE doc_id % 3 = 0
),
bk AS (
  SELECT doc_id, text_md5,
         MIN(doc_id) OVER (PARTITION BY text_md5) AS batch_keep
  FROM b
)
SELECT bk.doc_id, bk.text_md5,
       CASE WHEN hist.text_md5 IS NOT NULL THEN 'dup_of_history'
            WHEN bk.doc_id <> bk.batch_keep THEN 'dup_in_batch'
            ELSE 'new' END AS verdict,
       bk.batch_keep
FROM bk LEFT JOIN hist USING (text_md5)
""",
    doc="Incremental exact dedup — the daily-ingest contract: the corpus "
    "is split deterministically into history (doc_id % 3 != 0) and "
    "today's batch; each batch doc is classified dup_of_history / "
    "dup_in_batch / new against the history's FINGERPRINT table only "
    "(md5 of the canonical text — yesterday's 100 TB is never re-read) "
    "plus a min-id window within the batch. Two md5-keyed shuffles, no "
    "text movement after fingerprinting; at scale the store is append-"
    "only and bucketed by hash so the batch join is co-located.",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    history = docs.where(F.col("doc_id") % 3 != 0)
    batch = docs.where(F.col("doc_id") % 3 == 0)
    return incremental_dedup(history, batch)


@register(
    "related_docs_topk",
    oracle="WITH "
    + _PROFILE_CTE
    + """,
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS i,
         CAST(a.n_shingles + b.n_shingles - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS u
  FROM profiles a JOIN profiles b ON a.block = b.block AND a.doc_id < b.doc_id
),
scored AS (
  SELECT doc_a, doc_b, CAST((20000 * i + u) // (2 * u) AS BIGINT) AS jacc_scaled FROM cand
),
accepted AS (
  SELECT doc_a, doc_b, jacc_scaled FROM scored WHERE jacc_scaled >= 5000
),
sym AS (
  SELECT doc_a AS doc_id, doc_b AS related_id, jacc_scaled FROM accepted
  UNION ALL
  SELECT doc_b AS doc_id, doc_a AS related_id, jacc_scaled FROM accepted
),
ranked AS (
  SELECT doc_id, related_id, jacc_scaled,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY jacc_scaled DESC, related_id) AS rnk
  FROM sym
)
SELECT doc_id, related_id, jacc_scaled / 10000.0 AS jaccard,
       CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3
""",
    doc="Related-documents ranking — the 'more like this' product query, "
    "composed from the dedup machinery at a looser threshold: min-"
    "shingle-blocked candidates verified by exact integer Jaccard "
    "(>= 0.5), SYMMETRIZED (each accepted pair feeds both endpoints' "
    "lists), and per-doc top-3 by (jaccard DESC, related_id) — a total "
    "order, so both engines rank identically. Same shared-constant "
    "oracle CTEs as dedup_ngram_jaccard (one definition of the "
    "shingle/hash pipeline, CLAUDE.md invariant). 100 TB: pair space "
    "stays block-bounded (never all-pairs); the symmetric union "
    "doubles rows but the per-doc window is partition-local on "
    "doc_id — one shuffle after the verified-pair join.",
)
def q_related_docs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ds_mapreduce_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), k=3, threshold=0.5
    )
    sym = pairs.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("related_id"),
        "jaccard",
    ).unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("related_id"),
            "jaccard",
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("jaccard").desc(), "related_id")
    return (
        sym.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "related_id", "jaccard", "rnk")
    )


@register(
    "contrastive_pairs",
    oracle="WITH "
    + _PROFILE_CTE
    + """,
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS i,
         CAST(a.n_shingles + b.n_shingles - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS u
  FROM profiles a JOIN profiles b ON a.block = b.block AND a.doc_id < b.doc_id
),
pos AS (
  SELECT doc_a, doc_b FROM cand
  WHERE CAST((20000 * i + u) // (2 * u) AS BIGINT) >= 5000
),
n_docs AS (SELECT COUNT(*) AS n FROM documents),
neg_raw AS (
  SELECT d.doc_id AS doc_a,
         (d.doc_id * 31 + 7) % (SELECT n FROM n_docs) AS doc_b
  FROM documents d
),
neg AS (
  SELECT nr.doc_a, nr.doc_b FROM neg_raw nr
  WHERE nr.doc_b <> nr.doc_a
    AND NOT EXISTS (
      SELECT 1 FROM pos p
      WHERE (p.doc_a = LEAST(nr.doc_a, nr.doc_b) AND p.doc_b = GREATEST(nr.doc_a, nr.doc_b))
    )
)
SELECT doc_a, CAST(doc_b AS BIGINT) AS doc_b, CAST(1 AS BIGINT) AS label FROM pos
UNION ALL
SELECT doc_a, CAST(doc_b AS BIGINT) AS doc_b, CAST(0 AS BIGINT) AS label FROM neg
""",
    doc="Contrastive training-pair mining — the dataset-construction "
    "step for embedding-model training: POSITIVES are the verified "
    "near-dup pairs (min-shingle-blocked, exact integer Jaccard >= "
    "0.5 — the same machinery as related_docs_topk), NEGATIVES pair "
    "every doc with a deterministic arithmetic partner "
    "((id*31 + 7) mod N — doc_ids are dense 0..N-1 in the testdata, a "
    "documented precondition; at scale use the md5-rank as the dense "
    "index) with self-pairs and accidental positives anti-joined out. "
    "Fully deterministic on both engines — no RNG. 100 TB: positives "
    "stay block-bounded; the negative map is a map-only projection "
    "plus one anti-join against the (small) positive set; the N "
    "scalar is a 1-row broadcast.",
)
def q_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pos = ngram_jaccard_pairs(docs, k=3, threshold=0.5).select("doc_a", "doc_b")
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    neg_raw = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("doc_id").alias("doc_a"),
            ((F.col("doc_id") * 31 + 7) % F.col("n")).alias("doc_b"),
        )
        .where(F.col("doc_b") != F.col("doc_a"))
    )
    neg_keyed = neg_raw.select(
        "doc_a",
        "doc_b",
        F.least("doc_a", "doc_b").alias("__lo"),
        F.greatest("doc_a", "doc_b").alias("__hi"),
    )
    pos_keyed = pos.select(
        F.col("doc_a").alias("__lo"), F.col("doc_b").alias("__hi")
    )
    neg = neg_keyed.join(pos_keyed, ["__lo", "__hi"], "left_anti").select(
        "doc_a", "doc_b"
    )
    return pos.select(
        "doc_a", F.col("doc_b").cast("bigint").alias("doc_b"), F.lit(1).cast("bigint").alias("label")
    ).unionByName(
        neg.select(
            "doc_a", F.col("doc_b").cast("bigint").alias("doc_b"), F.lit(0).cast("bigint").alias("label")
        )
    )


def _lsh_eval_oracle(threshold: float = 0.8, num_hashes: int = 8, band_size: int = 2) -> str:
    sig_cols, band_rows = _band_parts(num_hashes, band_size)
    thr = int(threshold * 10000)
    return (
        "WITH "
        + _verified_pair_ctes(sig_cols, band_rows)
        + f""",
truth AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM profiles a JOIN profiles b ON a.block = b.block AND a.doc_id < b.doc_id
  WHERE (20000 * len(list_intersect(a.sh, b.sh))
         + a.n_shingles + b.n_shingles - len(list_intersect(a.sh, b.sh)))
        // (2 * (a.n_shingles + b.n_shingles - len(list_intersect(a.sh, b.sh))))
        >= {thr}
),
m AS (
  SELECT t.doc_a IS NOT NULL AS in_truth,
         c.doc_a IS NOT NULL AS in_cand
  FROM truth t FULL JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
),
agg AS (
  SELECT CAST(SUM(CASE WHEN in_truth AND in_cand THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN in_cand AND NOT in_truth THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN in_truth AND NOT in_cand THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM m
)
SELECT tp, fp, fn,
       CAST(CASE WHEN tp + fp = 0 THEN 10000
                 ELSE (20000 * tp + tp + fp) // (2 * (tp + fp)) END AS BIGINT)
         AS precision_bp,
       CAST(CASE WHEN tp + fn = 0 THEN 10000
                 ELSE (20000 * tp + tp + fn) // (2 * (tp + fn)) END AS BIGINT)
         AS recall_bp
FROM agg
"""
    )


@register(
    "dedup_lsh_eval",
    oracle=_lsh_eval_oracle(0.8, 8, 2),
    doc="LSH tuning evaluation (r5) — the measurement every banding "
    "configuration decision should rest on: MinHash-LSH candidates "
    "(8 hashes × 4 bands of 2) scored against the exact min-shingle-"
    "blocked Jaccard≥0.8 truth set, reporting the confusion counts and "
    "half-up integer-bp precision/recall. recall_bp is recall vs the "
    "BLOCKED truth: a pair the min-shingle blocking itself misses is "
    "invisible to both sides (the oracle mirrors the block, so parity "
    "is honest); the block-share probability for Jaccard-τ pairs is "
    "≥ τ/(1+τ) and tests/test_dedup_truth_bound.py measures the actual "
    "block-miss rate against unblocked all-pairs truth at sf0.001. FP "
    "here is the verification "
    "WORKLOAD the banding forwards (harmless, filtered by the verify "
    "stage); FN is the recall lost to banding — the number that says "
    "whether to add bands before scaling to 100 TB, measured instead "
    "of taken from the (1-(1-s^r)^b) formula's assumptions. Shape: "
    "signature pipeline runs once, both pair sets are O(n·bands)/"
    "O(n·block_rate) rows, the full-outer confusion join touches only "
    "pairs, and the report is one bounded scalar row.",
)
def q_dedup_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    truth = ngram_jaccard_pairs(docs, k=3, threshold=0.8).select(
        "doc_a", "doc_b", F.lit(True).alias("in_truth")
    )
    cand = minhash_lsh_pairs(docs, num_hashes=8, band_size=2).select(
        "doc_a", "doc_b", F.lit(True).alias("in_cand")
    )
    m = truth.join(cand, ["doc_a", "doc_b"], "full").select(
        F.coalesce("in_truth", F.lit(False)).alias("in_truth"),
        F.coalesce("in_cand", F.lit(False)).alias("in_cand"),
    )
    agg = m.agg(
        F.sum(F.when(F.col("in_truth") & F.col("in_cand"), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(F.col("in_cand") & ~F.col("in_truth"), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when(F.col("in_truth") & ~F.col("in_cand"), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    from ds_mapreduce_spark.functions.temporal import idiv_floor

    return agg.select(
        "tp",
        "fp",
        "fn",
        F.when(tp + fp == 0, F.lit(10000))
        .otherwise(idiv_floor(20000 * tp + tp + fp, 2 * (tp + fp)))
        .cast("bigint")
        .alias("precision_bp"),
        F.when(tp + fn == 0, F.lit(10000))
        .otherwise(idiv_floor(20000 * tp + tp + fn, 2 * (tp + fn)))
        .cast("bigint")
        .alias("recall_bp"),
    )


def _band_eval_select(band_size: int) -> str:
    """One band-config evaluation as a scalar-row SELECT (shares the
    profile/truth CTEs; sig/bands/cand CTEs are suffixed per config)."""
    sfx = f"_{band_size}"
    return f"""
  SELECT CAST({band_size} AS BIGINT) AS band_size,
         CAST(SUM(CASE WHEN in_truth AND in_cand THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN in_cand AND NOT in_truth THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN in_truth AND NOT in_cand THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM (
    SELECT t.doc_a IS NOT NULL AS in_truth, c.doc_a IS NOT NULL AS in_cand
    FROM truth t FULL JOIN cand{sfx} c
      ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
  )"""


def _lsh_band_sweep_oracle(threshold: float = 0.8, num_hashes: int = 8) -> str:
    thr = int(threshold * 10000)
    sig_cols, _ = _band_parts(num_hashes, 1)
    config_ctes = []
    for band_size in (1, 2, 4):
        _, band_rows = _band_parts(num_hashes, band_size)
        sfx = f"_{band_size}"
        config_ctes.append(
            f"""bands{sfx} AS (
  {band_rows}
),
cand{sfx} AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands{sfx} x
  JOIN bands{sfx} y ON x.band = y.band AND x.band_key = y.band_key
   AND x.doc_id < y.doc_id
)"""
        )
    evals = "\n  UNION ALL\n".join(_band_eval_select(b) for b in (1, 2, 4))
    return (
        "WITH "
        + _PROFILE_CTE
        + f""",
sig AS (
  SELECT doc_id,
         {sig_cols}
  FROM profiles
),
truth AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM profiles a JOIN profiles b ON a.block = b.block AND a.doc_id < b.doc_id
  WHERE (20000 * len(list_intersect(a.sh, b.sh))
         + a.n_shingles + b.n_shingles - len(list_intersect(a.sh, b.sh)))
        // (2 * (a.n_shingles + b.n_shingles - len(list_intersect(a.sh, b.sh))))
        >= {thr}
),
{",".join(config_ctes)},
confusion AS (
{evals}
)
SELECT band_size, tp, fp, fn,
       CAST(CASE WHEN tp + fp = 0 THEN 10000
                 ELSE (20000 * tp + tp + fp) // (2 * (tp + fp)) END AS BIGINT)
         AS precision_bp,
       CAST(CASE WHEN tp + fn = 0 THEN 10000
                 ELSE (20000 * tp + tp + fn) // (2 * (tp + fn)) END AS BIGINT)
         AS recall_bp
FROM confusion
"""
    )


@register(
    "dedup_lsh_band_sweep",
    oracle=_lsh_band_sweep_oracle(0.8, 8),
    doc="LSH banding TUNING CURVE (r5): the single-config evaluation "
    "(dedup_lsh_eval) swept across band sizes 1/2/4 over the same 8 "
    "minhashes in ONE plan — 8 bands of 1 (max recall, max candidate "
    "workload), 4×2, and 2 bands of 4 (min workload, recall risk) — "
    "each scored against the shared exact truth set. This is the table "
    "an engineer reads to pick the banding before a 100 TB run: "
    "recall_bp is what the s-curve formula only predicts — measured vs "
    "the BLOCKED truth (truth within the min-shingle blocking key; "
    "block-miss rate bounded by tests/test_dedup_truth_bound.py); fp "
    "is the verification workload actually forwarded. Shape: ONE signature "
    "pipeline feeds all three band explosions (the sig projection is "
    "shared, band structs differ only in grouping), each config's "
    "candidate set is O(n·bands), and the three confusion joins union "
    "into a 3-row report.",
)
def q_dedup_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.functions.temporal import idiv_floor

    from ds_mapreduce_spark.operators.dedup import (
        lsh_band_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    truth = (
        ngram_jaccard_pairs(docs, k=3, threshold=0.8)
        .select("doc_a", "doc_b", F.lit(True).alias("in_truth"))
        .localCheckpoint(eager=True)  # shared by all three confusion joins
    )
    # the corpus-sized signature pipeline runs ONCE; each config below
    # re-explodes the same 8 checkpointed minhashes into its banding
    sig = minhash_signatures(docs, k=3, num_hashes=8).localCheckpoint(eager=True)
    out = None
    for band_size in (1, 2, 4):
        cand = lsh_band_pairs(sig, num_hashes=8, band_size=band_size).select(
            "doc_a", "doc_b", F.lit(True).alias("in_cand")
        )
        m = truth.join(cand, ["doc_a", "doc_b"], "full").select(
            F.coalesce("in_truth", F.lit(False)).alias("in_truth"),
            F.coalesce("in_cand", F.lit(False)).alias("in_cand"),
        )
        agg = m.agg(
            F.lit(band_size).cast("bigint").alias("band_size"),
            F.sum(F.when(F.col("in_truth") & F.col("in_cand"), 1).otherwise(0))
            .cast("bigint")
            .alias("tp"),
            F.sum(F.when(F.col("in_cand") & ~F.col("in_truth"), 1).otherwise(0))
            .cast("bigint")
            .alias("fp"),
            F.sum(F.when(F.col("in_truth") & ~F.col("in_cand"), 1).otherwise(0))
            .cast("bigint")
            .alias("fn"),
        )
        out = agg if out is None else out.unionByName(agg)
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return out.select(
        "band_size",
        "tp",
        "fp",
        "fn",
        F.when(tp + fp == 0, F.lit(10000))
        .otherwise(idiv_floor(20000 * tp + tp + fp, 2 * (tp + fp)))
        .cast("bigint")
        .alias("precision_bp"),
        F.when(tp + fn == 0, F.lit(10000))
        .otherwise(idiv_floor(20000 * tp + tp + fn, 2 * (tp + fn)))
        .cast("bigint")
        .alias("recall_bp"),
    )


@register(
    "dedup_prefix_filter",
    oracle="WITH "
    + _PROFILE_CTE
    + """,
tn AS (SELECT doc_id, sh AS ts, n_shingles AS n FROM profiles),
ex AS (SELECT doc_id, n, unnest(ts) AS tok FROM tn),
dfreq AS (SELECT tok, COUNT(*) AS dft FROM ex GROUP BY tok),
pfx AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, n, tok,
           row_number() OVER (PARTITION BY doc_id ORDER BY dft, tok) AS pos
    FROM ex JOIN dfreq USING (tok)
  ) WHERE pos <= n - ((8000 * n + 9999) // 10000) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pfx a JOIN pfx b ON a.tok = b.tok AND a.doc_id < b.doc_id
),
scored AS (
  SELECT doc_a, doc_b,
         CAST((20000 * len(list_intersect(x.ts, y.ts))
               + x.n + y.n - len(list_intersect(x.ts, y.ts)))
              // (2 * (x.n + y.n - len(list_intersect(x.ts, y.ts)))) AS BIGINT)
           AS jacc_scaled
  FROM cand JOIN tn x ON cand.doc_a = x.doc_id JOIN tn y ON cand.doc_b = y.doc_id
)
SELECT doc_a, doc_b, jacc_scaled / 10000.0 AS jaccard
FROM scored WHERE jacc_scaled >= 8000
""",
    doc="EXACT 3-gram-shingle Jaccard self-join via prefix filtering "
    "(r6) — the PPJoin/AllPairs strategy: under a global rarest-first "
    "shingle order, any Jaccard>=0.8 pair must share one of each "
    "doc's first n - ceil(0.8n) + 1 shingles, so posting only those "
    "prefix shingles generates a provably complete candidate set (a "
    "completeness THEOREM — the recall guarantee LSH only gives "
    "probabilistically, and min-shingle blocking only in expectation) "
    "and the exact verify makes the whole join exact: the result is a "
    "provable SUPERSET of dedup_ngram_jaccard's (same similarity and "
    "acceptance, no block-missed pairs — containment asserted by "
    "tests/test_dedup_truth_bound.py). The hash is an independent "
    "cross-engine check of that completeness: both engines emit only "
    "verified pairs, so any candidate miss shows up as a missing row. "
    "See operators/dedup.py:prefix_filter_jaccard_pairs for the "
    "100 TB shape (rare-first prefixes = short posting lists, no hot "
    "keys, everything partial-aggregatable) and for why the domain is "
    "shingles, not unigram token sets.",
)
def q_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import prefix_filter_jaccard_pairs

    return prefix_filter_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), k=3, threshold=0.8
    )


def _span_excision_oracle(
    min_span_tokens: int = 0, n: int = 5, hash_grams: bool = False
) -> str:
    """Generated DuckDB oracle for duplicate_span_excision — ONE
    template for the unfloored query, the Lee-et-al post-merge floor
    variant, and the exact-L variant (floor encoded as the gram size,
    optionally md5-keyed), so none can drift apart. The differences:
    a HAVING on the merged-island length (floor tested AFTER the
    gaps-and-islands merge, mirroring the operator), the gram width,
    and an md5 around the gram key."""
    having = (
        f"HAVING MAX(e) - MIN(s) + 1 >= {min_span_tokens}"
        if min_span_tokens > 0
        else ""
    )
    g = f"array_to_string(t[i:i+{n - 1}], ' ')"
    if hash_grams:
        g = f"md5({g})"
    return rf"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
occ AS (
  SELECT doc_id, CAST(i AS BIGINT) AS s, {g} AS g
  FROM toks, UNNEST(range(1, len(t) - {n - 2})) u(i)
  WHERE len(t) >= {n}
),
dup AS (SELECT g FROM occ GROUP BY g HAVING COUNT(*) >= 2),
hits AS (SELECT o.doc_id, o.s, o.s + {n - 1} AS e FROM occ o JOIN dup USING (g)),
isl AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS ni
  FROM hits
),
isl2 AS (
  SELECT doc_id, s, e,
         SUM(ni) OVER (PARTITION BY doc_id ORDER BY s
                       ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, island, MIN(s) AS ss, MAX(e) AS se
  FROM isl2 GROUP BY doc_id, island {having}
),
per AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         CAST(SUM(se - ss + 1) AS BIGINT) AS n_tokens_removed
  FROM spans GROUP BY doc_id
),
covered AS (
  SELECT doc_id, CAST(p AS BIGINT) AS p
  FROM spans, UNNEST(range(ss, se + 1)) v(p)
),
tokpos AS (
  SELECT doc_id, CAST(i AS BIGINT) AS p, t[i] AS tok
  FROM toks, UNNEST(range(1, len(t) + 1)) w(i)
  WHERE doc_id IN (SELECT doc_id FROM per)
),
kept AS (
  SELECT tp.doc_id, tp.p, tp.tok
  FROM tokpos tp LEFT JOIN covered c ON tp.doc_id = c.doc_id AND tp.p = c.p
  WHERE c.p IS NULL
),
rebuilt AS (
  SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY p)) AS retained_md5
  FROM kept GROUP BY doc_id
),
lens AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         md5(array_to_string(t, ' ')) AS clean_md5
  FROM toks
)
SELECT l.doc_id, l.n_tokens,
       COALESCE(per.n_spans, 0) AS n_spans,
       COALESCE(per.n_tokens_removed, 0) AS n_tokens_removed,
       l.n_tokens - COALESCE(per.n_tokens_removed, 0) AS n_tokens_kept,
       CASE WHEN l.n_tokens = 0 THEN 0
            ELSE (20000 * COALESCE(per.n_tokens_removed, 0) + l.n_tokens)
                 // (2 * l.n_tokens) END AS removed_bp,
       CASE WHEN per.doc_id IS NULL THEN l.clean_md5
            ELSE COALESCE(rebuilt.retained_md5, md5('')) END AS retained_md5
FROM lens l
LEFT JOIN per ON l.doc_id = per.doc_id
LEFT JOIN rebuilt ON l.doc_id = rebuilt.doc_id
"""


@register(
    "dedup_span_excision",
    oracle=_span_excision_oracle(),
    doc="Duplicate-SPAN excision (r6) — the ExactSubstr dedup of Lee "
    "et al. 2022 at 5-gram granularity: any 5-token sequence occurring "
    ">= 2 times corpus-wide marks its interval; per-doc overlapping/"
    "adjacent intervals merge (gaps-and-islands) and the retained text "
    "is rebuilt from surviving positions — keeping the unique remainder "
    "of a partially-duplicated doc instead of keeping/dropping it "
    "wholesale. The retained_md5 column proves the reconstruction "
    "cross-engine, not just the span arithmetic. Plan: count-then-"
    "filter two-pass (hot boilerplate grams absorbed map-side by "
    "partial agg), ONE bounded per-doc window pair for the merge, "
    "reconstruction semi-joined to span-bearing docs only — at 100 TB "
    "the common clean doc pays one map-side md5 and never re-explodes. "
    "See operators/dedup.py:duplicate_span_excision.",
)
def q_dedup_span_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import duplicate_span_excision

    return duplicate_span_excision(
        load_table(spark, sf_dir, "documents"), n=5, min_count=2
    )


@register(
    "dedup_span_excision_minlen",
    oracle=_span_excision_oracle(min_span_tokens=20),
    doc="Length-floored duplicate-span excision (r7, VERDICT r6 #5) — "
    "true ExactSubstr semantics: Lee et al. 2022 excise duplicated "
    "substrings of >= 50 tokens, not every duplicated n-gram. Marked "
    "5-gram hits merge into maximal islands FIRST (gaps-and-islands), "
    "then islands shorter than the floor are dropped by one filter on "
    "the merged span table, so a lone boilerplate phrase survives but "
    "a long duplicated passage is cut. Floor = 20 tokens here because "
    "the synthetic docs average ~55 tokens (the paper's 50 scaled to "
    "doc length); the operator parameter is general. Oracle is "
    "generated from the same template as dedup_span_excision (one "
    "HAVING of difference). See "
    "operators/dedup.py:duplicate_span_excision.",
)
def q_dedup_span_excision_minlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import duplicate_span_excision

    return duplicate_span_excision(
        load_table(spark, sf_dir, "documents"), n=5, min_count=2, min_span_tokens=20
    )


@register(
    "dedup_span_excision_exact20",
    oracle=_span_excision_oracle(n=20, hash_grams=True),
    doc="EXACT ExactSubstr excision set (r8, VERDICT r7 #4a) — the "
    "suffix-array semantics of Lee et al. 2022 with no suffix array: "
    "encode the length floor IN the gram size (n = L = 20) instead of "
    "testing merged islands against it. Theorem (operator docstring): "
    "a position lies in some corpus-duplicated substring of length "
    ">= L iff it is covered by some duplicated L-gram — any "
    "duplicated substring of length m >= L contains, around each of "
    "its positions, a length-L window that is itself duplicated, and "
    "a duplicated L-gram IS such a substring. This removes the "
    "_minlen variant's documented over-excision (two short dups that "
    "touch were length-tested TOGETHER); its excision set here is "
    "exactly the paper's. Grams are md5-keyed (hash_grams=True): at "
    "L=20 the raw key is ~120 bytes vs a fixed 32-char hash, so the "
    "count-then-filter shuffle carries ~4x less — the standard "
    "distributed-ExactSubstr practice; the hash never reaches the "
    "output and md5 ≙ md5 across engines. L=20 matches the _minlen "
    "floor (docs avg ~55 tokens; the paper's 50 scaled); plan shape "
    "identical to dedup_span_excision (same budget lock). See "
    "operators/dedup.py:duplicate_span_excision.",
)
def q_dedup_span_excision_exact20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import duplicate_span_excision

    return duplicate_span_excision(
        load_table(spark, sf_dir, "documents"), n=20, min_count=2, hash_grams=True
    )


def _winnow_screen_oracle(L: int = 20) -> str:
    """Generated oracle for winnow_screen_eval: the winnowing CTE is
    the SAME generated SQL the doc_winnowing_fingerprints oracle uses
    (shared constants rule — HASH_P/SHINGLE_C change in one place),
    nested as a subquery with window w = L - k + 1."""
    from ds_mapreduce_spark.plans.text_queries import _winnowing_oracle

    w = L - 3 + 1
    return rf"""
WITH fps AS ({_winnowing_oracle(w)}),
ev AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
  WHERE len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) >= {L}
),
occ AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - {L} + 2),
                                 i -> md5(array_to_string(t[i:i+{L - 1}], ' ')))) AS g
    FROM ev
  )
),
dupg AS (SELECT g FROM occ GROUP BY g HAVING COUNT(*) >= 2),
truth AS (SELECT DISTINCT doc_id FROM occ WHERE g IN (SELECT g FROM dupg)),
sharedfp AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) >= 2),
flagged AS (SELECT DISTINCT doc_id FROM fps WHERE fp IN (SELECT fp FROM sharedfp)),
c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN t.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
         CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         CAST(SUM(CASE WHEN t.doc_id IS NOT NULL AND f.doc_id IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN f.doc_id IS NOT NULL AND t.doc_id IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN t.doc_id IS NOT NULL AND f.doc_id IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM ev e LEFT JOIN truth t ON e.doc_id = t.doc_id
            LEFT JOIN flagged f ON e.doc_id = f.doc_id
)
SELECT n_docs, n_truth, n_flagged, tp, fp, fn,
       CAST(CASE WHEN tp + fp = 0 THEN 10000
                 ELSE (20000 * tp + tp + fp) // (2 * (tp + fp)) END AS BIGINT)
         AS precision_bp,
       CAST(CASE WHEN tp + fn = 0 THEN 10000
                 ELSE (20000 * tp + tp + fn) // (2 * (tp + fn)) END AS BIGINT)
         AS recall_bp
FROM c
"""


@register(
    "dedup_span_winnow_screen",
    oracle=_winnow_screen_oracle(20),
    doc="Winnowing prescreen vs the exact-L touchstone (r9, VERDICT r8 "
    "#7's suggested comparison row): evaluates whether the cheap "
    "content-defined fingerprint screen can pick WHICH docs get the "
    "expensive exact-20 excision pass. Winnowing with k = 3, "
    "w = 18 has guarantee length w + k - 1 = 20 — exactly exact20's "
    "L — so every doc sharing a full 20-token substring with another "
    "doc MUST share a fingerprint: recall_bp = 10000 by the "
    "Schleimer/Wilkerson/Aiken theorem (pinned as an invariant by "
    "tests/test_winnow_screen.py; a miss is a bug, not tuning), and "
    "precision_bp is the number an engineer reads — the fraction of "
    "flagged docs that actually carry a full-length duplicate. Truth "
    "is the CROSS-doc form of exact20's census (an L-gram in >= 2 "
    "distinct docs; within-doc repeats are invisible to any cross-doc "
    "screen and excluded from both sides). 100 TB: the screen census "
    "shuffles winnowing's ~2/(w+1)-density selection of fixed 8-byte "
    "fps vs the exact pass's every-position 32-char md5 grams, and "
    "the exact pass then re-reads only the flagged fraction. Measured "
    "honestly: on the synthetic corpus the screen flags ~89% of "
    "eligible docs (precision_bp ~1000) — the tiny trigram vocabulary "
    "makes window minima collide constantly, so here the screen's "
    "win is shuffle width, not corpus reduction; on a real crawl "
    "(Heaps-scale shingle space) collisions need genuinely shared "
    "text. That corpus-dependence is exactly what this row exists to "
    "measure before anyone trusts the screen at scale. See "
    "operators/dedup.py:winnow_screen_eval.",
)
def q_dedup_span_winnow_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import winnow_screen_eval

    return winnow_screen_eval(load_table(spark, sf_dir, "documents"), L=20, k=3)


def _winnow_screen_entropic_oracle(L: int = 20) -> str:
    """Generated oracle for the entropic screen eval: the sdocs CTE
    replays the deterministic corpus construction (same md5/substr
    strings both engines), the winnowing CTE is the SAME generated SQL
    (src='sdocs'), and the per-tier report is a GROUP BY ROLLUP."""
    from ds_mapreduce_spark.plans.text_queries import _winnowing_oracle

    w = L - 3 + 1
    return rf"""
WITH sdocs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 2 THEN 'truth'
              WHEN doc_id % 10 = 2 THEN 'near19'
              WHEN doc_id % 10 = 3 THEN 'near12'
              ELSE 'clean' END AS tier,
         array_to_string(list_transform(range(0, 40 + doc_id % 30), j ->
           substr(md5(CASE
             WHEN doc_id % 10 < 2 AND j >= 7 AND j < 27
               THEN 'T:' || CAST((doc_id // 10) % 16 AS VARCHAR) || ':'
                    || CAST(j - 7 AS VARCHAR)
             WHEN doc_id % 10 = 2 AND j >= 7 AND j < 26
               THEN 'N:' || CAST((doc_id // 10) % 16 AS VARCHAR) || ':'
                    || CAST(j - 7 AS VARCHAR)
             WHEN doc_id % 10 = 3 AND j >= 7 AND j < 19
               THEN 'M:' || CAST((doc_id // 10) % 16 AS VARCHAR) || ':'
                    || CAST(j - 7 AS VARCHAR)
             ELSE 'U:' || CAST(doc_id AS VARCHAR) || ':'
                  || CAST(j AS VARCHAR)
           END), 1, 8)), ' ') AS text
  FROM documents
),
fps AS ({_winnowing_oracle(w, src="sdocs")}),
ev AS (
  SELECT doc_id, tier,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM sdocs
  WHERE len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) >= {L}
),
occ AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - {L} + 2),
                                 i -> md5(array_to_string(t[i:i+{L - 1}], ' ')))) AS g
    FROM ev
  )
),
dupg AS (SELECT g FROM occ GROUP BY g HAVING COUNT(*) >= 2),
truth AS (SELECT DISTINCT doc_id FROM occ WHERE g IN (SELECT g FROM dupg)),
sharedfp AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) >= 2),
flagged AS (SELECT DISTINCT doc_id FROM fps WHERE fp IN (SELECT fp FROM sharedfp)),
j AS (
  SELECT e.tier,
         t.doc_id IS NOT NULL AS in_truth,
         f.doc_id IS NOT NULL AS in_screen
  FROM ev e LEFT JOIN truth t ON e.doc_id = t.doc_id
            LEFT JOIN flagged f ON e.doc_id = f.doc_id
),
c AS (
  SELECT COALESCE(tier, 'all') AS tier,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN in_truth THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
         CAST(SUM(CASE WHEN in_screen THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         CAST(SUM(CASE WHEN in_truth AND in_screen THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN in_screen AND NOT in_truth THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN in_truth AND NOT in_screen THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM j GROUP BY ROLLUP(tier)
)
SELECT tier, n_docs, n_truth, n_flagged, tp, fp, fn,
       CAST(CASE WHEN tp + fp = 0 THEN 10000
                 ELSE (20000 * tp + tp + fp) // (2 * (tp + fp)) END AS BIGINT)
         AS precision_bp,
       CAST(CASE WHEN tp + fn = 0 THEN 10000
                 ELSE (20000 * tp + tp + fn) // (2 * (tp + fn)) END AS BIGINT)
         AS recall_bp
FROM c
"""


@register(
    "dedup_span_winnow_screen_entropic",
    oracle=_winnow_screen_entropic_oracle(20),
    doc="Winnowing-screen selectivity on a HIGH-ENTROPY corpus (r11, "
    "VERDICT r9 #4): the base dedup_span_winnow_screen row measures "
    "the screen on the raw synthetic documents, where the tiny "
    "trigram vocabulary makes fingerprints collide corpus-wide "
    "(~99.7% flagged — precision near-vacuous, documented there). "
    "This row derives, from doc_id alone, a corpus whose filler "
    "tokens are globally unique md5 prefixes with deterministically "
    "injected shared passages in four tiers — 20 tokens (= L, the "
    "recall-theorem tier), 19 (= L-1, the guarantee's one-sided "
    "edge), 12 (short overlap), none (clean) — and reports the "
    "census per tier via ROLLUP. Flagged is now a small fraction of "
    "n_docs and precision_bp a real number: the truth tier must flag "
    "100% (theorem), near19 measures how often a one-token-short "
    "overlap still collides a window minimum, near12/clean measure "
    "the false-positive floor. Oracle replays the corpus "
    "construction (same md5/substr strings), reuses the generated "
    "winnowing SQL (shared-constants rule, src='sdocs'), and "
    "aggregates with GROUP BY ROLLUP. 100 TB: same plan shape as the "
    "base eval — two censuses + distinct flag sets + one bounded "
    "aggregate; the synth corpus is one map-side projection over a "
    "doc_id-pruned scan. See "
    "operators/dedup.py:winnow_screen_eval_entropic.",
)
def q_dedup_span_winnow_screen_entropic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import winnow_screen_eval_entropic

    return winnow_screen_eval_entropic(
        load_table(spark, sf_dir, "documents"), L=20, k=3
    )


_SEMDEDUP_ORACLE = """
WITH RECURSIVE qv AS (
  SELECT vec_id,
         CAST(embedding AS DOUBLE[]) AS e,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
  FROM embeddings
),
cent AS (SELECT vec_id AS cid, q AS cq FROM qv WHERE vec_id < 8),
dists AS (
  SELECT v.vec_id, v.e, c.cid,
         CAST(list_sum(list_transform(range(1, 65),
              i -> (v.q[i] - c.cq[i]) * (v.q[i] - c.cq[i]))) AS BIGINT) AS dist
  FROM qv v CROSS JOIN cent c
),
asg AS (
  SELECT vec_id, e, cid, dist
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS r
        FROM dists)
  WHERE r = 1
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(a.e, b.e), 6) >= 0.45
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT s AS id FROM edges),
reach(id, lab) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.id
),
comp AS (SELECT id, MIN(lab) AS comp FROM reach GROUP BY id)
SELECT a.vec_id,
       a.cid AS cluster_id,
       CAST(COALESCE(c.comp, a.vec_id) AS BIGINT) AS comp_id,
       a.dist AS dist_to_centroid,
       (ROW_NUMBER() OVER (PARTITION BY COALESCE(c.comp, a.vec_id)
                           ORDER BY a.dist DESC, a.vec_id) = 1) AS is_kept
FROM asg a LEFT JOIN comp c ON c.id = a.vec_id
"""


@register(
    "dedup_semdedup",
    oracle=_SEMDEDUP_ORACLE,
    doc="SemDeDup (Abbas et al. 2023) — semantic dedup that bounds the "
    "cosine pair space by clustering FIRST: integer-exact k-means "
    "assignment (k=8 seed centroids, the kmeans_lloyd_refine "
    "convention) -> within-cluster exact cosine >= 0.45 pairs (the "
    "dedup_embedding_cosine convention) -> connected-component "
    "duplicate groups -> keep the member FARTHEST from its centroid "
    "(the paper's low-centroid-similarity keep rule; exact-integer "
    "distance, so the rule is engine-deterministic). Pair space is "
    "O(n^2/k) and k grows with the corpus at 100 TB; components run "
    "on the O(n*dup_rate) pair graph only. Oracle: argmin CTE + "
    "recursive-CTE closure + the same keep window. See "
    "operators/dedup.py:semdedup_verdicts.",
)
def q_dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import semdedup_verdicts

    return semdedup_verdicts(
        load_table(spark, sf_dir, "embeddings"), k=8, threshold=0.45
    )


def _semdedup_trained_oracle(iters: int = 2, k: int = 8) -> str:
    """Generated oracle for dedup_semdedup_trained: kmeans_lloyd_refine's
    unrolled integer-exact Lloyd CTE chain (same arithmetic, same
    constants — floor(x*1e4) quantization, (dist, cid) argmin
    tie-break, floor-of-double-div means) feeding _SEMDEDUP_ORACLE's
    assignment + cosine-pair + recursive-closure + keep-window tail.
    The two generators share their conventions with the operators, per
    the one-place-only rule."""
    dist = (
        "list_sum(list_transform(range(1, len(v.qv) + 1), "
        "i -> (v.qv[i] - c.cv[i]) * (v.qv[i] - c.cv[i])))"
    )
    ctes = [
        """qv AS (
  SELECT vec_id,
         CAST(embedding AS DOUBLE[]) AS e,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, qv AS cv FROM qv WHERE vec_id < """
        + str(k)
        + ")"
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""a{i} AS (
  SELECT vec_id, qv, cid FROM (
    SELECT v.vec_id, v.qv, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist}, c.cid) AS r
    FROM qv v JOIN c{i - 1} c ON TRUE
  ) WHERE r = 1
),
c{i} AS (
  SELECT cid, list(m ORDER BY i) AS cv FROM (
    SELECT cid, i, CAST(floor(CAST(SUM(qv[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
    FROM a{i}, UNNEST(range(1, len(qv) + 1)) u(i)
    GROUP BY cid, i
  ) GROUP BY cid
)"""
        )
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + f""",
dists AS (
  SELECT v.vec_id, v.e, c.cid,
         CAST({dist} AS BIGINT) AS dist
  FROM qv v CROSS JOIN c{iters} c
),
asg AS (
  SELECT vec_id, e, cid, dist
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS r
        FROM dists)
  WHERE r = 1
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(a.e, b.e), 6) >= 0.45
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT s AS id FROM edges),
reach(id, lab) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.id
),
comp AS (SELECT id, MIN(lab) AS comp FROM reach GROUP BY id)
SELECT a.vec_id,
       a.cid AS cluster_id,
       CAST(COALESCE(c.comp, a.vec_id) AS BIGINT) AS comp_id,
       a.dist AS dist_to_centroid,
       (ROW_NUMBER() OVER (PARTITION BY COALESCE(c.comp, a.vec_id)
                           ORDER BY a.dist DESC, a.vec_id) = 1) AS is_kept
FROM asg a LEFT JOIN comp c ON c.id = a.vec_id
"""
    )


@register(
    "dedup_semdedup_trained",
    oracle=_semdedup_trained_oracle(2, 8),
    doc="SemDeDup with TRAINED centroids (r8, VERDICT r7 #4b) — closes "
    "dedup_semdedup's one paper-fidelity gap: Abbas et al. run k-means "
    "before deduplicating, while the r7 query seeded clusters with the "
    "first k vectors. Here operators.similarity.lloyd_centroids (the "
    "SAME training loop kmeans_lloyd_refine now calls — one "
    "implementation, one set of integer-exact conventions) runs 2 "
    "Lloyd iterations at k=8 and semdedup_verdicts assigns, pairs, "
    "closes, and keeps against ITS output. Every step stays engine-"
    "deterministic (quantized BIGINT distances, floor-of-double-div "
    "means, (dist, cid) tie-breaks), so the oracle unrolls training + "
    "dedup into one CTE chain and matches bit-for-bit. Plan: the "
    "training iterations run on constant-size checkpointed k-row "
    "tables; the dedup phase is dedup_semdedup's unchanged map-only "
    "packed-centroid assignment + cluster-bounded pair join + CC. "
    "100 TB: identical to dedup_semdedup plus 2 scan-dominated "
    "training passes. See operators/dedup.py:semdedup_verdicts.",
)
def q_dedup_semdedup_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import semdedup_verdicts
    from ds_mapreduce_spark.operators.similarity import lloyd_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup_verdicts(
        emb, k=8, threshold=0.45, centroids=lloyd_centroids(emb, k=8, iters=2)
    )


def _neardup_splits_oracle(
    threshold: float = 0.8, num_hashes: int = 8, band_size: int = 2
) -> str:
    sig_cols, band_rows = _band_parts(num_hashes, band_size)
    thr = int(threshold * 10000)
    return (
        "WITH RECURSIVE "
        + _verified_pair_ctes(sig_cols, band_rows)
        + f""",
pairs AS (
  SELECT doc_a, doc_b FROM scored WHERE (20000 * i + u) // (2 * u) >= {thr}
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT s AS id FROM edges),
reach(id, lab) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.id
),
comp AS (SELECT id, MIN(lab) AS comp FROM reach GROUP BY id),
sp AS (
  SELECT d.doc_id, d.n_chars, COALESCE(c.comp, d.doc_id) AS comp,
         CASE WHEN substr(md5(CAST(COALESCE(c.comp, d.doc_id) AS VARCHAR)), 1, 1) < 'c' THEN 'train'
              WHEN substr(md5(CAST(COALESCE(c.comp, d.doc_id) AS VARCHAR)), 1, 1) < 'e' THEN 'val'
              ELSE 'test' END AS split
  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
),
docsplit AS (
  SELECT doc_id,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
              ELSE 'test' END AS dsplit
  FROM documents
),
leak_doc AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs p JOIN docsplit a ON a.doc_id = p.doc_a
               JOIN docsplit b ON b.doc_id = p.doc_b
  WHERE a.dsplit <> b.dsplit
),
leak_comp AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs p JOIN sp a ON a.doc_id = p.doc_a
               JOIN sp b ON b.doc_id = p.doc_b
  WHERE a.split <> b.split
)
SELECT split, COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT comp) AS BIGINT) AS n_comps,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       (SELECT n FROM leak_doc) AS leaky_pairs_doc_routing,
       (SELECT n FROM leak_comp) AS leaky_pairs_comp_routing
FROM sp GROUP BY split
"""
    )


@register(
    "leakage_safe_splits_neardup",
    oracle=_neardup_splits_oracle(),
    doc="NEAR-DUP-closure train/val/test splits — the stronger form of "
    "leakage_safe_splits (domain routing): the unit of split assignment "
    "is the MinHash-verified near-duplicate COMPONENT (same pair "
    "pipeline + min-label closure as dedup_connected_components), so a "
    "document and every near-copy of it land in the same split BY "
    "CONSTRUCTION — the Lee et al. 2022 finding that eval inflation "
    "comes from train/test near-dups, not just exact dups. Routing is "
    "md5(component representative) bucketed 12/2/2 sixteenths: map-only "
    "given the labels, stable under incremental ingest (a new near-copy "
    "inherits its component's split). The census MEASURES the claim: "
    "leaky_pairs_comp_routing is computed from the pair set (must be 0) "
    "next to the counterfactual leaky_pairs_doc_routing (what naive "
    "doc-id hashing would leak across the boundary). Plan: the "
    "verified-pair table is checkpointed ONCE (O(n*dup_rate) rows) and "
    "feeds closure + both leak joins; the corpus contributes one scan "
    "for signatures and one for the census.",
)
def q_leakage_safe_splits_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_verified_pairs(
        docs, k=3, num_hashes=8, band_size=2, threshold=0.8
    ).select("doc_a", "doc_b").localCheckpoint(eager=True)
    labels = connected_components(pairs, src="doc_a", dst="doc_b")
    asg = (
        docs.select("doc_id", "n_chars")
        .join(labels.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("comp", "doc_id").cast("bigint").alias("comp"),
        )
    )

    def split_of(col):
        h = F.substring(F.md5(col.cast("string")), 1, 1)
        return F.when(h < "c", "train").when(h < "e", "val").otherwise("test")

    sp = asg.withColumn("split", split_of(F.col("comp"))).localCheckpoint(
        eager=True
    )
    leak_doc = (
        pairs.select(split_of(F.col("doc_a")).alias("sa"), split_of(F.col("doc_b")).alias("sb"))
        .where(F.col("sa") != F.col("sb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("leaky_pairs_doc_routing"))
    )
    a = sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    leak_comp = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .where(F.col("sa") != F.col("sb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("leaky_pairs_comp_routing"))
    )
    return (
        sp.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("comp").cast("bigint").alias("n_comps"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        .crossJoin(F.broadcast(leak_doc))
        .crossJoin(F.broadcast(leak_comp))
    )
