"""Similarity-search queries (E8): exact brute-force top-k and IVF ANN
over the ``embeddings`` table. Query set = vec_id < 20 (deterministic);
centroid set for IVF = vec_id < 16.

Oracle-parity: cosine/dot computed in DOUBLE on both sides, rounded to
6dp BEFORE ranking/thresholding; rank order is (score DESC, id ASC) —
a total order, so both engines produce the identical top-k set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ds_mapreduce_spark.operators.similarity import brute_force_topk, ivf_topk
from ds_mapreduce_spark.plans.registry import register
from ds_mapreduce_spark.sources.catalog import load_table

N_QUERIES = 20
N_CENTROIDS = 16


@register(
    "knn_bruteforce",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, ROUND(list_cosine_similarity(qe, ce), 6) AS score
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, score,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= 10
""",
    doc="E8 exact top-10 cosine neighbors for 20 query vectors: broadcast "
    "query set × one corpus scan, JVM-side fused dot product, per-query "
    "top-k window. The exact baseline every ANN variant is judged against.",
)
def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id", "score", F.col("rnk").cast("bigint").alias("rnk")
    )


@register(
    "knn_ivf",
    oracle=f"""
WITH cent AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cent_emb
              FROM embeddings WHERE vec_id < {N_CENTROIDS}),
corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
assign_scored AS (
  SELECT v.vec_id, v.emb, c.centroid_id,
         ROUND(list_dot_product(v.emb, c.cent_emb), 6) AS affinity
  FROM corpus v CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, emb, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY affinity DESC, centroid_id) AS r
    FROM assign_scored
  ) WHERE r = 1
),
q AS (SELECT vec_id AS query_id, emb AS q_emb FROM corpus WHERE vec_id < {N_QUERIES}),
q_scored AS (
  SELECT q.query_id, q.q_emb, c.centroid_id,
         ROUND(list_dot_product(q.q_emb, c.cent_emb), 6) AS affinity
  FROM q CROSS JOIN cent c
),
probes AS (
  SELECT query_id, q_emb, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY affinity DESC, centroid_id) AS r
    FROM q_scored
  ) WHERE r <= 2
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(p.q_emb, a.emb), 6) AS score
  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
  WHERE p.query_id <> a.vec_id
)
SELECT query_id, neighbor_id, score,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= 5
""",
    doc="E8 IVF ANN: corpus bucketed by nearest centroid (argmax dot, "
    "deterministic ties); queries probe nprobe=2 buckets → equi-join on "
    "centroid_id. The scale path: scan cost / (n_centroids/nprobe), all "
    "shuffle-partitioned, no O(n²) pair space.",
)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    centroids = emb.where(F.col("vec_id") < N_CENTROIDS)
    return ivf_topk(emb, queries, centroids, k=5, nprobe=2).select(
        "query_id", "neighbor_id", "score", F.col("rnk").cast("bigint").alias("rnk")
    )


@register(
    "embedding_norm_stats",
    oracle="""
WITH q AS (
  SELECT label,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
  FROM embeddings
),
per AS (
  SELECT label,
         CAST(list_aggregate(list_transform(qv, x -> x * x), 'sum') AS BIGINT) AS qnorm2,
         CAST(list_aggregate(qv, 'sum') AS BIGINT) AS qsum
  FROM q
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(qnorm2) AS BIGINT) AS sum_qnorm2,
       (2 * CAST(SUM(qnorm2) AS BIGINT) + COUNT(*)) // (2 * COUNT(*)) AS avg_qnorm2,
       MAX(qnorm2) AS max_qnorm2,
       MIN(qnorm2) AS min_qnorm2,
       CAST(SUM(qsum) AS BIGINT) AS qcomp_sum
FROM per GROUP BY label
""",
    doc="Per-label embedding geometry audit (the sanity pass before any "
    "ANN index build: spot zero/denormal vectors, label-cluster scale "
    "drift): squared L2 norms and component sums on 1e-4-QUANTIZED "
    "integer components (floor(x*1e4) as BIGINT) — float arithmetic "
    "never crosses the engine boundary, so the aggregate is exact and "
    "partition-order-independent, unlike a double norm sum. Map-only "
    "per row (transform+aggregate fold over the 64-dim array, "
    "whole-stage codegen), then one 10-group shuffle. 100 TB: "
    "embarrassingly parallel; the per-label partial aggregates are the "
    "only shuffled bytes.",
)
def q_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 10000).cast("bigint"),
    )
    zero = F.lit(0).cast("bigint")
    per = emb.select(
        "label",
        F.aggregate(qv, zero, lambda a, x: a + x * x).alias("qnorm2"),
        F.aggregate(qv, zero, lambda a, x: a + x).alias("qsum"),
    )
    return per.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("qnorm2").cast("bigint").alias("sum_qnorm2"),
        F.expr("(2 * CAST(SUM(qnorm2) AS BIGINT) + COUNT(*)) DIV (2 * COUNT(*))").alias(
            "avg_qnorm2"
        ),
        F.max("qnorm2").alias("max_qnorm2"),
        F.min("qnorm2").alias("min_qnorm2"),
        F.sum("qsum").cast("bigint").alias("qcomp_sum"),
    )


@register(
    "knn_quality_gated",
    oracle=f"""
WITH ok AS (SELECT doc_id FROM documents WHERE n_chars >= 120),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce
      FROM embeddings WHERE vec_id IN (SELECT doc_id FROM ok)),
scored AS (
  SELECT query_id, neighbor_id, ROUND(list_cosine_similarity(qe, ce), 6) AS score
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, score,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= 5
""",
    doc="Quality-gated semantic search — the retrieval-over-curated-"
    "corpus composition every RAG/dedup pipeline runs: the ANN corpus "
    "is embeddings LEFT SEMI joined to documents passing a quality "
    "gate (n_chars >= 120; vec_id aligns with doc_id in the testdata), "
    "then exact cosine top-5 for the standard 20-query set. The gate "
    "predicate pushes into the documents parquet scan, the semi join "
    "carries only ids, and the reduced corpus streams through the same "
    "broadcast-queries scoring as knn_bruteforce. 100 TB: curation "
    "shrinks the scored corpus BEFORE any vector math; the semi join "
    "is an equi-join on the id (no payload movement), and the scale "
    "path swaps the exact scorer for knn_ivf unchanged.",
)
def q_knn_quality_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ok = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("n_chars") >= 120)
        .select(F.col("doc_id").alias("vec_id"))
    )
    corpus = emb.join(ok, "vec_id", "left_semi")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return brute_force_topk(corpus, queries, k=5).select(
        "query_id", "neighbor_id", "score", F.col("rnk").cast("bigint").alias("rnk")
    )


N_KMEANS = 8


def _kmeans_oracle(iters: int = 2, k: int = N_KMEANS) -> str:
    """Unrolled integer-exact Lloyd iterations (same constants and the
    same floor-of-double per-dim mean as q_kmeans_lloyd_refine)."""
    dist = (
        "list_aggregate(list_transform(range(1, len(v.qv) + 1), "
        "i -> (v.qv[i] - c.cv[i]) * (v.qv[i] - c.cv[i])), 'sum')"
    )
    ctes = [
        f"""v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, qv AS cv FROM v WHERE vec_id < {k})"""
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""a{i} AS (
  SELECT vec_id, qv, cid FROM (
    SELECT v.vec_id, v.qv, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist}, c.cid) AS r
    FROM v JOIN c{i-1} c ON TRUE
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
        "WITH "
        + ",\n".join(ctes)
        + f""",
final AS (
  SELECT vec_id, cid, dist FROM (
    SELECT v.vec_id, c.cid, {dist} AS dist,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {dist}, c.cid) AS r
    FROM v JOIN c{iters} c ON TRUE
  ) WHERE r = 1
)
SELECT cid AS centroid_id, COUNT(*) AS n_vecs,
       CAST(SUM(vec_id) AS BIGINT) AS id_checksum,
       CAST(SUM(dist) AS BIGINT) AS inertia
FROM final GROUP BY cid"""
    )


@register(
    "kmeans_lloyd_refine",
    oracle=_kmeans_oracle(2),
    doc="Lloyd k-means (2 refinement iterations, k=8, seeded by the "
    "first k vec_ids — the centroid-training step an IVF index build "
    "runs before `knn_ivf` queries it) in EXACT integer arithmetic: "
    "components quantized to floor(x*1e4) BIGINT (the "
    "embedding_norm_stats convention), squared-L2 distances exact "
    "integer folds, per-dim centroid means floor(double-div) — "
    "bit-identical in both engines, so a 2-iteration oracle can be "
    "unrolled and hash-compared (floats never cross the boundary). "
    "Spark shape per iteration: broadcast k centroids × corpus scan "
    "(argmin via one row_number window partitioned by vec_id), then a "
    "posexplode to (cid, dim) partial means — one |corpus|-key window "
    "shuffle + one 64k-row agg shuffle; new centroids (k rows) are "
    "localCheckpoint'ed so iteration plans stay constant-size. 100 TB: "
    "classic mini-batch variants drop in, but even full Lloyd is "
    "scan-dominated with k-row broadcasts — no pairwise blowup, no "
    "driver-side math.",
)
def q_kmeans_lloyd_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.similarity import (
        lloyd_assign,
        lloyd_centroids,
        quantize_embeddings,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # training loop + assignment shared with dedup_semdedup_trained and
    # the streaming twin (r8) — ONE implementation of the integer-exact
    # Lloyd conventions, no inline copies
    cent = lloyd_centroids(emb, k=N_KMEANS, iters=2)
    final = lloyd_assign(quantize_embeddings(emb), cent)
    return final.groupBy(F.col("cid").alias("centroid_id")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("vec_id").cast("bigint").alias("id_checksum"),
        F.sum("dist").cast("bigint").alias("inertia"),
    )


@register(
    "embedding_pq_codes",
    oracle=f"""
WITH corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
subs AS (
  SELECT vec_id, i AS sub_id, emb[i*16+1:(i+1)*16] AS sv
  FROM corpus CROSS JOIN (SELECT unnest(range(0, 4)) AS i) s
),
cent AS (SELECT vec_id AS code, sub_id, sv AS cv FROM subs WHERE vec_id < {N_CENTROIDS}),
scored AS (
  SELECT v.vec_id, v.sub_id, c.code, ROUND(list_distance(v.sv, c.cv), 6) AS d
  FROM subs v JOIN cent c USING (sub_id)
),
assigned AS (
  SELECT vec_id, sub_id, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub_id ORDER BY d, code) AS r
    FROM scored) WHERE r = 1
)
SELECT vec_id,
       CAST(MAX(CASE WHEN sub_id = 0 THEN code END) AS BIGINT) AS code_0,
       CAST(MAX(CASE WHEN sub_id = 1 THEN code END) AS BIGINT) AS code_1,
       CAST(MAX(CASE WHEN sub_id = 2 THEN code END) AS BIGINT) AS code_2,
       CAST(MAX(CASE WHEN sub_id = 3 THEN code END) AS BIGINT) AS code_3
FROM assigned GROUP BY vec_id
""",
    doc="Product-quantization codes (r5): every 64-dim embedding "
    "compresses to 4 one-byte codes — the nearest codebook entry per "
    "16-dim subspace by Euclidean distance (ROUND 6dp, ties to the "
    "lowest code; codebook = slices of the first 16 corpus vectors, "
    "deterministic so DuckDB mirrors it; k-means-trained codebooks "
    "plug into the identical plumbing). PQ is the memory-scale path "
    "for vector search at 100 TB: 256 B/vector becomes 4 B, so the "
    "index fits in RAM where raw vectors can't, and the asymmetric-"
    "distance scan reads codes only. Plan: map-only sub-slicing, "
    "broadcast codebook join, partial-aggregatable min_by argmin "
    "(operators/similarity.py:pq_assign — the shuffle never carries "
    "the |corpus|x|codes| score matrix), 4-way conditional-agg pivot.",
)
def q_embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.similarity import pq_assign

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = pq_assign(emb, emb.where(F.col("vec_id") < N_CENTROIDS), 4, 16)
    return assigned.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("sub_id") == i, F.col("code")))
            .cast("bigint")
            .alias(f"code_{i}")
            for i in range(4)
        ]
    )


@register(
    "knn_pq_adc",
    oracle=f"""
WITH corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
subs AS (
  SELECT vec_id, i AS sub_id, emb[i*16+1:(i+1)*16] AS sv
  FROM corpus CROSS JOIN (SELECT unnest(range(0, 4)) AS i) s
),
cent AS (SELECT vec_id AS code, sub_id, sv AS cv FROM subs WHERE vec_id < {N_CENTROIDS}),
scored AS (
  SELECT v.vec_id, v.sub_id, c.code, ROUND(list_distance(v.sv, c.cv), 6) AS d
  FROM subs v JOIN cent c USING (sub_id)
),
assigned AS (
  SELECT vec_id, sub_id, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub_id ORDER BY d, code) AS r
    FROM scored) WHERE r = 1
),
qsubs AS (SELECT vec_id AS query_id, sub_id, sv FROM subs WHERE vec_id < {N_QUERIES}),
dt AS (
  SELECT q.query_id, c.sub_id, c.code,
         CAST(floor(list_distance(q.sv, c.cv) * list_distance(q.sv, c.cv)
                    * 1000000) AS BIGINT) AS dfx
  FROM qsubs q JOIN cent c USING (sub_id)
),
adc AS (
  SELECT dt.query_id, a.vec_id AS neighbor_id,
         CAST(SUM(dt.dfx) AS BIGINT) AS approx_dist
  FROM assigned a JOIN dt ON a.sub_id = dt.sub_id AND a.code = dt.code
  WHERE dt.query_id <> a.vec_id
  GROUP BY dt.query_id, a.vec_id
)
SELECT query_id, neighbor_id, approx_dist,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY approx_dist, neighbor_id) AS BIGINT) AS rnk
FROM adc QUALIFY rnk <= 5
""",
    doc="PQ asymmetric-distance (ADC) k-NN (r5) — the search half of "
    "embedding_pq_codes: each query precomputes a distance TABLE "
    "(squared L2 to every codebook entry per subspace; integer "
    "fixed-point floor(d^2 * 1e6) so the 4-way sums are order-"
    "independent BIGINTs on both engines), and a corpus vector's "
    "approximate distance is 4 table lookups + adds over its CODES — "
    "the raw embedding is never touched at query time. 100 TB: the "
    "table (|queries| x 4 x 16 rows) broadcasts; scoring is a map-side "
    "join over the 4-byte code store (64x smaller than the vectors, "
    "16x fewer FLOPs than brute force) with partial-aggregatable "
    "per-pair sums; two-stage top-k (no single-task rank); compose "
    "with IVF bucketing for the scan-reduction multiplier. Exact "
    "sqrt-then-square mirrored on both engines for bit parity.",
)
def q_knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.functions.vector import l2_dist
    from ds_mapreduce_spark.operators.similarity import (
        _ranked_topk,
        _sub_slices,
        pq_assign,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = emb.where(F.col("vec_id") < N_CENTROIDS)
    assigned = pq_assign(emb, cb, 4, 16)
    qsubs = _sub_slices(emb.where(F.col("vec_id") < N_QUERIES), "query_id", 4, 16)
    cent = _sub_slices(cb, "code", 4, 16).withColumnRenamed("sv", "cv")
    d = l2_dist(F.col("sv"), F.col("cv"))
    dt = qsubs.join(F.broadcast(cent), "sub_id").select(
        "query_id",
        "sub_id",
        "code",
        F.floor(d * d * 1_000_000).cast("bigint").alias("dfx"),
    )
    adc = (
        assigned.join(F.broadcast(dt), ["sub_id", "code"])
        .where(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("dfx").cast("bigint").alias("approx_dist"))
    )
    ranked = _ranked_topk(
        adc.withColumn("score", -F.col("approx_dist")), 5
    )
    return ranked.select(
        "query_id",
        "neighbor_id",
        "approx_dist",
        F.col("rnk").cast("bigint").alias("rnk"),
    )


N_PQ_CODES = 8
PQ_TRAIN_ITERS = 2


def _pq_train_oracle(
    iters: int = PQ_TRAIN_ITERS, k: int = N_PQ_CODES, n_sub: int = 4, sub_dim: int = 16
) -> str:
    """Unrolled per-subspace Lloyd training + encode (same constants and
    floor arithmetic as pq_train_codebook / pq_encode_with_codebook;
    CTE levels MATERIALIZED — each is referenced by the next iteration
    AND the encode, and inlining re-evaluates the whole prefix per
    reference)."""
    dist = (
        "list_aggregate(list_transform(range(1, len(s.sv) + 1), "
        "i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i])), 'sum')"
    )
    ctes = [
        f"""v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
  FROM embeddings
),
subs AS MATERIALIZED (
  SELECT vec_id, i AS sub_id, qv[i*{sub_dim}+1:(i+1)*{sub_dim}] AS sv
  FROM v CROSS JOIN (SELECT unnest(range(0, {n_sub})) AS i) u
),
c0 AS (SELECT sub_id, vec_id AS cid, sv AS cv FROM subs WHERE vec_id < {k})"""
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""a{i} AS (
  SELECT vec_id, sub_id, sv, cid FROM (
    SELECT s.vec_id, s.sub_id, s.sv, c.cid,
           row_number() OVER (PARTITION BY s.vec_id, s.sub_id
                              ORDER BY {dist}, c.cid) AS r
    FROM subs s JOIN c{i-1} c USING (sub_id)
  ) WHERE r = 1
),
c{i} AS MATERIALIZED (
  SELECT sub_id, cid, list(m ORDER BY i) AS cv FROM (
    SELECT sub_id, cid, i,
           CAST(floor(CAST(SUM(sv[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
    FROM a{i}, UNNEST(range(1, len(sv) + 1)) u(i)
    GROUP BY sub_id, cid, i
  ) GROUP BY sub_id, cid
)"""
        )
    codes = ",\n       ".join(
        f"CAST(MAX(CASE WHEN sub_id = {j} THEN cid END) AS BIGINT) AS code_{j}"
        for j in range(n_sub)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
enc AS (
  SELECT vec_id, sub_id, cid, dist FROM (
    SELECT s.vec_id, s.sub_id, c.cid, {dist} AS dist,
           row_number() OVER (PARTITION BY s.vec_id, s.sub_id
                              ORDER BY {dist}, c.cid) AS r
    FROM subs s JOIN c{iters} c USING (sub_id)
  ) WHERE r = 1
)
SELECT vec_id,
       {codes},
       CAST(SUM(dist) AS BIGINT) AS quant_err
FROM enc GROUP BY vec_id"""
    )


@register(
    "pq_trained_codebook_encode",
    oracle=_pq_train_oracle(),
    doc="PQ with a TRAINED codebook (r6) — closes the product-"
    "quantization family to train+encode+search end-to-end "
    "(embedding_pq_codes encodes against a data-slice codebook; "
    "knn_pq_adc searches): per-subspace Lloyd k-means (k=8, 2 "
    "iterations, seeded by each subspace's first-k vec_id slices) in "
    "the SAME exact integer arithmetic as kmeans_lloyd_refine — "
    "quantized floor(x*1e4) components, exact integer squared-L2, "
    "floor-of-double per-dim means — generalized with sub_id as an "
    "extra grouping key so all 4 subspaces train in ONE plan, then the "
    "corpus encodes against the trained entries (ties to lowest code). "
    "Output per vector: the 4 codes + exact integer quantization error "
    "(the number that says whether the trained codebook beats the "
    "slice codebook). Shape per iteration: one (n_sub*k)-row broadcast "
    "x sub-sliced corpus scan, one argmin window shuffle keyed "
    "(vec_id, sub_id), one (n_sub*k*sub_dim)-row mean agg, "
    "localCheckpoint'ed centroids (constant-size iteration plans). "
    "100 TB: train on a sample, stream-encode the corpus — both "
    "halves are this plumbing; the oracle unrolls both iterations "
    "with MATERIALIZED CTE levels (inlining is exponential in depth).",
)
def q_pq_trained_codebook_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.similarity import (
        pq_encode_with_codebook,
        pq_train_codebook,
        quantized_sub_slices,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    subs = quantized_sub_slices(emb, "vec_id", 4, 16)
    cent = pq_train_codebook(subs, k=N_PQ_CODES, iters=PQ_TRAIN_ITERS)
    enc = pq_encode_with_codebook(subs, cent)
    return enc.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("sub_id") == j, F.col("code")))
            .cast("bigint")
            .alias(f"code_{j}")
            for j in range(4)
        ],
        F.sum("dist").cast("bigint").alias("quant_err"),
    )


def _pca_power_oracle(iters: int = 2, dim: int = 64, quant: int = 10_000) -> str:
    """Unrolled power iteration: Gramian CTE + per-iteration
    (matvec, max-abs, renormalize) CTE triple — the exact-integer twin
    of operators/similarity.pca_power_top_component."""
    ctes = [
        f"""q AS (
  SELECT vec_id, list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * {quant}) AS BIGINT)) AS qv
  FROM embeddings
),
g AS (
  SELECT CAST(i AS INTEGER) - 1 AS pi, CAST(j AS INTEGER) - 1 AS pj,
         CAST(SUM(qv[CAST(i AS INTEGER)] * qv[CAST(j AS INTEGER)]) AS BIGINT) AS g
  FROM q CROSS JOIN UNNEST(range(1, {dim + 1})) t(i)
         CROSS JOIN UNNEST(range(1, {dim + 1})) u(j)
  GROUP BY 1, 2
),
v0 AS (
  SELECT CAST(i AS INTEGER) - 1 AS i, CAST({quant} AS BIGINT) AS val
  FROM UNNEST(range(1, {dim + 1})) t(i)
)"""
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""w{k} AS (
  SELECT g.pi, CAST(SUM(g.g * v.val) AS BIGINT) AS s
  FROM g JOIN v{k - 1} v ON v.i = g.pj GROUP BY g.pi
),
m{k} AS (SELECT CAST(MAX(ABS(s)) AS BIGINT) AS m FROM w{k}),
v{k} AS (
  SELECT pi AS i, CAST(s // greatest(m // {quant}, 1) AS BIGINT) AS val
  FROM w{k} CROSS JOIN m{k}
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT CAST(i + 1 AS BIGINT) AS dim_i, val AS loading FROM v{iters}"
    )


@register(
    "embedding_pca_power",
    oracle=_pca_power_oracle(2),
    doc="Top principal direction of the embedding cloud by power "
    "iteration on the exact-integer Gramian (2 unrolled iterations) — "
    "the spectral audit of an embedding space (dominant-direction "
    "anisotropy). The RowMatrix.computeGramianMatrix strategy: ONE "
    "corpus pass folds into the dim^2-row Gramian (posexplode pair "
    "fan-out, map-side partial agg on dim^2 keys; checkpointed), then "
    "every iteration joins the 4096-row table — corpus never "
    "rescanned, constant-size iteration plans. Renormalization is "
    "floor-div fixed point (DIV ≙ //, verified on negatives), so the "
    "unrolled oracle matches bit-for-bit. See "
    "operators/similarity.py:pca_power_top_component.",
)
def q_embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.similarity import pca_power_top_component

    return pca_power_top_component(load_table(spark, sf_dir, "embeddings"))


def _jl_oracle(n_dims: int = 16, dim: int = 64, k: int = 10, n_queries: int = 20) -> str:
    from ds_mapreduce_spark.operators.dedup import srp_signs

    signs = srp_signs(n_dims, dim)
    rows = ",\n    ".join(
        f"({j}, [{', '.join(str(int(s)) for s in row)}])"
        for j, row in enumerate(signs)
    )
    return f"""
WITH planes(p, s) AS (VALUES
    {rows}
),
qv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
  FROM embeddings
),
pr AS (
  SELECT vec_id,
         list(CAST(list_sum(list_transform(range(1, {dim + 1}),
                  i -> q[i] * s[i])) AS BIGINT) ORDER BY p) AS pv
  FROM qv CROSS JOIN planes GROUP BY vec_id
),
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY ROUND(list_cosine_similarity(a.e, b.e), 6) DESC,
                      b.vec_id) AS r
    FROM qv a JOIN qv b ON a.vec_id < {n_queries} AND a.vec_id <> b.vec_id
  ) WHERE r <= {k}
),
ptop AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY CAST(list_sum(list_transform(range(1, {n_dims + 1}),
                        i -> (a.pv[i] - b.pv[i]) * (a.pv[i] - b.pv[i])))
                      AS BIGINT) ASC, b.vec_id) AS r
    FROM pr a JOIN pr b ON a.vec_id < {n_queries} AND a.vec_id <> b.vec_id
  ) WHERE r <= {k}
),
ov AS (
  SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
  FROM truth t
  JOIN ptop p ON p.query_id = t.query_id AND p.neighbor_id = t.neighbor_id
  GROUP BY t.query_id
)
SELECT q.vec_id AS query_id,
       COALESCE(ov.n_overlap, 0) AS n_overlap,
       CAST(COALESCE(ov.n_overlap, 0) * 1000 AS BIGINT) AS recall_bp
FROM qv q LEFT JOIN ov ON ov.query_id = q.vec_id
WHERE q.vec_id < {n_queries}
"""


@register(
    "knn_jl_recall_eval",
    oracle=_jl_oracle(),
    doc="Johnson-Lindenstrauss dimension-reduction EVAL — the measured "
    "answer to 'how much recall does projecting 64-d -> 16-d cost?': "
    "embeddings are projected through the deterministic ±1 sign matrix "
    "(srp_signs — the same LCG constants the SRP-LSH oracle embeds), "
    "exact-integer projection on quantized components, and per-query "
    "recall@10 is computed between the full-space cosine truth "
    "(knn_bruteforce's ranking verbatim) and the projected-space "
    "integer-L2 top-10. The dedup_lsh_eval discipline applied to dense "
    "retrieval: tune the projection width from DATA, not the JL "
    "epsilon bound. Plan: projection is one map over the corpus; both "
    "rankings are broadcast-queries × corpus with the two-stage local "
    "top-k (no per-query single-task sort); overlap is a 200-row "
    "join. 100 TB: the projected table is the artifact you'd persist — "
    "4x fewer bytes scanned by every downstream probe at the measured "
    "recall cost.",
)
def q_knn_jl_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds_mapreduce_spark.operators.dedup import srp_signs
    from ds_mapreduce_spark.operators.similarity import _ranked_topk, brute_force_topk

    signs = srp_signs(16, 64)
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 10000).cast("bigint"),
        ).alias("q"),
    )
    zero = F.lit(0).cast("bigint")

    def proj():
        cols = []
        for row in signs:
            arr = F.array(*[F.lit(int(s)) for s in row])
            cols.append(
                F.aggregate(
                    F.zip_with(F.col("q"), arr, lambda a, b: a * b),
                    zero,
                    lambda acc, x: acc + x,
                )
            )
        return F.array(*cols)

    p = v.select("vec_id", proj().alias("pv"))
    truth = brute_force_topk(emb, emb.where(F.col("vec_id") < N_QUERIES), k=10).select(
        "query_id", "neighbor_id"
    )
    qp = p.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("pv").alias("qpv")
    )
    dist = F.aggregate(
        F.zip_with(F.col("pv"), F.col("qpv"), lambda a, b: (a - b) * (a - b)),
        zero,
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(qp)
        .crossJoin(p)
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (-dist).alias("score"),
        )
    )
    ptop = _ranked_topk(scored, 10).select("query_id", "neighbor_id")
    ov = truth.join(ptop, ["query_id", "neighbor_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap")
    )
    allq = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id")
    )
    return allq.join(ov, "query_id", "left").select(
        "query_id",
        F.coalesce("n_overlap", F.lit(0)).cast("bigint").alias("n_overlap"),
        (F.coalesce("n_overlap", F.lit(0)) * 1000).cast("bigint").alias("recall_bp"),
    )
