"""Similarity search over embedding columns (E8 + BASELINE.json).

Two tiers, matching how ANN is actually deployed on a 100 TB corpus:

- ``brute_force_topk``: exact top-k by cosine. The query set is
  broadcast (it is small by construction); the corpus is scanned once,
  scored JVM-side, and reduced with a per-query top-k window. Cost is
  O(|corpus| × |queries| × dim) FLOPs but only ONE corpus scan and the
  shuffle carries k rows per (query, partition) — this is the correct
  exact baseline at any corpus size, and the first thing to run when
  validating an ANN index.

- ``ivf_topk``: inverted-file ANN. Vectors are assigned to their
  nearest centroid (argmax dot, deterministic tie-break) at "build"
  time; a query probes only its ``nprobe`` nearest centroid buckets.
  Corpus scan cost drops by ~n_centroids/nprobe. Centroid assignment
  is an embarrassingly-parallel map; the probe is an equi-join on
  centroid id — both shuffle-scalable. (Here centroids are taken
  deterministically from the corpus itself rather than k-means-trained,
  which keeps the operator oracle-checkable; the plumbing is identical.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ds_mapreduce_spark.functions.vector import dot, l2_norm


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """Deterministic per-query top-k: rounded score desc, id asc.

    Two-stage so no single task ever sorts a query's full score list:
    stage 1 takes the local top-k within every (query, input-partition)
    — parallelism |queries|×|partitions|; stage 2 merges the surviving
    k×|partitions| rows per query. With a single-stage window, all
    |corpus| scores for one query land in ONE task — the classic
    top-k skew trap at scale.
    """
    local = scored.withColumn("__p", F.spark_partition_id())
    order = [F.col("score").desc(), F.col("neighbor_id").asc()]
    w1 = Window.partitionBy("query_id", "__p").orderBy(*order)
    survivors = (
        local.withColumn("__r", F.row_number().over(w1)).where(F.col("__r") <= k).drop("__p", "__r")
    )
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return survivors.withColumn("rnk", F.row_number().over(w2)).where(F.col("rnk") <= k)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exact cosine top-k. ``queries``/``corpus``: (vec_id, embedding).

    Norms are computed once per row before the broadcast product
    (identical doubles to a per-pair cosine at 1/3 the FLOPs)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        l2_norm(F.col("embedding")).alias("q_nrm"),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        l2_norm(F.col("embedding")).alias("c_nrm"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm")), 6
            ).alias("score"),
        )
    )
    return _ranked_topk(scored, k)


def assign_to_centroids(corpus: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, embedding, centroid_id): nearest centroid by dot product
    (rounded, ties to the lowest centroid id — fully deterministic)."""
    c = centroids.select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cent_emb")
    )
    scored = corpus.crossJoin(F.broadcast(c)).select(
        "vec_id",
        "embedding",
        "centroid_id",
        F.round(dot(F.col("embedding"), F.col("cent_emb")), 6).alias("affinity"),
    )
    # argmax as max_by over (affinity, -centroid_id): partial-aggregatable,
    # so the shuffle carries one row per vector per task — a sort-window
    # formulation would shuffle the full |corpus|×|centroids| score matrix
    best = F.max_by(
        F.struct("centroid_id", "embedding"),
        F.struct(F.col("affinity").alias("a"), (-F.col("centroid_id")).alias("tie")),
    )
    return (
        scored.groupBy("vec_id")
        .agg(best.alias("__b"))
        .select("vec_id", F.col("__b.embedding").alias("embedding"), F.col("__b.centroid_id").alias("centroid_id"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN: probe the ``nprobe`` best centroid buckets per query.

    ``assigned`` lets a caller pass an ALREADY-built inverted index
    (vec_id, embedding, centroid_id) instead of assigning ``corpus``
    inline — the streaming twin (``run_streaming_ivf_index``) maintains
    that index as state and probes it here, so batch and stream share
    the probe verbatim."""
    if assigned is None:
        assigned = assign_to_centroids(corpus, centroids)

    c = centroids.select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cent_emb")
    )
    q_scored = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    ).crossJoin(F.broadcast(c)).select(
        "query_id",
        "q_emb",
        "centroid_id",
        F.round(dot(F.col("q_emb"), F.col("cent_emb")), 6).alias("affinity"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("affinity").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q_scored.withColumn("__r", F.row_number().over(wq))
        .where(F.col("__r") <= nprobe)
        .select("query_id", "q_emb", "centroid_id", l2_norm(F.col("q_emb")).alias("q_nrm"))
    )

    scored = (
        probes.join(assigned.withColumn("c_nrm", l2_norm(F.col("embedding"))), "centroid_id")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("c_nrm")), 6
            ).alias("score"),
        )
    )
    return _ranked_topk(scored, k)


def _sub_slices(df: DataFrame, id_alias: str, n_sub: int, sub_dim: int) -> DataFrame:
    """(id, sub_id, sv): each vector split into n_sub contiguous
    sub_dim-length slices — a map-only explode (n_sub rows per vector)."""
    return (
        df.select(F.col("vec_id").alias(id_alias), "embedding")
        .select(
            id_alias,
            F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("sub_id"),
            F.col("embedding"),
        )
        .select(
            id_alias,
            "sub_id",
            F.slice(
                "embedding", F.col("sub_id") * sub_dim + 1, F.lit(sub_dim)
            ).alias("sv"),
        )
    )


def pq_assign(
    corpus: DataFrame, codebook_source: DataFrame, n_sub: int = 4, sub_dim: int = 16
) -> DataFrame:
    """Product-quantization code assignment: (vec_id, sub_id, code).

    The embedding is split into ``n_sub`` subspaces; each sub-vector is
    assigned its nearest codebook entry by Euclidean distance (rounded
    6dp, ties to the lowest code — fully deterministic). Codebook
    entries are the corresponding slices of ``codebook_source``'s
    vectors (code = vec_id), taken deterministically from the corpus so
    the operator stays oracle-checkable — the plumbing is identical to
    a k-means-trained codebook.

    100 TB story: PQ is THE memory-scale path for vector search — a
    64-dim float vector (256 B) compresses to n_sub single-byte codes,
    so a trillion-vector index fits where raw vectors can't. The
    codebook (n_sub × |codes| rows) broadcasts; assignment is a
    map-side join + a partial-aggregatable min_by argmin (the shuffle
    carries one row per (vector, subspace) per task, never the
    |corpus|×|codes| score matrix).
    """
    from ds_mapreduce_spark.functions.vector import l2_dist

    v = _sub_slices(corpus, "vec_id", n_sub, sub_dim)
    c = _sub_slices(codebook_source, "code", n_sub, sub_dim).withColumnRenamed(
        "sv", "cv"
    )
    scored = v.join(F.broadcast(c), "sub_id").select(
        "vec_id",
        "sub_id",
        "code",
        F.round(l2_dist(F.col("sv"), F.col("cv")), 6).alias("d"),
    )
    best = F.min_by(F.col("code"), F.struct(F.col("d"), F.col("code")))
    return scored.groupBy("vec_id", "sub_id").agg(best.alias("code"))


def quantized_sub_slices(
    emb: DataFrame, id_alias: str, n_sub: int, sub_dim: int
) -> DataFrame:
    """(id, sub_id, sv): integer-quantized sub-vectors — components
    floor(x·1e4) BIGINT (the embedding_norm_stats / kmeans convention,
    so distances and means stay exact integers that hash identically
    cross-engine), then split into n_sub contiguous sub_dim slices.
    Map-only, n_sub rows per vector."""
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 10000).cast("bigint"),
    )
    return (
        emb.select(F.col("vec_id").alias(id_alias), qv.alias("qv"))
        .select(
            id_alias,
            F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("sub_id"),
            F.col("qv"),
        )
        .select(
            id_alias,
            "sub_id",
            F.slice("qv", F.col("sub_id") * sub_dim + 1, F.lit(sub_dim)).alias("sv"),
        )
    )


def _int_sq_dist(a, b):
    zero = F.lit(0).cast("bigint")
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), zero, lambda acc, v: acc + v
    )


def pq_train_codebook(subs: DataFrame, k: int, iters: int) -> DataFrame:
    """Per-subspace Lloyd k-means codebook training, integer-exact —
    the training half of product quantization (the OPQ/IVFPQ codebook
    step), reusing kmeans_lloyd_refine's arithmetic with sub_id as an
    extra key so ALL subspaces train in one plan: exact integer squared
    L2 on quantized components, argmin via a (vec_id, sub_id) window
    tie-broken by code id, per-dim centroid means floor(double-div) —
    bit-identical in DuckDB, so an unrolled oracle hash-checks it.

    Seeds: each subspace's first k vec_id slices (code = seed vec_id).
    Per iteration: broadcast the (n_sub·k)-row codebook × one pass over
    the sub-sliced corpus, one |corpus·n_sub|-key window shuffle for
    the argmin, one (n_sub·k·sub_dim)-row mean agg; new centroids are
    localCheckpoint'ed so iteration plans stay constant-size. 100 TB:
    scan-dominated with tiny broadcasts — in practice codebooks train
    on a sample, then ``pq_assign``-style encoding streams the full
    corpus; both halves share this plumbing. Returns (sub_id, cid, cv).
    """
    from pyspark.sql import Window

    cent = subs.where(F.col("vec_id") < k).select(
        "sub_id", F.col("vec_id").alias("cid"), F.col("sv").alias("cv")
    )
    w = Window.partitionBy("vec_id", "sub_id").orderBy("dist", "cid")
    for _ in range(iters):
        assigned = (
            subs.join(F.broadcast(cent), "sub_id")
            .select(
                "vec_id",
                "sub_id",
                "sv",
                "cid",
                _int_sq_dist(F.col("sv"), F.col("cv")).alias("dist"),
            )
            .withColumn("r", F.row_number().over(w))
            .where(F.col("r") == 1)
        )
        cent = (
            assigned.select("sub_id", "cid", F.posexplode("sv").alias("i", "val"))
            .groupBy("sub_id", "cid", "i")
            .agg(
                F.floor(F.sum("val").cast("double") / F.count(F.lit(1)))
                .cast("bigint")
                .alias("m")
            )
            .groupBy("sub_id", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s["m"]
                ).alias("cv")
            )
            .localCheckpoint(eager=True)
        )
    return cent


def pq_encode_with_codebook(subs: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, sub_id, code, dist): nearest trained-codebook entry per
    sub-vector — exact integer squared L2, ties to the lowest code; the
    broadcast-join + partial-aggregatable min_by shape of pq_assign.
    ``dist`` is the chosen entry's distance (= MIN(d), since the
    tie-break only discriminates equal distances) — the per-subspace
    quantization error."""
    scored = subs.join(F.broadcast(cent), "sub_id").select(
        "vec_id",
        "sub_id",
        F.col("cid").alias("code"),
        _int_sq_dist(F.col("sv"), F.col("cv")).alias("d"),
    )
    best = F.min_by(F.col("code"), F.struct(F.col("d"), F.col("code")))
    return scored.groupBy("vec_id", "sub_id").agg(
        best.alias("code"), F.min("d").alias("dist")
    )


def pca_power_top_component(
    emb: DataFrame, dim: int = 64, iters: int = 2, quant: int = 10_000
) -> DataFrame:
    """Top principal direction of the embedding cloud by power
    iteration on the (uncentered) Gramian — the spectral summary an
    embedding-space audit starts with (dominant-direction collapse is
    the classic anisotropy pathology of learned embeddings).

    Exact integer arithmetic end to end, so a DuckDB oracle unrolls
    the same loop bit-for-bit: components quantized floor(x*quant)
    BIGINT, G[i,j] = sum_n q_i*q_j exact BIGINT (|q|<=2e4 ->
    products<=4e8; safe to n ~ 2e9 rows per the BIGINT budget, DECIMAL
    beyond), v0 = all-ones at `quant` scale, and each iteration
    renormalizes w = G.v to ~quant scale by w DIV greatest(max|w| DIV
    quant, 1) — floor-division semantics shared by both engines (the
    interp-resample precedent verified DIV ≙ // on negatives).

    Plan shape — the RowMatrix.computeGramianMatrix strategy: the
    corpus is read ONCE into the dim^2-row Gramian (posexplode pair
    fan-out, partial agg absorbs the dim^2 keys map-side;
    localCheckpoint'ed), then every iteration is a join+groupBy on the
    dim^2-row table + a 1-row max — constant-size plans, corpus never
    rescanned (matrix-free G.v re-reads the corpus per iteration;
    wrong trade at 100 TB for dim^2 << corpus). Returns (dim_i BIGINT
    1-based, loading BIGINT fixed-point).
    """
    gram = pca_gramian_partial(emb, quant=quant).localCheckpoint(eager=True)
    return pca_power_from_gramian(gram, iters=iters, quant=quant)


def pca_gramian_partial(emb: DataFrame, quant: int = 10_000) -> DataFrame:
    """(pi, pj, g): the exact-integer Gramian of a vector slice — an
    ASSOCIATIVE sufficient statistic (sums of outer products), so
    partials from disjoint slices merge by per-(pi, pj) SUM: the
    property the streaming twin (run_streaming_pca_gramian) maintains
    its versioned state with."""
    q = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * quant).cast("bigint"),
        ).alias("qv"),
    )
    qi = q.select("vec_id", F.posexplode("qv").alias("pi", "xi"))
    qj = q.select("vec_id", F.posexplode("qv").alias("pj", "xj"))
    return (
        qi.join(qj, "vec_id")
        .groupBy("pi", "pj")
        .agg(F.sum(F.col("xi") * F.col("xj")).cast("bigint").alias("g"))
    )


def pca_gramian_merge(parts: DataFrame) -> DataFrame:
    """Merge unioned Gramian partials back to one row per (pi, pj)."""
    return parts.groupBy("pi", "pj").agg(
        F.sum("g").cast("bigint").alias("g")
    )


def pca_power_from_gramian(
    gram: DataFrame, iters: int = 2, quant: int = 10_000
) -> DataFrame:
    """Power iteration as a pure function of the dim^2-row Gramian —
    shared verbatim by the batch query and the streaming twin."""
    v = (
        gram.select(F.col("pi").alias("i"))
        .distinct()
        .withColumn("val", F.lit(quant).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        w = (
            gram.join(v.select(F.col("i").alias("pj"), "val"), "pj")
            .groupBy("pi")
            .agg(F.sum(F.col("g") * F.col("val")).cast("bigint").alias("s"))
        )
        m = w.agg(F.max(F.abs(F.col("s"))).cast("bigint").alias("m"))
        v = (
            w.crossJoin(F.broadcast(m))
            .select(
                F.col("pi").alias("i"),
                F.expr(f"s DIV greatest(m DIV {quant}, 1)")
                .cast("bigint")
                .alias("val"),
            )
            .localCheckpoint(eager=True)
        )
    return v.select(
        (F.col("i") + 1).cast("bigint").alias("dim_i"),
        F.col("val").alias("loading"),
    )


def quantize_embeddings(emb: DataFrame, quant: int = 10_000) -> DataFrame:
    """(vec_id, qv): components quantized floor(x*quant) BIGINT — the
    repo's exact-integer embedding convention (kmeans/SemDeDup/PQ)."""
    return emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * quant).cast("bigint"),
        ).alias("qv"),
    )


def lloyd_seed_centroids(emb: DataFrame, k: int, quant: int = 10_000) -> DataFrame:
    """The deterministic seeds (first k vec_ids) as a (cid, cv) table."""
    return (
        quantize_embeddings(emb, quant)
        .where(F.col("vec_id") < k)
        .select(F.col("vec_id").alias("cid"), F.col("qv").alias("cv"))
    )


def lloyd_assign(v: DataFrame, cent: DataFrame) -> DataFrame:
    """Argmin assignment of quantized vectors to broadcast centroids:
    (vec_id, qv, cid, dist), exact-integer squared L2, ties (dist, cid)."""
    zero = F.lit(0).cast("bigint")
    dist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        zero,
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        v.crossJoin(F.broadcast(cent))
        .select("vec_id", "qv", "cid", dist.alias("dist"))
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .drop("r")
    )


def lloyd_step_partial(v: DataFrame, cent: DataFrame) -> DataFrame:
    """The ASSOCIATIVE partial of one Lloyd update against FROZEN
    centroids: per-(cid, dim) component sum + member count,
    (cid, i, s, c). Partials from any chunking of the corpus merge by
    summation (`lloyd_step_merge`) to the full-corpus statistic — the
    contract the streaming twin's state maintenance rests on."""
    return (
        lloyd_assign(v, cent)
        .select("cid", F.posexplode("qv").alias("i", "val"))
        .groupBy("cid", "i")
        .agg(
            F.sum("val").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("c"),
        )
    )


def lloyd_step_merge(*parts: DataFrame) -> DataFrame:
    """Merge (cid, i, s, c) partials by summation (associative,
    commutative — any micro-batching converges)."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("cid", "i").agg(
        F.sum("s").cast("bigint").alias("s"),
        F.sum("c").cast("bigint").alias("c"),
    )


def lloyd_step_centroids(state: DataFrame) -> DataFrame:
    """Fold merged (cid, i, s, c) state into the next centroids
    (cid, cv): per-dim mean floor(double-div of exactly-representable
    ints) — bit-identical in DuckDB."""
    return (
        state.select(
            "cid",
            "i",
            F.floor(F.col("s").cast("double") / F.col("c"))
            .cast("bigint")
            .alias("m"),
        )
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "m"))),
                lambda s: s["m"],
            ).alias("cv")
        )
    )


def lloyd_centroids(
    emb: DataFrame, k: int = 8, iters: int = 2, quant: int = 10_000
) -> DataFrame:
    """Lloyd k-means centroid TRAINING in exact integer arithmetic —
    the (cid, cv) table `kmeans_lloyd_refine` derives its final
    assignment from, extracted so other consumers (trained-centroid
    SemDeDup, the streaming twin) share one implementation and one set
    of conventions: components quantized floor(x*quant) BIGINT,
    squared-L2 distances exact integer folds, assignment argmin
    tie-broken (dist, cid), per-dim centroid means floor(double-div of
    exactly-representable ints) — every step bit-identical in DuckDB,
    so callers can unroll the training loop into an oracle CTE chain.

    Seeds: the first k vec_ids. Per iteration: broadcast k centroids ×
    one corpus scan (row_number argmin window), posexplode to
    (cid, dim) partial means, collect back to k rows — new centroids
    localCheckpoint'ed so iteration plans stay constant-size (the
    pagerank discipline). Each iteration composes
    ``lloyd_step_partial`` -> ``lloyd_step_merge`` ->
    ``lloyd_step_centroids``, the SAME functions
    ``run_streaming_kmeans_centroids`` maintains incrementally.
    100 TB: scan-dominated with k-row broadcasts; mini-batch drop-in
    if iterations must shrink.
    """
    v = quantize_embeddings(emb, quant)
    cent = lloyd_seed_centroids(emb, k, quant)
    for _ in range(iters):
        cent = lloyd_step_centroids(
            lloyd_step_merge(lloyd_step_partial(v, cent))
        ).localCheckpoint(eager=True)
    return cent
