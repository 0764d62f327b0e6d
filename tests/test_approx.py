"""Error-bound tests for the approximate aggregates (the rows-only
queries the DuckDB oracle can't check: sketch internals are engine-
specific, but their error CONTRACT is testable against exact answers)
and a recall floor for the IVF ANN path vs the exact brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_mapreduce_spark.plans.registry import load_all
from ds_mapreduce_spark.sources.catalog import load_table

REGISTRY = load_all()


def test_approx_distinct_within_bound(spark, sf_dir):
    """The HLL error curve itself, tighter than the registered query's
    5-rsd boolean: <5% relative error at rsd=0.02."""
    li = load_table(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
            F.countDistinct("l_orderkey").alias("n"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        rel_err = abs(r.approx_orders - r.n) / r.n
        assert rel_err < 0.05, f"{r.l_returnflag}: approx {r.approx_orders} vs {r.n}"


def test_approx_percentile_close_to_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_quantity", F.lit(0.5), 10000).alias("a50"),
            F.approx_percentile("l_quantity", F.lit(0.9), 10000).alias("a90"),
            F.percentile("l_quantity", F.lit(0.5)).alias("p50"),
            F.percentile("l_quantity", F.lit(0.9)).alias("p90"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(float(r.a50) - r.p50) <= 1.0 and abs(float(r.a90) - r.p90) <= 1.0


def test_agg_approx_suite_bounds_all_true(spark, sf_dir):
    """The hash-checkable formulation's invariant: every within_bounds
    boolean the driver compares against TRUE literals is in fact true."""
    out = REGISTRY["agg_approx_suite"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r.hll_within_bounds and r.p50_within_bounds and r.p90_within_bounds, r


def test_ivf_recall_floor(spark, sf_dir):
    """The ANN path must find most of the true neighbors: recall@5 vs
    exact brute force, averaged over the query set, at nprobe=2 of 8
    centroid buckets. The floor is deliberately conservative — the point
    is catching a broken index (recall ~0), not tuning."""
    exact = REGISTRY["knn_bruteforce"].fn(spark, sf_dir)
    ann = REGISTRY["knn_ivf"].fn(spark, sf_dir)
    truth: dict[int, set[int]] = {}
    for r in exact.where(F.col("rnk") <= 5).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    found: dict[int, set[int]] = {}
    for r in ann.where(F.col("rnk") <= 5).collect():
        found.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(truth[q] & found.get(q, set())) / len(truth[q]) for q in truth
    ]
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.5, f"IVF recall@5 collapsed: {avg:.2f}"


def test_hll_rollup_merge_is_consistent_and_bounded(spark, sf_dir):
    """The sketch-merge contract: (a) estimating after hll_union_agg of
    per-group sketches tracks the direct whole-partition sketch within
    2% (EXACT equality only holds in sparse mode; densified HLL_4
    sketches union through an HLL_8 gadget and drift ~1% — measured at
    sf0.01), and (b) the estimate is within 2% of exact."""
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    merged = {
        r.o_orderpriority: r.approx_custs
        for r in o.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .groupBy("o_orderpriority")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_custs"))
        .collect()
    }
    direct = {
        r.o_orderpriority: r.approx_custs
        for r in o.groupBy("o_orderpriority")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("approx_custs"))
        .collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert merged.keys() == direct.keys()
    for k, est in merged.items():
        assert abs(est - direct[k]) / direct[k] < 0.02, (k, est, direct[k])
        assert abs(est - exact[k]) / exact[k] < 0.02, (k, est, exact[k])


def test_pq_adc_recall_floor(spark, sf_dir):
    """ADC ranking over 4-byte PQ codes must beat random by an order of
    magnitude: recall@5 vs exact L2 top-5, averaged over queries. The
    floor is deliberately conservative (random is ~0.01 at |corpus|=500;
    measured 0.23 with the deterministic 16-entry codebook on the
    synthetic no-cluster-structure embeddings — PQ's worst case; a real
    k-means codebook on real embeddings lands far higher): the point is
    catching a broken code/table join, not tuning."""
    from pyspark.sql import Window

    from ds_mapreduce_spark.functions.vector import l2_dist

    adc = REGISTRY["knn_pq_adc"].fn(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where("vec_id < 20").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    w = Window.partitionBy("query_id").orderBy(F.col("dist"), F.col("neighbor_id"))
    ex5 = (
        q.crossJoin(c)
        .where("query_id != neighbor_id")
        .select("query_id", "neighbor_id", l2_dist(F.col("qe"), F.col("ce")).alias("dist"))
        .withColumn("r", F.row_number().over(w))
        .where("r <= 5")
        .collect()
    )
    exact: dict[int, set] = {}
    for r in ex5:
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    got: dict[int, set] = {}
    for r in adc:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert got.keys() == exact.keys()
    recall = sum(len(exact[k] & got[k]) / 5 for k in exact) / len(exact)
    assert recall >= 0.1, recall


def test_cms_one_sided_error_and_mergeability(spark, sf_dir):
    """Count-Min guarantees, asserted on EVERY key (the graded query
    probes only the top-10): (a) estimate >= exact always — the
    deterministic one-sided error; (b) the classic eps-bound
    overcount <= e/width * N holds for the overwhelming majority of
    keys (the delta = e^-depth failure probability is per-key); (c)
    sketches MERGE by elementwise counter addition — sketch(A ∪ B) ==
    sketch(A) + sketch(B) — which is what makes the build one
    associative groupBy and a trivial streaming state."""
    import math

    from pyspark.sql import functions as F

    from ds_mapreduce_spark.plans.stream_queries import cms_counters
    from ds_mapreduce_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    cms = cms_counters(ev, depth=4, width=256)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    probes = exact.select(
        "user_id", "n", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("j").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 256
    )
    est = (
        probes.withColumn("bucket", bucket)
        .join(cms, ["j", "bucket"])
        .groupBy("user_id", "n")
        .agg(F.min("c").alias("est"))
        .collect()
    )
    n_total = sum(r["n"] for r in est)
    eps_bound = math.e / 256 * n_total
    assert all(r["est"] >= r["n"] for r in est)  # (a) never undercounts
    bad = sum(1 for r in est if r["est"] - r["n"] > eps_bound)
    assert bad / len(est) <= math.exp(-4.0) + 0.02, (bad, len(est))  # (b)

    # (c) mergeability: split the stream, build per-slice sketches,
    # merge through the SAME cms_merge the streaming twin maintains
    # state with, compare to the whole-stream sketch
    from ds_mapreduce_spark.plans.stream_queries import cms_merge

    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    merged = cms_merge(cms_counters(a), cms_counters(b))
    whole = sorted(map(tuple, cms.collect()))
    assert sorted(map(tuple, merged.collect())) == whole


def _qsketch_bucket_model(x: int) -> int:
    """Pure-Python model of operators/sketch.py's bucket function —
    the spec the Spark/DuckDB SQL renderings are checked against."""
    if x < 64:
        return x
    m = x.bit_length() - 1
    s = m - 6
    return (s + 1) * 64 + (x >> s) - 64


def _qsketch_decode_model(b: int) -> tuple[int, int]:
    if b < 64:
        return b, b
    s = b // 64 - 1
    lo = (64 + b % 64) << s
    return lo, lo + (1 << s) - 1


def test_qsketch_bucket_properties():
    """The log-bucket function's contract, on the model: buckets are
    MONOTONE in x, PARTITION the domain (decode(bucket(x)) contains x),
    and bucket width is relatively bounded (width <= lo/64 — the 2^-6
    relative-error guarantee). Checked over every boundary-adjacent
    value of every octave up to 2^62, not a random sample."""
    xs = [0, 1, 2, 63, 64, 65]
    for m in range(6, 63):
        for d in (-2, -1, 0, 1, 2):
            x = (1 << m) + d
            if x >= 0:
                xs.append(x)
    xs = sorted(set(xs))
    prev_b = -1
    for x in xs:
        b = _qsketch_bucket_model(x)
        assert b >= prev_b, (x, b, prev_b)  # monotone
        prev_b = b
        lo, hi = _qsketch_decode_model(b)
        assert lo <= x <= hi, (x, b, lo, hi)  # containment
        if b >= 64:
            assert hi - lo + 1 <= lo // 64 + 1, (x, b, lo, hi)  # rel width


def test_qsketch_spark_expr_matches_model(spark):
    """The Spark SQL rendering (length(bin(x)) log2, clamped shifts)
    computes exactly the model bucket on adversarial values — octave
    boundaries, the small-value region, and 62-bit extremes."""
    from ds_mapreduce_spark.operators.sketch import qsketch_bucket

    xs = sorted(
        {0, 1, 63, 64, 127, 128, 129, 4095, 4096, (1 << 62) - 1, 1 << 62}
        | {(1 << m) + d for m in range(6, 63) for d in (-1, 0, 1)}
    )
    df = spark.createDataFrame([(x,) for x in xs], "cents bigint").select(
        "cents", qsketch_bucket("cents").alias("bucket")
    )
    got = {r["cents"]: r["bucket"] for r in df.collect()}
    for x in xs:
        assert got[x] == _qsketch_bucket_model(x), (x, got[x])


def test_qsketch_mergeability_and_bound_on_data(spark, sf_dir):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) bucket-for-bucket
    on the real events stream (the associative property the streaming
    twin's landed state depends on), and the graded query's guarantee
    columns hold: in_bounds everywhere, est range straddles the exact
    value with the 2^-6 relative width."""
    from pyspark.sql import functions as F

    from ds_mapreduce_spark.operators.sketch import (
        qsketch_counters,
        qsketch_from_value_counts,
        qsketch_merge,
        type_cents_counts,
    )
    from ds_mapreduce_spark.plans.registry import load_all
    from ds_mapreduce_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    whole = sorted(map(tuple, qsketch_counters(ev).collect()))
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    merged = qsketch_merge(qsketch_counters(a), qsketch_counters(b))
    assert sorted(map(tuple, merged.collect())) == whole

    # deriving the sketch from the compressed count table (what the
    # batch query does so one scan feeds both sides) is bit-identical
    # to sketching the raw stream — bucket is a pure function of cents
    derived = qsketch_from_value_counts(type_cents_counts(ev))
    assert sorted(map(tuple, derived.collect())) == whole

    rows = load_all()["quantile_sketch_estimates"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["in_bounds"] == 1
        assert r["est_lo_cents"] <= r["exact_cents"] <= r["est_hi_cents"]
        if r["est_lo_cents"] >= 64:
            assert (
                r["est_hi_cents"] - r["est_lo_cents"] + 1
                <= r["est_lo_cents"] // 64 + 1
            )


def test_qsketch_day_range_read_equals_raw_range_sketch(spark, sf_dir):
    """The graded day-range row proves ONE range (the middle third)
    hash-identical to sketching the raw filtered events; this locks
    the general claim the store's docstring makes — ANY contiguous
    day subrange re-aggregated from per-day counters is bucket-for-
    bucket identical to a one-pass sketch of that range (counter
    addition is associative over any day partition of the feed) —
    across the degenerate shapes the graded range never hits: a
    single day at each end, and the full span (which must also equal
    the whole-stream sketch, the rollup identity)."""
    from ds_mapreduce_spark.operators.sketch import (
        qsketch_counters,
        qsketch_day_store,
        qsketch_rollup_store,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.expr("unix_micros(ts) DIV 86400000000")
    )
    store = qsketch_day_store(ev)
    days = sorted(r["day"] for r in store.select("day").distinct().collect())
    dmin, dmax = days[0], days[-1]
    span = dmax - dmin
    ranges = [
        (dmin, dmax),  # full span == whole-stream sketch
        (dmin, dmin),  # single day, left edge
        (dmax, dmax),  # single day, right edge
        (dmin + span // 3, dmin + 2 * span // 3),  # the graded shape
    ]
    whole = sorted(map(tuple, qsketch_counters(ev).collect()))
    for lo, hi in ranges:
        in_range = (F.col("day") >= lo) & (F.col("day") <= hi)
        pruned = sorted(
            map(tuple, qsketch_rollup_store(store.where(in_range)).collect())
        )
        raw = sorted(map(tuple, qsketch_counters(ev.where(in_range)).collect()))
        assert pruned == raw, (lo, hi)
        if (lo, hi) == (dmin, dmax):
            assert pruned == whole


def test_qsketch_bucket_negative_domain_identity(spark):
    """ADVICE r12 pinned as behavior, not just prose: negative inputs
    are DOCUMENTED to degrade to exact identity buckets (the
    ``x < 64`` branch catches them before either engine's log
    rendering — where ``length(bin(x))`` on a negative would read the
    two's-complement string). Pin the three renderings agreeing on
    ``bucket(x) == x`` across the negative domain, so a signed feed
    degrades to exact counting with cross-engine parity intact, never
    to a wrong or divergent bucket."""
    import duckdb

    from ds_mapreduce_spark.operators.sketch import (
        qsketch_bucket,
        qsketch_bucket_sql_duckdb,
    )

    xs = [-1, -2, -63, -64, -65, -4096, -((1 << 62) - 1), -(1 << 62)]
    df = spark.createDataFrame([(x,) for x in xs], "cents bigint").select(
        "cents", qsketch_bucket("cents").alias("bucket")
    )
    got = {r["cents"]: r["bucket"] for r in df.collect()}
    expr = qsketch_bucket_sql_duckdb("x")
    con = duckdb.connect()
    for x in xs:
        assert got[x] == x, (x, got[x])
        dd = con.execute(
            f"SELECT {expr} FROM (SELECT CAST({x} AS BIGINT) AS x)"
        ).fetchone()[0]
        assert dd == x, (x, dd)
