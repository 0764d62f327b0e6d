"""Property-based tests (hypothesis): the engine's operators against
pure-Python reference implementations on randomized small inputs.
Spark jobs are slow, so examples are few but each is adversarially
shrunk by hypothesis on failure."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from ds_mapreduce_spark.operators.mapreduce import (
    WordCount,
    run_mapreduce,
    run_mapreduce_salted,
    word_count,
)
from ds_mapreduce_spark.streaming.sessionize import sessionize_batch

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# printable-ish text lines: words of letters/digits separated by spaces
word_st = st.text(alphabet="abcXYZ019", min_size=1, max_size=6)
line_st = st.lists(word_st, min_size=0, max_size=8).map(" ".join)


@SLOW
@given(lines=st.lists(line_st, min_size=1, max_size=12))
def test_wordcount_three_ways_agree(spark, lines):
    """Declarative, generic-MR, and salted-MR word counts all equal the
    Python Counter ground truth."""
    expected = Counter(w for line in lines for w in line.split())
    docs = spark.createDataFrame([(i, l) for i, l in enumerate(lines)], "doc_id bigint, text string")
    kv = docs.selectExpr("CAST(doc_id AS STRING) AS key", "text AS value")

    declarative = {r.word: r.cnt for r in word_count(docs).collect()}
    generic = {r.key: int(r.value) for r in run_mapreduce(kv, WordCount()).collect()}
    salted = {r.key: int(r.value) for r in run_mapreduce_salted(kv, WordCount(), 4).collect()}

    assert declarative == dict(expected)
    assert generic == dict(expected)
    assert salted == dict(expected)


def _sessions_ref(ts_list: list[int], gap_sec: int) -> list[tuple[int, int, int]]:
    """Pure-Python gap sessionizer: (start_sec, n_events, span_sec)."""
    out = []
    ts = sorted(ts_list)
    start = last = ts[0]
    n = 1
    for t in ts[1:]:
        if t - last > gap_sec:
            out.append((start, n, last - start))
            start, n = t, 1
        else:
            n += 1
        last = t
    out.append((start, n, last - start))
    return out


@SLOW
@given(
    left=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=10, unique=True),
    right=st.lists(st.integers(min_value=0, max_value=1000), min_size=0, max_size=10, unique=True),
)
def test_asof_join_matches_python_reference(spark, left, right):
    from ds_mapreduce_spark.operators.temporal import asof_join

    ldf = spark.createDataFrame([("k", t) for t in left], "k string, t bigint")
    rdf = spark.createDataFrame([("k", t, float(t)) for t in right], "k string, t bigint, v double")
    out = asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t", right_payload=["v"])
    got = {r.t: r.asof_v for r in out.collect()}
    expected = {
        lt: (float(max((rt for rt in right if rt <= lt), default=None))
             if any(rt <= lt for rt in right) else None)
        for lt in left
    }
    assert got == expected


def test_winnowing_guarantee_shared_passage(spark):
    """Winnowing guarantee: two docs sharing a passage of >= w+k-1
    tokens (here 6) share at least one fingerprint; disjoint docs with
    entirely different vocab share none."""
    from ds_mapreduce_spark.operators.dedup import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"intro words {shared} trailing one"),
            (2, f"other prefix tokens {shared}"),
            (3, "completely different vocabulary entirely here now ok"),
        ],
        "doc_id bigint, text string",
    )
    fps = winnowing_fingerprints(docs, k=3, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared 6-token passage must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


@SLOW
@given(
    data=st.dictionaries(
        keys=st.integers(min_value=1, max_value=4),
        values=st.lists(
            st.integers(min_value=0, max_value=100_000), min_size=1, max_size=20, unique=True
        ),
        min_size=1,
        max_size=3,
    )
)
def test_sessionize_matches_python_reference(spark, data):
    rows = [(uid, t * 1_000_000) for uid, ts in data.items() for t in ts]
    df = spark.createDataFrame(rows, "user_id bigint, ts_us bigint").selectExpr(
        "user_id", "timestamp_micros(ts_us) AS ts"
    )
    got = {
        (r.user_id, r.session_start, r.n_events, r.span_sec)
        for r in sessionize_batch(df, gap_sec=1800).collect()
    }
    expected = {
        (uid, s, n, sp)
        for uid, ts in data.items()
        for (s, n, sp) in _sessions_ref(ts, 1800)
    }
    assert got == expected


def test_doc_chunking_reconstructs_every_document(spark, sf_dir):
    """Lossless-coverage invariant of the 80/60 overlapping chunker:
    dropping each chunk's 20-char overlap with its predecessor and
    concatenating in chunk order reproduces every document exactly."""
    from ds_mapreduce_spark.plans.registry import load_all

    reg = load_all()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    chunks: dict[int, list] = {}
    for r in reg["doc_chunking"].fn(spark, sf_dir).collect():
        chunks.setdefault(r["doc_id"], []).append(r)
    assert set(chunks) == set(docs)
    for doc_id, rows in chunks.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        text = docs[doc_id]
        rebuilt = ""
        for r in rows:
            piece = text[r["chunk_start"] : r["chunk_start"] + r["chunk_len"]]
            import hashlib

            assert hashlib.md5(piece.encode()).hexdigest() == r["chunk_md5"]
            rebuilt += piece if not rebuilt else piece[len(rebuilt) - r["chunk_start"]:]
        assert rebuilt == text, doc_id


def test_sequence_packing_conserves_tokens(spark, sf_dir):
    """Packing is a partition of the shard's docs: per (lang, source)
    the sequence token sums equal the shard's total tokens, doc counts
    add up, and seq_ids stay within the range the token sum implies
    (a doc longer than the budget may leave gap sequences, so only the
    bounds are contractual)."""
    from pyspark.sql import functions as F

    from ds_mapreduce_spark.functions.text import tokens
    from ds_mapreduce_spark.plans.registry import load_all

    reg = load_all()
    packed = reg["sequence_packing"].fn(spark, sf_dir).collect()
    truth = {
        (r["lang"], r["source"]): (r["n"], r["t"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size(tokens(F.col("text")))).alias("t"),
        )
        .collect()
    }
    by_shard: dict[tuple, list] = {}
    for r in packed:
        by_shard.setdefault((r["lang"], r["source"]), []).append(r)
    assert set(by_shard) == set(truth)
    for shard, rows in by_shard.items():
        n_docs, n_tokens = truth[shard]
        assert sum(r["n_docs"] for r in rows) == n_docs
        assert sum(r["seq_tokens"] for r in rows) == n_tokens
        seq_ids = sorted(r["seq_id"] for r in rows)
        assert seq_ids[0] == 0 and seq_ids[-1] <= (n_tokens - 1) // 2048


@SLOW
@given(
    vals=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=40
    ),
    divisor=st.integers(min_value=1, max_value=10**7),
)
@example(vals=[-(2**63), -(2**63) + 999_999, 2**63 - 1], divisor=10**6)
def test_idiv_floor_matches_python_floordiv(spark, vals, divisor):
    """idiv_floor (the ONE integer-division primitive every epoch/NTILE/
    shard computation routes through) against Python's // ground truth,
    including negatives (floor, not truncate), >2^53 magnitudes, and the
    int64 boundaries (the DECIMAL-first pmod-subtract means inputs
    within ``n`` of int64 min no longer wrap — ADVICE r4)."""
    from pyspark.sql import functions as F

    from ds_mapreduce_spark.functions.temporal import idiv_floor

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v long")
    got = {
        r.i: r.q for r in df.select("i", idiv_floor(F.col("v"), divisor).alias("q")).collect()
    }
    assert got == {i: v // divisor for i, v in enumerate(vals)}


@SLOW
@given(
    n=st.integers(min_value=1, max_value=400),
    k=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_ntile_distributed_matches_window_randomized(spark, n, k, seed):
    """ntile_over_total_order == Spark's window NTILE for random sizes,
    tile counts, and value permutations (hypothesis-shrunk)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ds_mapreduce_spark.operators.relational import ntile_over_total_order

    rows = [(i, (i * 7 + seed) % n) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(5)
    order = [F.col("v").desc(), F.col("id")]
    got = {r.id: r.t for r in ntile_over_total_order(df, k, order, "t").collect()}
    exp = {
        r.id: r.t
        for r in df.select(
            "id", F.ntile(k).over(Window.orderBy(*order)).cast("bigint").alias("t")
        ).collect()
    }
    assert got == exp


@SLOW
@given(
    vals=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60),
)
def test_prefix_sum_matches_python_cumsum(spark, vals):
    """prefix_sum_over_total_order against Python's running sum over the
    same total order."""
    from pyspark.sql import functions as F

    from ds_mapreduce_spark.operators.relational import prefix_sum_over_total_order

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i long, v long").repartition(4)
    got = {
        r.i: r.cum
        for r in prefix_sum_over_total_order(
            df, [F.col("i")], F.col("v"), "cum"
        ).collect()
    }
    acc, exp = 0, {}
    for i, v in rows:
        acc += v
        exp[i] = acc
    assert got == exp


@SLOW
@given(
    a_iv=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(1, 40)), min_size=1, max_size=10
    ),
    b_iv=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(1, 40)), min_size=1, max_size=10
    ),
    width=st.sampled_from([1, 3, 7, 16]),
)
@example(a_iv=[(0, 16)], b_iv=[(15, 1)], width=16)  # touch at last bucket
@example(a_iv=[(0, 1)], b_iv=[(0, 1)], width=7)  # point-vs-point
@example(a_iv=[(-7, 14)], b_iv=[(-1, 2)], width=7)  # negative bounds
def test_interval_overlap_join_matches_cross_join(spark, a_iv, b_iv, width):
    """The bucketed overlap join equals the naive cross-join + overlap
    filter on random integer intervals — exactly once per overlapping
    pair (the first-shared-bucket rule must neither drop nor duplicate),
    including negative bounds, touching endpoints, and width >> span."""
    from ds_mapreduce_spark.operators.temporal import interval_overlap_join

    a_rows = [(i, lo, lo + n) for i, (lo, n) in enumerate(a_iv)]
    b_rows = [(j, lo, lo + n) for j, (lo, n) in enumerate(b_iv)]
    expected = sorted(
        (ia, jb)
        for ia, alo, ahi in a_rows
        for jb, blo, bhi in b_rows
        if alo < bhi and blo < ahi
    )
    a = spark.createDataFrame(a_rows, "ia bigint, a_lo bigint, a_hi bigint")
    b = spark.createDataFrame(b_rows, "jb bigint, b_lo bigint, b_hi bigint")
    got = sorted(
        (r.ia, r.jb)
        for r in interval_overlap_join(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", width
        ).collect()
    )
    assert got == expected


def test_scd2_change_compression_edges(spark):
    """SCD2 edge semantics: consecutive equal states collapse, same-
    instant updates resolve deterministically (max), and re-emerging
    values open a NEW version (no global dedup)."""
    rows = [
        # user 1: 100 -> 100 (compressed) -> 200 -> 100 again (new version)
        (1, 10, 100),
        (1, 20, 100),
        (1, 30, 200),
        (1, 40, 100),
        # user 2: same-instant conflict (keep max), then a real change
        (2, 10, 7),
        (2, 10, 9),
        (2, 50, 9),  # equal to resolved state -> compressed away
    ]
    from ds_mapreduce_spark.operators.relational import scd2_versions

    src = spark.createDataFrame(rows, "user_id bigint, s bigint, cents bigint")
    versions = scd2_versions(src, "user_id", "s", "cents").drop("is_current")
    got = sorted(map(tuple, versions.collect()))
    assert got == [
        (1, 1, 10, 30, 100),
        (1, 2, 30, 40, 200),
        (1, 3, 40, None, 100),
        (2, 1, 10, None, 9),
    ]


@SLOW
@given(
    data=st.lists(
        st.tuples(st.integers(1, 5), st.integers(0, 20)), min_size=1, max_size=40
    )
)
@example(data=[(1, 0), (1, 7), (2, 7)])   # exact window-edge re-entry
@example(data=[(1, 0), (1, 6)])           # same user twice inside one window
def test_rolling_7d_distinct_matches_bruteforce(spark, data):
    """The window-contribution explode equals the brute-force trailing
    7-day distinct count on random (user, day) activity — exactly-once
    contribution per (user, window), partial leading windows included,
    windows past the last active day excluded."""
    from pyspark.sql import functions as F

    max_d = max(d for _, d in data)
    expected = {}
    for w in range(0, max_d + 1):
        users = {u for u, d in data if w - 6 <= d <= w}
        if users:
            expected[w] = len(users)
    df = spark.createDataFrame(data, "user_id bigint, d bigint")
    ud = df.distinct()
    mx = ud.agg(F.max("d").alias("m"))
    expl = (
        ud.select("user_id", F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("w"))
        .distinct()
        .crossJoin(F.broadcast(mx))
        .where(F.col("w") <= F.col("m"))
    )
    got = {
        r.w: r.n
        for r in expl.groupBy("w").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == expected


def _py_bpe_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Reference left-to-right non-overlapping BPE merge."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@SLOW
@given(
    words=st.lists(
        st.lists(st.sampled_from(["a", "b", "ab", "x"]), min_size=1, max_size=8),
        min_size=1,
        max_size=6,
    ),
    pair=st.sampled_from([("a", "a"), ("a", "b"), ("b", "a"), ("ab", "a")]),
)
@example(words=[["a", "a", "a"]], pair=("a", "a"))
def test_bpe_merge_fold_matches_python_reference(spark, words, pair):
    """The Spark array fold in operators/bpe._merge_pair implements the
    same greedy merge as the sequential reference — including the
    non-overlap subtlety the 'aaa' example pins."""
    from pyspark.sql import functions as F

    from ds_mapreduce_spark.operators.bpe import _merge_pair

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id int, syms array<string>"
    )
    got = {
        r["id"]: r["m"]
        for r in df.select(
            "id", _merge_pair(F.col("syms"), pair[0], pair[1]).alias("m")
        ).collect()
    }
    for i, w in enumerate(words):
        assert got[i] == _py_bpe_merge(w, pair[0], pair[1]), (w, pair)


def _uf_min_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find ground truth: min node id per component, for nodes
    that appear in at least one edge (the connected_components
    contract — isolated nodes never enter the label table)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


_cc_edge_st = st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
    lambda t: t[0] != t[1]
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(_cc_edge_st, min_size=1, max_size=10),
    batches=st.lists(st.integers(0, 3), min_size=10, max_size=10),
)
# a chain grown one edge per batch in reverse order: every fold merges
# two landed components through their star edges
@example(
    edges=[(3, 4), (2, 3), (1, 2), (0, 1)], batches=[0, 1, 2, 3] + [0] * 6
)
# one batch merging THREE landed components at once
@example(
    edges=[(0, 1), (2, 3), (4, 5), (1, 2), (3, 4)],
    batches=[0, 0, 0, 1, 1] + [0] * 5,
)
def test_cc_fold_any_chunking_matches_union_find(spark, edges, batches):
    """cc_fold (the streaming connected-components twin's per-batch
    fold) applied over ANY chunking of an edge stream, starting from an
    empty partition, lands exactly the union-find min-id labels of the
    full edge set — CC(star(CC(E1)) u E2) = CC(E1 u E2), including
    folds whose batch is empty (untouched partition passes through)."""
    from ds_mapreduce_spark.operators.dedup import cc_fold

    expected = _uf_min_labels(edges)
    assign = batches[: len(edges)]
    labels = spark.createDataFrame([], "id bigint, comp bigint")
    for b in range(max(assign) + 1):
        batch_edges = [e for e, bb in zip(edges, assign) if bb == b]
        edf = spark.createDataFrame(batch_edges, "doc_a bigint, doc_b bigint")
        labels = cc_fold(labels, edf)
    got = {r.id: r.comp for r in labels.collect()}
    assert got == expected, (edges, assign)
