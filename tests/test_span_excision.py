"""Edge semantics of duplicate_span_excision (Lee et al. ExactSubstr
at 5-gram granularity): adjacent-hit merging, within-doc repetition,
full-coverage reconstruction, and sub-n docs. The corpus-level parity
gate covers the driver tables; this pins the hand-checkable cases."""

from __future__ import annotations

import hashlib

from ds_mapreduce_spark.operators.dedup import duplicate_span_excision


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _run(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = duplicate_span_excision(docs, n=5, min_count=2)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_shared_span_merges_overlapping_hits(spark):
    # docs 1 and 2 share a 6-token run -> two overlapping 5-gram hits
    # -> ONE merged span of 6 tokens in each
    shared = "a b c d e f"
    rows = [
        (1, f"u1 u2 u3 {shared} v1 v2 v3"),
        (2, f"w1 w2 {shared} x1 x2 x3 x4"),
        (3, "y1 y2 y3 y4 y5 y6 y7 y8 y9"),
    ]
    got = _run(spark, rows)
    for d, pre in ((1, "u1 u2 u3"), (2, "w1 w2")):
        assert got[d]["n_spans"] == 1
        assert got[d]["n_tokens_removed"] == 6
        assert got[d]["n_tokens_kept"] == got[d]["n_tokens"] - 6
    assert got[1]["retained_md5"] == _md5("u1 u2 u3 v1 v2 v3")
    assert got[2]["retained_md5"] == _md5("w1 w2 x1 x2 x3 x4")
    # clean doc keeps everything, md5 of the full token stream
    assert got[3]["n_spans"] == 0 and got[3]["n_tokens_removed"] == 0
    assert got[3]["retained_md5"] == _md5(rows[2][1])


def test_exact_duplicate_docs_fully_covered(spark):
    text = "t1 t2 t3 t4 t5 t6 t7"
    got = _run(spark, [(1, text), (2, text)])
    for d in (1, 2):
        assert got[d]["n_spans"] == 1
        assert got[d]["n_tokens_removed"] == 7
        assert got[d]["n_tokens_kept"] == 0
        assert got[d]["removed_bp"] == 10000
        assert got[d]["retained_md5"] == _md5("")


def test_within_doc_repetition_counts(spark):
    # the 5-gram 'r1..r5' occurs twice INSIDE one doc -> both
    # occurrences excised (min_count counts occurrences, not docs)
    rep = "r1 r2 r3 r4 r5"
    got = _run(spark, [(1, f"{rep} z1 z2 z3 z4 z5 {rep}")])
    assert got[1]["n_spans"] == 2
    assert got[1]["n_tokens_removed"] == 10
    assert got[1]["retained_md5"] == _md5("z1 z2 z3 z4 z5")


def test_adjacent_spans_merge(spark):
    # two dup 5-grams ending/starting back-to-back (positions 1-5 and
    # 6-10): contiguous removed text is ONE cut
    a, b = "a1 a2 a3 a4 a5", "b1 b2 b3 b4 b5"
    got = _run(spark, [(1, f"{a} {b} tail1"), (2, f"{a} q1 q2 {b}")])
    assert got[1]["n_spans"] == 1
    assert got[1]["n_tokens_removed"] == 10
    assert got[1]["retained_md5"] == _md5("tail1")


def test_sub_n_docs_pass_through(spark):
    got = _run(spark, [(1, "a b c"), (2, "a b c")])
    assert got[1]["n_spans"] == 0
    assert got[1]["n_tokens"] == 3
    assert got[1]["retained_md5"] == _md5("a b c")


def _run_floored(spark, rows, floor):
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = duplicate_span_excision(docs, n=5, min_count=2, min_span_tokens=floor)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_min_span_floor_drops_short_islands(spark):
    # a lone duplicated 5-gram (island length 5) survives a floor of 6;
    # the doc is then CLEAN (0 spans, full-text md5)
    rep = "r1 r2 r3 r4 r5"
    rows = [(1, f"{rep} z1 z2 z3"), (2, f"{rep} y1 y2 y3")]
    got = _run_floored(spark, rows, floor=6)
    for d in (1, 2):
        assert got[d]["n_spans"] == 0
        assert got[d]["n_tokens_removed"] == 0
        assert got[d]["retained_md5"] == _md5(rows[d - 1][1])


def test_min_span_floor_tested_after_merge(spark):
    # two adjacent duplicated 5-grams merge into ONE 10-token island
    # BEFORE the floor test: floor=10 keeps the merged island even
    # though each constituent hit is only 5 tokens (Lee et al.'s rule
    # applies to maximal duplicated passages, not raw marks)
    a, b = "a1 a2 a3 a4 a5", "b1 b2 b3 b4 b5"
    got = _run_floored(spark, [(1, f"{a} {b} tail1"), (2, f"{a} q1 q2 q3 q4 q5 {b}")], floor=10)
    assert got[1]["n_spans"] == 1
    assert got[1]["n_tokens_removed"] == 10
    assert got[1]["retained_md5"] == _md5("tail1")
    # doc 2's two islands are 5 tokens each -> both dropped by the floor
    assert got[2]["n_spans"] == 0
    assert got[2]["retained_md5"] == _md5(f"{a} q1 q2 q3 q4 q5 {b}")


def test_min_span_floor_zero_is_identity(spark):
    # floor=0 must be byte-identical to the unfloored operator
    rep = "r1 r2 r3 r4 r5"
    rows = [(1, f"{rep} z1 z2 z3 z4 z5 {rep}"), (2, f"pre1 pre2 {rep} post1")]
    base = _run(spark, rows)
    floored = _run_floored(spark, rows, floor=0)
    assert base == floored


def _ref_excised_positions(docs_tokens: dict, L: int) -> dict:
    """Independent brute-force reference for the exact-L semantics:
    a position is excised iff it lies inside SOME substring of length
    >= L that occurs >= 2 times corpus-wide (all lengths enumerated —
    the operator only ever looks at length-L windows, so agreement is
    the n=L equivalence theorem, not the same algorithm twice)."""
    from collections import Counter

    max_len = max((len(t) for t in docs_tokens.values()), default=0)
    marked = {d: set() for d in docs_tokens}
    for m in range(L, max_len + 1):
        cnt = Counter()
        for toks in docs_tokens.values():
            for i in range(len(toks) - m + 1):
                cnt[tuple(toks[i : i + m])] += 1
        for d, toks in docs_tokens.items():
            for i in range(len(toks) - m + 1):
                if cnt[tuple(toks[i : i + m])] >= 2:
                    marked[d].update(range(i, i + m))
    return marked


def test_exact_L_equals_bruteforce_duplicated_substring_semantics(spark):
    """dedup_span_excision_exact20's semantics (floor encoded in the
    gram size, md5-keyed): excised positions == positions inside some
    corpus-duplicated substring of length >= L, for EVERY length —
    checked against a reference that enumerates all lengths."""
    L = 6
    texts = {
        # dup1 (3 toks, docs 1+2) touching dup2 (3 toks, docs 1+3):
        # the island in doc 1 is 6 tokens long but NO duplicated
        # substring of length >= 6 exists — exact-L must excise nothing
        1: "p1 p2 s1 s2 s3 t1 t2 t3 q1 q2",
        2: "m1 s1 s2 s3 m2 m3 m4 m5 m6 m7",
        3: "n1 n2 n3 t1 t2 t3 n4 n5 n6 n7",
        # docs 4+5 share a 7-token run -> two overlapping 6-windows,
        # merged span of 7 in each
        4: "a1 a2 a3 a4 a5 a6 a7 b1 b2 b3",
        5: "c1 c2 a1 a2 a3 a4 a5 a6 a7 c3",
        6: "z1 z2 z3 z4 z5 z6 z7 z8 z9 z0",  # clean
    }
    toks = {d: t.split() for d, t in texts.items()}
    ref = _ref_excised_positions(toks, L)
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in duplicate_span_excision(
            docs, n=L, min_count=2, hash_grams=True
        ).collect()
    }
    for d in texts:
        assert out[d]["n_tokens_removed"] == len(ref[d]), (d, ref[d])
        kept = " ".join(
            t for i, t in enumerate(toks[d]) if i not in ref[d]
        )
        assert out[d]["retained_md5"] == _md5(kept), d
    # the discriminating case: the post-merge-floor variant (n=3,
    # floor=6) length-tests the touching short dups TOGETHER and
    # over-excises doc 1; exact-L does not
    floored = {
        r["doc_id"]: r.asDict()
        for r in duplicate_span_excision(
            docs, n=3, min_count=2, min_span_tokens=L
        ).collect()
    }
    assert floored[1]["n_tokens_removed"] == 6  # the merged island
    assert out[1]["n_tokens_removed"] == 0      # the paper's semantics
