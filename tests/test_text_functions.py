"""Unit tests for text primitives (tokens/shingles/fingerprint) and the
dedup building blocks on hand-computed micro-fixtures (FIXTURES.md)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ds_mapreduce_spark.functions.text import norm_text, portable_fingerprint, shingles, tokens
from ds_mapreduce_spark.operators.dedup import (
    HASH_P,
    SHINGLE_C,
    exact_dedup_groups,
    ngram_jaccard_pairs,
    shingle_profiles,
    simhash_candidate_pairs,
)


def _one(df, col):
    return df.select(F.col(col)).collect()[0][0]


def test_tokens_empty_and_whitespace(spark):
    df = spark.createDataFrame([("",), ("   \t  ",), (" a  b ",)], "text string")
    got = [r[0] for r in df.select(tokens(F.col("text")).alias("t")).collect()]
    assert got == [[], [], ["a", "b"]]


def test_shingles_short_docs_are_empty(spark):
    df = spark.createDataFrame([("a b",), ("a b c",), ("a b c d",)], "text string")
    got = [r[0] for r in df.select(shingles(tokens(F.col("text"))).alias("s")).collect()]
    assert got == [[], ["a b c"], ["a b c", "b c d"]]


def test_shingles_are_distinct(spark):
    df = spark.createDataFrame([("x y x y x y",)], "text string")
    got = _one(df.select(shingles(tokens(F.col("text"))).alias("s")), "s")
    assert sorted(got) == ["x y x", "y x y"]


def test_fingerprint_is_md5_of_canonical_form(spark):
    df = spark.createDataFrame([("  Hello   WORLD  ",)], "text string")
    fp = _one(df.select(portable_fingerprint(F.col("text")).alias("f")), "f")
    assert fp == hashlib.md5(b"hello world").hexdigest()
    canon = _one(df.select(norm_text(F.col("text")).alias("c")), "c")
    assert canon == "hello world"


def test_shingle_profile_hash_matches_python_reference(spark):
    # independent reimplementation of the portable shingle hash
    def py_token_hash(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)

    toks = ["join", "hash", "row", "batch"]
    expected = set()
    for i in range(len(toks) - 2):
        hs = [py_token_hash(t) for t in toks[i : i + 3]]
        expected.add(sum((h % HASH_P) * c for h, c in zip(hs, SHINGLE_C)) % HASH_P)

    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    got = set(_one(shingle_profiles(df), "sh"))
    assert got == expected


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "Same  Text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    out = {r["keep_id"]: r["n_dups"] for r in exact_dedup_groups(df).collect()}
    assert out == {1: 2, 3: 1}  # canonicalization merges 1 and 2


def test_ngram_jaccard_finds_planted_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " extra"
    other = "completely different words in this one here now ok yes"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(df, threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.8
    assert all(3 not in p for p in pairs)


def test_ngram_jaccard_prefilter_keeps_boundary_pair(spark):
    """The size prefilter must be EXACTLY the bound implied by the
    half-up-rounded acceptance predicate, not the raw ratio >= τ: a
    subset pair with sizes (15999, 20000) has Jaccard 0.79995, which
    rounds half-up to 0.8000 — the oracle (no prefilter) keeps it, so
    the operator must too. A strict `min/max >= 0.8` filter (the r2
    bug) drops it: 15999/20000 = 0.79995 < 0.8."""
    import hashlib

    def py_token_hash(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)

    n_big, n_small = 20000, 15999  # smallest integer boundary case
    toks = [f"t{i}x" for i in range(n_big + 2)]  # unique → distinct shingles
    hs = [py_token_hash(t) % HASH_P for t in toks]
    sh = [
        sum(c * h for c, h in zip(SHINGLE_C, hs[i : i + 3])) % HASH_P
        for i in range(n_big)
    ]
    assert len(set(sh)) == n_big, "hash collision broke the fixture"
    # doc_b must share doc_a's block (the min shingle) AND be a strict
    # shingle subset: take the prefix or suffix that contains the argmin
    m = sh.index(min(sh))
    if m < n_small:
        small_toks = toks[: n_small + 2]
    else:
        small_toks = toks[-(n_small + 2):]
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, " ".join(small_toks))], "doc_id long, text string"
    )
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(df, threshold=0.8).collect()}
    assert got == {(1, 2): 0.8}


def test_shingle_df_cap_drops_corpus_hot_shingles(spark):
    """capped_shingle_profiles: a shingle shared by every doc carries no
    dedup signal; with max_shingle_df it must vanish from every profile
    (n_shingles/block recomputed), docs with nothing left drop out, and
    cap=None must be byte-identical to the uncapped profiles."""
    from ds_mapreduce_spark.operators.dedup import capped_shingle_profiles

    boiler = "standard header line here"  # same leading shingles everywhere
    df = spark.createDataFrame(
        [
            (1, boiler + " unique alpha beta"),
            (2, boiler + " unique alpha beta"),   # true dup of 1
            (3, boiler + " totally different tail"),
            (4, boiler),                          # ONLY boilerplate
        ],
        "doc_id long, text string",
    )
    plain = {r["doc_id"]: set(r["sh"]) for r in shingle_profiles(df).collect()}
    hot = plain[4]  # every doc contains doc 4's shingles
    assert all(hot <= shs for shs in plain.values())

    capped = {
        r["doc_id"]: (set(r["sh"]), r["n_shingles"], r["block"])
        for r in capped_shingle_profiles(df, max_shingle_df=3).collect()
    }
    assert 4 not in capped  # nothing left after the cap
    for doc_id, (shs, n, blk) in capped.items():
        assert not (shs & hot), f"doc {doc_id} kept a hot shingle"
        assert shs == plain[doc_id] - hot
        assert n == len(shs) and blk == min(shs)

    nocap = {r["doc_id"]: set(r["sh"])
             for r in capped_shingle_profiles(df, max_shingle_df=None).collect()}
    assert nocap == plain


def test_fuzzy_name_pairs_blocks_on_last_token_both_engines(spark, tmp_path):
    """Spark blocks on the LAST name token; the oracle must too. With
    the generated 2-token part names the 2nd token IS the last one, so
    an oracle blocking on token 2 (the r2 bug) passes silently — this
    fixture uses 3-token names where token 2 differs but the last
    matches, which only agrees if both engines block on the last."""
    import duckdb
    import pandas as pd

    from ds_mapreduce_spark.plans.registry import load_all

    reg = load_all()["fuzzy_name_pairs"]
    names = [
        "alpha beta gamma",   # pairs with the next one: last token equal,
        "alpha zeta gamma",   # 2nd token differs, levenshtein 1
        "alpha beta delta",   # different last token: must NOT pair
        "omega psi",          # 2-token name still blocks on its last
        "omega phi",
    ]
    pd.DataFrame({"p_partkey": range(len(names)), "p_name": names}).to_parquet(
        tmp_path / "part.parquet"
    )
    sdf = reg.fn(spark, str(tmp_path))
    spark_rows = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM '{tmp_path}/part.parquet'")
    cols = sdf.columns
    oracle_rows = sorted(
        tuple(r) for r in con.sql(reg.oracle).df()[cols].itertuples(index=False)
    )
    assert spark_rows == oracle_rows
    assert ("alpha beta gamma", "alpha zeta gamma", 1) in spark_rows
    assert all("delta" not in (a + b) for a, b, _ in spark_rows)


def test_simhash_identical_docs_have_zero_hamming(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "z y x w v u t s")],
        "doc_id long, text string",
    )
    out = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_candidate_pairs(df).collect()}
    assert out[(1, 2)] == 0


class TestConnectedComponents:
    """Edge semantics of operators/dedup.connected_components: pair
    transitivity (the reason components exist at all), component
    isolation, and convergence past the first propagation round."""

    def _run(self, spark, pairs):
        from ds_mapreduce_spark.operators.dedup import connected_components

        edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        out = connected_components(edges, src="doc_a", dst="doc_b")
        return {r["id"]: r["comp"] for r in out.collect()}

    def test_chain_collapses_to_min_label(self, spark):
        # 1-2, 2-3, 3-4: A~B~C~D with no direct A~D pair — the case
        # pairwise dedup gets wrong and components get right. Diameter 3
        # forces multiple propagation rounds.
        got = self._run(spark, [(1, 2), (2, 3), (3, 4)])
        assert got == {1: 1, 2: 1, 3: 1, 4: 1}

    def test_disjoint_components_stay_disjoint(self, spark):
        got = self._run(spark, [(10, 11), (20, 21), (21, 22)])
        assert got == {10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    def test_reversed_and_duplicate_edges(self, spark):
        # direction and multiplicity must not matter
        got = self._run(spark, [(5, 3), (3, 5), (5, 3), (7, 5)])
        assert got == {3: 3, 5: 3, 7: 3}


def test_incremental_dedup_all_three_verdicts(spark):
    """The graded corpus has no exact dups, so the two dup branches are
    pinned here with constructed collisions: doc 10 repeats history
    (modulo canonicalization), docs 11/12 collide with each other."""
    from ds_mapreduce_spark.operators.dedup import incremental_dedup

    history = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "  ALPHA   beta GAMMA "),   # canonical dup of history doc 0
            (11, "zeta eta"),                # new, owns the hash
            (12, "zeta  eta"),               # canonical dup of 11 within batch
            (13, "theta"),                   # plain new
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in incremental_dedup(history, batch).collect()}
    assert out[10]["verdict"] == "dup_of_history"
    assert out[11]["verdict"] == "new"
    assert out[12]["verdict"] == "dup_in_batch" and out[12]["batch_keep"] == 11
    assert out[13]["verdict"] == "new"


def test_bpe_merge_pair_non_overlapping_fold(spark):
    """The BPE merge fold: left-to-right non-overlap ('aaa' + (a,a) ->
    [aa, a]), no cross-boundary matches (['xa','b'] + (a,b) unchanged),
    single-symbol words untouched."""
    from pyspark.sql import functions as F

    from ds_mapreduce_spark.operators.bpe import _merge_pair

    df = spark.createDataFrame(
        [
            (1, ["a", "a", "a"]),
            (2, ["x", "a", "b", "a", "b"]),
            (3, ["xa", "b"]),
            (4, ["q"]),
        ],
        "id int, syms array<string>",
    )
    got = {
        r["id"]: r["m"]
        for r in df.select(
            "id", _merge_pair(F.col("syms"), "a", "a").alias("m")
        ).collect()
    }
    assert got[1] == ["aa", "a"]
    got2 = {
        r["id"]: r["m"]
        for r in df.select(
            "id", _merge_pair(F.col("syms"), "a", "b").alias("m")
        ).collect()
    }
    assert got2[2] == ["x", "ab", "ab"]  # BOTH occurrences merge
    assert got2[3] == ["xa", "b"]  # symbol boundaries respected
    assert got2[4] == ["q"]
