"""Iterative BPE tokenizer TRAINING (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"): the merge-rule
loop on top of the single-iteration pair census ``bpe_pair_merge_stats``
already ships.

The classic distributed-BPE optimization carries the whole loop: all
work runs on the DISTINCT-WORD table weighted by word frequency — the
corpus is scanned once for the word census and never again, so each
merge iteration costs O(|vocab| · max_word_len), not O(corpus).

Scale (100 TB): |vocab| is millions however big the corpus (Heaps'
law), so per-iteration state is a small checkpointed table; the pair
census is one partial-aggregated shuffle over |vocab|-sized pair rows;
the merge apply is a map-only array fold. The per-iteration argmax is
ONE bounded driver-side row (the merge RULE — the artifact tokenizer
training exists to produce), the graph_pagerank_converged scalar
precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _merge_pair(syms, a: str, b: str):
    """Left-to-right non-overlapping BPE merge of adjacent (a, b) into
    a single symbol, as a pure array fold: append each symbol unless
    the accumulated tail is `a` and the symbol is `b` (after a merge
    the tail becomes `ab` != `a`, so non-overlap is automatic — 'aaa'
    with pair (a,a) folds to [aa, a], the BPE contract)."""
    return F.aggregate(
        F.slice(syms, 2, F.size(syms) - 1),
        F.slice(syms, 1, 1),
        lambda acc, s: F.when(
            (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _train_vocab(docs: DataFrame, pattern: str, n_merges: int):
    """The shared training loop: distinct-word vocab (w, syms, freq)
    folded through ``n_merges`` argmax merges. Returns
    (vocabs, rules): ``vocabs`` is the LIST of n_merges+1 checkpointed
    vocab states (v0 .. v_n — ``bpe_train_merges`` reports each step's
    symbol census from its own state, which is why intermediates are
    returned; ``bpe_encode_census`` uses only ``vocabs[-1]``, each a
    small vocab-sized checkpoint) and ``rules`` = [(a, b, cnt), ...]
    in learn order.

    Words containing U+001F are excluded from training on BOTH sides:
    the oracle's fold joins symbols with chr(31), and a separator-
    bearing "word" (a lone control char under _BPE_PATTERN) would
    round-trip through string_split as two empty symbols. A control
    char is tokenizer noise, not a merge candidate — dropping it is
    the semantics we want, mirrored in the shared oracle CTEs.

    Symbols split by CODEPOINT (regexp_extract_all with DOTALL '.',
    which Java regex matches per code point): split(w, '') would yield
    UTF-16 code units, handing a single astral-plane char (emoji) a
    2-symbol surrogate-half array — a bogus pair the codepoint-based
    DuckDB oracle (substr(w, i, 1)) never sees. '(?s)' is REQUIRED:
    plain '.' excludes the Unicode line terminators U+2028/U+2029/
    U+0085, which Java \\s does NOT cover, so _BPE_PATTERN's
    [^a-zA-Z0-9\\s] branch still extracts them as 1-char words — an
    undotted split returns syms=[] for those words (Spark) while the
    substr-based oracle sees one symbol, and an all-terminator doc
    then divides by n_char_tokens=0 in ``bpe_encode_census``.
    """
    words = docs.select(
        F.explode(F.regexp_extract_all("text", F.lit(pattern), 1)).alias("w")
    ).where(~F.col("w").contains("\x1f"))
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "w",
            F.expr("regexp_extract_all(w, '(?s)(.)', 1)").alias("syms"),
            "freq",
        )
        .localCheckpoint(eager=True)
    )
    rules = []
    vocabs = [vocab]
    for _ in range(n_merges):
        pairs = vocab.where(F.size("syms") >= 2).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda j: F.struct(
                        F.element_at(F.col("syms"), j.cast("int")).alias("a"),
                        F.element_at(
                            F.col("syms"), (j + 1).cast("int")
                        ).alias("b"),
                    ),
                )
            ).alias("p"),
            "freq",
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .first()
        )
        rules.append((best["a"], best["b"], best["cnt"]))
        vocab = vocab.select(
            "w", _merge_pair(F.col("syms"), best["a"], best["b"]).alias("syms"),
            "freq",
        ).localCheckpoint(eager=True)
        vocabs.append(vocab)
    return vocabs, rules


def bpe_train_merges(
    docs: DataFrame, pattern: str, n_merges: int = 3
) -> DataFrame:
    """Train ``n_merges`` BPE merge rules; one output row per learned
    rule: (step, sym_a, sym_b, merged, n_occurrences,
    n_symbol_occurrences) where n_occurrences is the winning pair's
    corpus-weighted adjacency count BEFORE the merge and
    n_symbol_occurrences the corpus symbol total AFTER it (each merge
    occurrence shrinks the total by its non-overlapping apply count).

    Per iteration (see ``_train_vocab``, shared with
    ``bpe_encode_census``): (1) adjacent-pair census over the symbol
    arrays weighted by word freq (one shuffle, map-side partial agg
    absorbs the hot pairs); (2) argmax via TakeOrdered(1) → one
    bounded driver row, tie-broken (count DESC, a ASC, b ASC)
    identically to the oracle; (3) map-only fold applies the merge;
    the new vocab state is localCheckpoint'ed so iteration plans stay
    constant-size (the pagerank discipline). Ties and folds are
    engine-deterministic, so the DuckDB oracle unrolls the same loop
    with list_reduce.
    """
    vocabs, rules = _train_vocab(docs, pattern, n_merges)
    step_rows = []
    for step, ((a, b, cnt), vocab) in enumerate(zip(rules, vocabs[1:]), 1):
        step_rows.append(
            vocab.agg(
                F.sum(F.col("freq") * F.size("syms"))
                .cast("bigint")
                .alias("n_symbol_occurrences")
            ).select(
                F.lit(step).cast("bigint").alias("step"),
                F.lit(a).alias("sym_a"),
                F.lit(b).alias("sym_b"),
                F.lit(a + b).alias("merged"),
                F.lit(cnt).cast("bigint").alias("n_occurrences"),
                "n_symbol_occurrences",
            )
        )
    out = step_rows[0]
    for r in step_rows[1:]:
        out = out.unionByName(r)
    return out


def segment_words_with_rules(words: DataFrame, rules) -> DataFrame:
    """(w) -> (w, n_char, n_bpe): apply FROZEN merge rules to each
    distinct word via the shared ``_merge_pair`` fold — rule
    application is deterministic per word and corpus-independent, so
    this reproduces exactly the symbol counts the training vocab holds
    for any word the rules were trained on. This is the tokenizer
    APPLY primitive the streaming twin needs: a stream cannot re-train,
    it encodes against rules learned offline (the IVF/kmeans
    frozen-artifact pattern). Map-only — n_char is captured from the
    pre-merge split and THREADED through the fold as a column (no
    self-join, no second derivation of the input); cost
    O(|rules| · word_len) per input word. Callers pass DISTINCT
    words; a duplicate input row simply yields a duplicate output
    row (per-row map, nothing multiplies)."""
    out = words.select(
        "w", F.expr("regexp_extract_all(w, '(?s)(.)', 1)").alias("syms")
    ).select("w", F.size("syms").cast("bigint").alias("n_char"), "syms")
    for a, b, *_ in rules:
        out = out.select(
            "w", "n_char", _merge_pair(F.col("syms"), a, b).alias("syms")
        )
    return out.select(
        "w", "n_char", F.size("syms").cast("bigint").alias("n_bpe")
    )


def encode_census_rows(
    docs: DataFrame, pattern: str, segmented: DataFrame
) -> DataFrame:
    """The shared encode tail (batch query AND streaming twin): join
    the (doc_id, word) stream onto a precomputed per-word segmentation
    table ``segmented`` = (w, n_char, n_bpe) and aggregate per doc.
    Vocab-sized join (Heaps' law), AQE decides the strategy; the
    corpus pays one tokenize scan + one doc_id agg. Exact integers;
    saved_bp is half-up fixed-point (CLAUDE.md ratio rule)."""
    dw = docs.select(
        "doc_id",
        "lang",
        F.explode(F.regexp_extract_all("text", F.lit(pattern), 1)).alias("w"),
    ).where(~F.col("w").contains("\x1f"))
    return (
        dw.join(segmented, "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_char").cast("bigint").alias("n_char_tokens"),
            F.sum("n_bpe").cast("bigint").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "lang",
            "n_words",
            "n_char_tokens",
            "n_bpe_tokens",
            F.expr(
                "(20000 * (n_char_tokens - n_bpe_tokens) + n_char_tokens)"
                " DIV (2 * n_char_tokens)"
            ).alias("saved_bp"),
        )
    )


def bpe_encode_census(
    docs: DataFrame, pattern: str, n_merges: int = 3
) -> DataFrame:
    """ENCODE the corpus with the learned merges — the apply side of
    tokenizer training, closing the loop bpe_train_merges opens: train
    ``n_merges`` rules (same ``_train_vocab`` call, bit-identical
    rules), then score every document by what the tokenizer does to
    it. One row per document that has >= 1 trainable word:
      (doc_id, lang, n_words, n_char_tokens, n_bpe_tokens, saved_bp)
    where n_char_tokens is the pre-merge symbol count (codepoints),
    n_bpe_tokens the post-merge count, and saved_bp the half-up
    basis-point compression the merges bought.

    The classic distributed-tokenizer-apply shape: segmentation is
    computed ONCE PER DISTINCT WORD (the final vocab already holds
    each word's merged symbol array — encoding is a lookup, not a
    re-fold), then joined back onto the (doc_id, word) stream on the
    word key — a vocab-sized join (Heaps' law: vocab ~ millions at
    100 TB), NOT broadcast, AQE decides; the corpus pays one
    re-tokenize scan + one doc_id agg. Exact integer output only.
    """
    vocabs, _ = _train_vocab(docs, pattern, n_merges)
    final = vocabs[-1].select(
        "w",
        F.expr("size(regexp_extract_all(w, '(?s)(.)', 1))")
        .cast("bigint")
        .alias("n_char"),
        F.size("syms").cast("bigint").alias("n_bpe"),
    )
    return encode_census_rows(docs, pattern, final)
