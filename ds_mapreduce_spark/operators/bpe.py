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


def bpe_train_merges(
    docs: DataFrame, pattern: str, n_merges: int = 3
) -> DataFrame:
    """Train ``n_merges`` BPE merge rules; one output row per learned
    rule: (step, sym_a, sym_b, merged, n_occurrences,
    n_symbol_occurrences) where n_occurrences is the winning pair's
    corpus-weighted adjacency count BEFORE the merge and
    n_symbol_occurrences the corpus symbol total AFTER it (each merge
    occurrence shrinks the total by its non-overlapping apply count).

    Per iteration: (1) adjacent-pair census over the symbol arrays
    weighted by word freq (one shuffle, map-side partial agg absorbs
    the hot pairs); (2) argmax via TakeOrdered(1) → one bounded driver
    row, tie-broken (count DESC, a ASC, b ASC) identically to the
    oracle; (3) map-only fold applies the merge; the new vocab state is
    localCheckpoint'ed so iteration plans stay constant-size (the
    pagerank discipline). Ties and folds are engine-deterministic, so
    the DuckDB oracle unrolls the same loop with list_reduce.
    """
    # Words containing U+001F are excluded from training on BOTH sides:
    # the oracle's fold joins symbols with chr(31), and a separator-
    # bearing "word" (a lone control char under _BPE_PATTERN) would
    # round-trip through string_split as two empty symbols. A control
    # char is tokenizer noise, not a merge candidate — dropping it is
    # the semantics we want, mirrored in _bpe_train_oracle's words CTE.
    words = docs.select(
        F.explode(F.regexp_extract_all("text", F.lit(pattern), 1)).alias("w")
    ).where(~F.col("w").contains("\x1f"))
    # Codepoint-based symbol split (regexp_extract_all with '.', which
    # Java regex matches per CODE POINT): split(w, '') would yield
    # UTF-16 code units, handing a single astral-plane char (emoji) a
    # 2-symbol surrogate-half array — a bogus pair the codepoint-based
    # DuckDB oracle (substr(w, i, 1)) never sees. Words contain no \s
    # by _BPE_PATTERN construction, so '.' always matches.
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.expr("regexp_extract_all(w, '(.)', 1)").alias("syms"), "freq"
        )
        .localCheckpoint(eager=True)
    )
    step_rows = []
    for step in range(1, n_merges + 1):
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
        a, b, cnt = best["a"], best["b"], best["cnt"]
        vocab = vocab.select(
            _merge_pair(F.col("syms"), a, b).alias("syms"), "freq"
        ).localCheckpoint(eager=True)
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
