"""BPE training hardening tests (ADVICE r7 item 2).

The r7 oracle fold rewrote the accumulator's last segment with
regexp_replace and leaned on the (false-as-stated) premise "symbols are
alphanumeric". The operative invariant is narrower — MERGE WINNERS are
alphanumeric, because _BPE_PATTERN's punctuation alternative matches a
single char, so punctuation words are 1-symbol arrays that never form
an adjacent pair — but three latent divergences remained, all
data-dependent on corpus regeneration:

- a backslash in a merge winner would be misinterpreted by the RE2
  replacement string (fixed: the fold is now regex-free —
  string_split last-segment + substr arithmetic);
- a chr(31) "word" round-trips through the separator-joined
  accumulator as TWO empty symbols (fixed: U+001F words are excluded
  from training on both engines, worthless as merge material anyway);
- astral-plane chars (emoji) split into UTF-16 surrogate halves under
  Spark's split(w, '')/length()/substr() but into codepoints under
  DuckDB's substr (fixed: both BPE queries now split via
  regexp_extract_all(w, '(?s)(.)', 1) — codepoint-based in Java regex);
- the Unicode line terminators U+2028/U+2029/U+0085 are NOT Java \\s,
  so _BPE_PATTERN extracts them as 1-char words, but a non-DOTALL '.'
  refuses to match them — Spark split syms=[] vs oracle substr one
  symbol, and an all-terminator doc makes bpe_encode_census divide by
  n_char_tokens=0 (fixed: '(?s)' DOTALL at every per-codepoint split —
  ADVICE r8 item 1).

These tests pin each fix with a corpus that CONTAINS the hostile
inputs, so the gate no longer depends on what the driver generates.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ds_mapreduce_spark.plans.registry import load_all
from ds_mapreduce_spark.plans.text_queries import _BPE_PATTERN

REGISTRY = load_all()

NASTY_TEXTS = [
    "hello hello world world hello world",
    "hello \\( \\) \\\\ !!! ??? $1 $2 world hello",
    "aaa aaab \U0001f600\U0001f600 \U0001f600 data data123 456 hello world",
    "ab ab ab abc abc \x1f weird",
    # Unicode line terminators: LINE SEPARATOR, PARAGRAPH SEPARATOR,
    # NEXT LINE — not Java \s, so they become 1-char words that only a
    # DOTALL codepoint split sees (ADVICE r8 item 1).
    "edge \u2028 \u2029 \x85 case \u2028\u2029 hello world",
    # A doc whose ONLY trainable words are line terminators: without
    # DOTALL, n_char_tokens = 0 here and saved_bp divides by zero.
    "\u2028 \u2029 \x85",
]


@pytest.fixture(scope="module")
def nasty_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nasty_docs")
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(NASTY_TEXTS))),
                "text": NASTY_TEXTS,
                "lang": ["en", "de", "fr", "en", "en", "de"],
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.parametrize(
    "name", ["bpe_pair_merge_stats", "bpe_train_merges", "bpe_encode_census"]
)
def test_bpe_parity_on_metacharacter_corpus(spark, nasty_sf_dir, name):
    """Spark and the DuckDB oracle agree on a corpus with regex
    metacharacters, backslashes, a chr(31) control word, and emoji."""
    q = REGISTRY[name]
    sdf = q.fn(spark, nasty_sf_dir)
    srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{nasty_sf_dir}/documents.parquet'"
    )
    rel = con.sql(q.oracle)
    drows = sorted(tuple(str(x) for x in r) for r in rel.fetchall())
    assert srows == drows, f"{name}: first diff " + str(
        next(((a, b) for a, b in zip(srows, drows) if a != b), None)
    )
    assert len(srows) > 0


def test_merge_winners_are_separator_and_backslash_free(
    spark, nasty_sf_dir, sf_dir
):
    """Learned merge symbols never contain the chr(31) fold separator
    or a backslash — on the real corpus AND the hostile one."""
    for d in (sf_dir, nasty_sf_dir):
        rows = REGISTRY["bpe_train_merges"].fn(spark, d).collect()
        assert rows
        for r in rows:
            for sym in (r["sym_a"], r["sym_b"], r["merged"]):
                assert "\x1f" not in sym and "\\" not in sym, (d, sym)


def test_multi_symbol_words_are_alphanumeric(spark, sf_dir):
    """The invariant the oracle's safety USED to rest on (and that the
    winners-are-alnum property still rests on): _BPE_PATTERN only ever
    produces multi-char words from its [a-zA-Z]+ / [0-9]+ alternatives,
    so every word that can generate a pair is purely alphanumeric."""
    from ds_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    bad = (
        docs.select(
            F.explode(
                F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 1)
            ).alias("w")
        )
        .where(F.length("w") >= 2)
        .where(~F.col("w").rlike(r"^([a-zA-Z]+|[0-9]+)$"))
        .limit(5)
        .collect()
    )
    assert bad == [], f"non-alnum multi-char words: {[r['w'] for r in bad]}"


def test_oracle_fold_is_regex_free_for_backslash_symbols(spark):
    """The fold itself (not just the pattern invariant) survives
    symbols made of backslashes and regex metacharacters: DuckDB's
    list_reduce twin == Spark's _merge_pair == the Python reference,
    even for merges _BPE_PATTERN can't currently produce."""
    from ds_mapreduce_spark.operators.bpe import _merge_pair

    def py_merge(syms, a, b):
        out = list(syms[:1])
        for s in syms[1:]:
            if out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        return out

    cases = [
        (["\\", "(", "a", "b"], "\\", "("),
        (["\\", "\\", "\\"], "\\", "\\"),
        (["$1", "$1", "x"], "$1", "$1"),
        (["a", ".*", "a", ".*"], "a", ".*"),
    ]
    con = duckdb.connect()
    for syms, a, b in cases:
        expect = py_merge(syms, a, b)
        qa, qb = a.replace("'", "''"), b.replace("'", "''")
        lits = ", ".join("'" + s.replace("'", "''") + "'" for s in syms)
        got_duck = con.sql(
            f"""SELECT string_split(list_reduce([{lits}], (acc, s) ->
      CASE WHEN string_split(acc, chr(31))[-1] = '{qa}' AND s = '{qb}'
           THEN substr(acc, 1, len(acc) - len('{qa}')) || '{qa}' || '{qb}'
           ELSE acc || chr(31) || s END), chr(31))"""
        ).fetchone()[0]
        assert got_duck == expect, (syms, a, b, got_duck)
        got_spark = (
            spark.createDataFrame([(syms,)], "syms array<string>")
            .select(_merge_pair(F.col("syms"), a, b).alias("m"))
            .first()["m"]
        )
        assert got_spark == expect, (syms, a, b, got_spark)
