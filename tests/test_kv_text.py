"""Round-trip tests for the reference's text interchange formats:
line/whole-file text source (R1/R4) and the "key value" sink/source
pair (R5/R6) — the full reference dataflow
textfile → map → group → reduce → text sink → parse back."""

from __future__ import annotations

from ds_mapreduce_spark.operators.mapreduce import WordCount, run_mapreduce, word_count
from ds_mapreduce_spark.sources.catalog import read_text_corpus
from ds_mapreduce_spark.sources.kv_text import read_kv_text, write_kv_text

CORPUS = "the quick brown fox\nthe lazy dog\nthe fox"
EXPECTED = {"the": 3, "fox": 2, "quick": 1, "brown": 1, "lazy": 1, "dog": 1}


def _write_corpus(tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text(CORPUS)
    return str(p)


def test_textfile_wordcount_roundtrip(spark, tmp_path):
    """R1→R8→G2→R9→R5→R6: count words from a real text file, write the
    result in the reference's 'key value' format, parse it back."""
    src = _write_corpus(tmp_path)
    lines = read_text_corpus(spark, src)
    counts = word_count(lines.select("value"), text_col="value")

    out_dir = str(tmp_path / "out")
    write_kv_text(counts, out_dir, key_col="word", value_col="cnt")
    back = read_kv_text(spark, out_dir)

    got = {r.key: int(r.value) for r in back.collect()}
    assert got == EXPECTED


def test_generic_mapreduce_on_textfile(spark, tmp_path):
    """The reference's exact pipeline: keyed text records through the
    MapReducer trait surface (strings end-to-end)."""
    src = _write_corpus(tmp_path)
    kv = read_text_corpus(spark, src)  # key = filename, value = line
    result = run_mapreduce(kv, WordCount())
    got = {r.key: int(r.value) for r in result.collect()}
    assert got == EXPECTED


def test_wholetext_read_is_one_record(spark, tmp_path):
    src = _write_corpus(tmp_path)
    df = read_text_corpus(spark, src, wholetext=True)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].value == CORPUS


def test_kv_value_may_contain_spaces(spark, tmp_path):
    """The format contract (SURVEY.md §1.2): first space splits key from
    value; values keep their spaces."""
    df = spark.createDataFrame([("k1", "a b c"), ("k2", "")], "key string, value string")
    out = str(tmp_path / "kv")
    write_kv_text(df, out)
    back = {r.key: r.value for r in read_kv_text(spark, out).collect()}
    assert back == {"k1": "a b c", "k2": ""}
