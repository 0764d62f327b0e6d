"""Pins the winnowing-prescreen evaluation (dedup_span_winnow_screen).

The load-bearing claim is the Schleimer/Wilkerson/Aiken guarantee
instantiated at exact20's length floor: with k = 3, w = 18 the
guarantee threshold is w + k - 1 = 20 tokens, so every doc sharing a
full 20-token substring with another doc shares a winnowing
fingerprint — recall_bp = 10000 and fn = 0 are THEOREMS, not tuning.
These tests assert the invariant on the real corpus and on a
constructed corpus whose truth/screen membership is known exactly,
plus oracle parity on that hostile construction.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ds_mapreduce_spark.plans.registry import load_all

REGISTRY = load_all()


def test_recall_is_total_on_real_corpus(spark, sf_dir):
    row = REGISTRY["dedup_span_winnow_screen"].fn(spark, sf_dir).first()
    assert row["fn"] == 0
    assert row["recall_bp"] == 10000
    assert row["n_docs"] > 0
    # sanity: confusion cells partition the eval population
    assert row["tp"] + row["fn"] == row["n_truth"]
    assert row["tp"] + row["fp"] == row["n_flagged"]


# disjoint token vocabularies per doc except the deliberately shared
# spans, so screen membership is fully determined (no shared trigram
# => no shared fingerprint possible)
_SHARED20 = " ".join(f"dup{i}" for i in range(20))
_SHARED10 = " ".join(f"mid{i}" for i in range(10))
_DOCS = [
    # docs 0+1 share an exact 20-token span -> both truth, both flagged
    f"a0 a1 a2 a3 a4 {_SHARED20} a5 a6 a7 a8 a9",
    f"b0 b1 b2 b3 b4 b5 b6 {_SHARED20} b7 b8",
    # docs 2+3 share only a 10-token span (< L): NOT truth; winnowing
    # may flag them (sub-threshold matches can share minima) — both
    # padded past 20 tokens so they are in the eval population
    f"c0 c1 c2 c3 c4 c5 {_SHARED10} c6 c7 c8 c9 c10 c11",
    f"d0 d1 d2 d3 d4 d5 d6 {_SHARED10} d7 d8 d9 d10 d11",
    # doc 4: >= 20 tokens, vocabulary disjoint from everything ->
    # neither truth nor flagged
    " ".join(f"e{i}" for i in range(25)),
    # doc 5: < 20 tokens -> outside the eval population entirely
    "f0 f1 f2 f3 f4",
]


@pytest.fixture(scope="module")
def screen_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("winnow_screen_docs")
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(_DOCS))),
                "text": _DOCS,
                "lang": ["en"] * len(_DOCS),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_constructed_confusion_cells(spark, screen_sf_dir):
    row = REGISTRY["dedup_span_winnow_screen"].fn(spark, screen_sf_dir).first()
    assert row["n_docs"] == 5  # doc 5 is under 20 tokens
    assert row["n_truth"] == 2  # exactly the full-span pair
    assert row["tp"] == 2 and row["fn"] == 0  # the guarantee
    assert row["recall_bp"] == 10000
    # doc 4 shares no trigram with anything: it can never be flagged
    assert row["n_flagged"] <= 4


def test_constructed_corpus_oracle_parity(spark, screen_sf_dir):
    q = REGISTRY["dedup_span_winnow_screen"]
    sdf = q.fn(spark, screen_sf_dir)
    cols = sorted(sdf.columns)
    srows = sorted(
        tuple(str(x) for x in r) for r in sdf.select(*cols).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{screen_sf_dir}/documents.parquet'"
    )
    orows = sorted(
        tuple(str(x) for x in r)
        for r in con.sql(f"SELECT {', '.join(cols)} FROM ({q.oracle})").fetchall()
    )
    assert srows == orows


def test_entropic_eval_is_selective_and_recall_total(spark, sf_dir):
    """The r11 high-entropy variant (VERDICT r9 #4): on the derived
    corpus the screen must be SELECTIVE (flagged a strict minority,
    clean tier at/near zero) while the recall theorem still holds on
    the truth tier — the row can now distinguish a good screen from
    lit(True), which the base corpus could not."""
    rows = {
        r["tier"]: r
        for r in REGISTRY["dedup_span_winnow_screen_entropic"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(rows) == {"all", "truth", "near19", "near12", "clean"}
    # recall theorem on the full-length tier
    assert rows["truth"]["fn"] == 0
    assert rows["truth"]["recall_bp"] == 10000
    assert rows["truth"]["n_truth"] == rows["truth"]["n_docs"]
    # selectivity: flagged is a strict minority overall, clean docs
    # essentially never flag (unique md5 filler tokens)
    assert rows["all"]["n_flagged"] * 2 < rows["all"]["n_docs"]
    assert rows["clean"]["n_flagged"] * 100 <= rows["clean"]["n_docs"]
    # the near tiers are the measurement: shorter overlap flags less
    assert rows["near12"]["n_flagged"] <= rows["near19"]["n_flagged"]
    # precision is a real number strictly between 0 and 1 overall
    assert 0 < rows["all"]["precision_bp"] < 10000
