"""Edge semantics of the composed ingest admission pipeline
(operators/ingest.py): verdict precedence, ownership determinism,
shard-budget continuity, and scrub-before-everything. The parity gate
covers the graded corpus; this pins the hand-checkable decisions."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_mapreduce_spark.operators.ingest import ingest_manifest, scored_rows


def _run(spark, rows, budget=10, threshold=0):
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = ingest_manifest(docs, budget=budget, quality_threshold=threshold)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def _q(spark, text):
    """The pipeline's quality score for one text."""
    docs = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    return scored_rows(docs).collect()[0]["q"]


def test_low_quality_takes_precedence_over_dup(spark):
    """A doc that is BOTH low-quality and an exact duplicate reports
    low_quality: the gate runs before dedup (cheap filter first), so
    rejected docs never consult or pollute the fingerprint store."""
    base = "alpha beta gamma delta"
    q = _q(spark, base)
    if q >= 0:
        # steer the text negative by appending tokens with negative
        # weights until the score drops below zero
        import itertools

        for n in itertools.count(1):
            cand = base + " " + " ".join(f"w{n}x{i}" for i in range(n))
            if _q(spark, cand) < 0:
                base = cand
                break
    assert _q(spark, base) < 0
    got = _run(spark, [(1, base), (2, base)])
    assert got[1]["verdict"] == "low_quality"
    assert got[2]["verdict"] == "low_quality"


def test_dup_ownership_is_md5_rank_not_doc_id(spark):
    """Ownership = min md5(doc_id), NOT min doc_id — the same total
    order the shard router walks, which is what makes the streaming
    twin's first-arrival-wins rule coincide with batch."""
    import hashlib

    text = "kept tokens here now"
    assert _q(spark, text) >= 0
    ids = [11, 22, 33]
    got = _run(spark, [(i, text) for i in ids])
    owner = min(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    for i in ids:
        expect = "kept" if i == owner else "dup"
        assert got[i]["verdict"] == expect, (i, got[i])


def test_shard_budget_fills_in_okey_order(spark):
    """Kept docs pack into token-budget shards along the md5 order:
    shard_id == (cumulative tokens before me) DIV budget."""
    import hashlib

    rows = [(i, f"t{i}a t{i}b t{i}c") for i in range(1, 8)]
    got = _run(spark, rows, budget=7)
    kept = [i for i, r in got.items() if r["verdict"] == "kept"]
    order = sorted(kept, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cum = 0
    for i in order:
        assert got[i]["shard_id"] == cum // 7, (i, got[i], cum)
        cum += got[i]["n_tok"]
    # non-kept rows route nowhere
    for i, r in got.items():
        if r["verdict"] != "kept":
            assert r["shard_id"] == -1


def test_scrub_applies_before_fingerprint_and_score(spark):
    """Two docs differing ONLY in the PII value are duplicates AFTER
    the scrub (same redacted text -> same fingerprint): PII must never
    differentiate content downstream of the scrub."""
    a = "contact alice@example.com for details"
    b = "contact bob@sample.org for details"
    got = _run(spark, [(1, a), (2, b)])
    verdicts = sorted(r["verdict"] for r in got.values())
    assert verdicts == ["dup", "kept"] or verdicts == ["low_quality", "low_quality"]
    # and the scrubbed token stream really replaced the address
    docs = spark.createDataFrame([(1, a)], "doc_id bigint, text string")
    rt = scored_rows(docs).collect()[0]
    assert "<EMAIL>" in rt["rt"] and "alice" not in rt["rt"]
    assert rt["n_tok"] == 4  # contact <EMAIL> for details
