"""Locks the driver-output contract that round-1 grading tripped on.

The driver canonicalizes results in pandas (sort columns by name, sort
rows, hash values): container-typed columns (array/map/struct) raise
``unhashable type: 'list'`` and void the CORRECTNESS row, and raw
temporal columns hash differently across engines (CLAUDE.md invariant:
epoch seconds or formatted strings only). The driver also checks only
the FIRST 50 registry entries, so that window must span every
capability family of SURVEY.md §2 — round 1 spent all 50 slots on
three modules and left E8/E9/E13/E14 ungraded.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    DateType,
    MapType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from ds_mapreduce_spark.plans.registry import PRIORITY, load_all

REGISTRY = load_all()

CONTAINER = (ArrayType, MapType, StructType)
TEMPORAL = (TimestampType, TimestampNTZType, DateType)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_output_columns_are_atomic_and_portable(spark, sf_dir, name):
    schema = REGISTRY[name].fn(spark, sf_dir).schema
    for f in schema.fields:
        assert not isinstance(f.dataType, CONTAINER), (
            f"{name}.{f.name} is {f.dataType.simpleString()}: the driver "
            "canonicalizer cannot hash container values — stringify "
            "(array_join) or split into scalar columns"
        )
        assert not isinstance(f.dataType, TEMPORAL), (
            f"{name}.{f.name} is {f.dataType.simpleString()}: raw temporal "
            "columns hash differently across engines — emit epoch seconds "
            "(unix_micros DIV 1000000) or a formatted string"
        )


def test_check_window_is_exactly_the_priority_list():
    """The driver grades registry entries in dict order; the first 50
    must be the curated PRIORITY window, not import-order accidents."""
    assert len(PRIORITY) == 50
    assert tuple(REGISTRY)[: len(PRIORITY)] == PRIORITY


def test_check_window_spans_every_family():
    """Every plan module (= capability family) lands at least one query
    inside the driver's 50-entry check window."""
    windowed_modules = {
        REGISTRY[name].fn.__module__.rsplit(".", 1)[-1] for name in PRIORITY
    }
    all_modules = {q.fn.__module__.rsplit(".", 1)[-1] for q in REGISTRY.values()}
    assert windowed_modules == all_modules, (
        f"families with no graded query: {sorted(all_modules - windowed_modules)}"
    )


def test_queries_md_matches_registry():
    """QUERIES.md is generated from the registry; a stale index misstates
    the public surface. Regenerate with scripts/gen_queries_md.py."""
    import os
    import re

    md = open(os.path.join(os.path.dirname(__file__), "..", "QUERIES.md")).read()
    documented = set(re.findall(r"^- \*\*`([^`]+)`\*\*", md, flags=re.M))
    assert documented == set(REGISTRY), (
        f"missing: {sorted(set(REGISTRY) - documented)}; "
        f"stale: {sorted(documented - set(REGISTRY))}"
    )
    header = re.search(r"^(\d+) queries;", md, flags=re.M)
    assert header and int(header.group(1)) == len(REGISTRY)


def test_check_window_covers_the_round1_dark_families():
    """The queries each round's VERDICT demands driver-grade evidence
    for. r1-dark entries that have since gone green for >=2 driver
    rounds may rotate out (their family stays covered — asserted by
    test_check_window_spans_every_family); entries graded for the FIRST
    time last round stay pinned one more round."""
    must_grade = {
        # Round-9 rotation (VERDICT r8 #1, the staged plan executed):
        # 26 of the 28 twice-green r7-cohort entries rotated out;
        # events_gapfill_interpolate + seasonal_naive_backtest stay as
        # the only temporal_queries rows in the window (family coverage
        # asserted by test_check_window_spans_every_family). ALL 26
        # never-driver-graded entries rotate in -> 196/196 ever-graded.
        "events_gapfill_interpolate", "seasonal_naive_backtest",
        # The 22 entries FIRST graded in r08 stay pinned a 2nd round:
        "bpe_train_merges", "embedding_pca_power",
        "collocation_pmi_topk", "events_decayed_engagement",
        "knn_jl_recall_eval", "weighted_priority_sample",
        "leakage_safe_splits_neardup", "multimodal_payload_simhash",
        "mr_distributed_grep",
        "q8_market_share", "q11_important_value_parts",
        "q20_dominant_part_shippers", "q21_waiting_sole_late_supplier",
        "pipeline_corpus_prep", "skew_salted_join", "csv_roundtrip",
        "jsonl_roundtrip", "lang_breakdown", "unigram_commonness",
        "term_frequencies", "events_props_typed",
        "events_attribution_join",
        # r9 IN: the five r8-new registrations
        "dedup_span_excision_exact20", "dedup_semdedup_trained",
        "bpe_encode_census", "multimodal_wav_roundtrip",
        "multimodal_ppm_roundtrip",
        # r9 IN: the 21 remaining never-graded backlog residents
        "array_functions", "map_functions", "events_pivot",
        "events_unpivot", "events_user_activity",
        "events_value_histogram", "events_dow_hour_profile",
        "events_hierarchical_rollup", "fuzzy_name_pairs",
        "doc_fingerprint", "doc_repetition_stats",
        "boilerplate_ngram_coverage", "domain_quota_sample",
        "deterministic_sample", "token_count", "vocab_oov_rates",
        "embedding_norm_stats", "knn_quality_gated",
        "length_bucketed_batching", "compaction_rebalance",
        "table_antientropy_checksums",
    }
    assert must_grade <= set(PRIORITY), sorted(must_grade - set(PRIORITY))
