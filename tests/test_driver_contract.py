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


def test_check_window_covers_the_stale_cohort():
    """The queries this round's rotation must grade: with 216/216
    ever-graded after r12 and zero backlog, the window's job is
    freshness — VERDICT r12 #1 names the 16-entry r8 cohort (the
    stalest evidence anywhere) plus ~34 of the 50-entry r9 cohort (a
    rotated-out entry keeps both-scale in-repo DuckDB parity coverage
    every pytest run, and no driver grading has ever diverged from
    that gate). Beyond requiring the full r8 cohort, this pins the
    REST of the window to r9-cohort rows + the r13 registration, so a
    fresh entry can't silently displace a stale one."""
    r8_cohort = {
        # The full r8 cohort (16) — must all be graded this round:
        "customer_rfm_segments", "events_heavy_hitter_profile",
        "events_robust_outliers", "hybrid_rrf_fusion",
        "hybrid_search_rerank", "ingest_manifest_pipeline",
        "market_basket_pairs", "q7_volume_shipping",
        "q9_product_type_profit", "quality_classifier_linear",
        "schema_evolution_roundtrip", "session_path_analysis",
        "skyline_3d_grid", "skyline_price_size", "snapshot_diff_census",
        "text_quality_score",
    }
    r9_cohort = {
        "array_functions", "boilerplate_ngram_coverage",
        "bpe_encode_census", "bpe_train_merges", "collocation_pmi_topk",
        "compaction_rebalance", "csv_roundtrip", "dedup_semdedup_trained",
        "dedup_span_excision_exact20", "deterministic_sample",
        "doc_fingerprint", "doc_repetition_stats", "domain_quota_sample",
        "embedding_norm_stats", "embedding_pca_power",
        "events_attribution_join", "events_decayed_engagement",
        "events_dow_hour_profile", "events_gapfill_interpolate",
        "events_hierarchical_rollup", "events_pivot", "events_props_typed",
        "events_unpivot", "events_user_activity", "events_value_histogram",
        "fuzzy_name_pairs", "jsonl_roundtrip", "knn_jl_recall_eval",
        "knn_quality_gated", "lang_breakdown", "leakage_safe_splits_neardup",
        "length_bucketed_batching", "map_functions", "mr_distributed_grep",
        "multimodal_payload_simhash", "multimodal_ppm_roundtrip",
        "multimodal_wav_roundtrip", "pipeline_corpus_prep",
        "q11_important_value_parts", "q20_dominant_part_shippers",
        "q21_waiting_sole_late_supplier", "q8_market_share",
        "seasonal_naive_backtest", "skew_salted_join",
        "table_antientropy_checksums", "term_frequencies", "token_count",
        "unigram_commonness", "vocab_oov_rates", "weighted_priority_sample",
    }
    r13_new = {"quantile_sketch_day_range"}
    window = set(PRIORITY)
    assert r8_cohort <= window, sorted(r8_cohort - window)
    rest = window - r8_cohort
    assert rest <= r9_cohort | r13_new, sorted(rest - (r9_cohort | r13_new))
    assert len(window & r9_cohort) == 33
