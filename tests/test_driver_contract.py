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
    """The queries this round's rotation must grade: with 220/220
    ever-graded after r15 and zero backlog, the window's job is
    freshness — VERDICT r15 #3 names the 20 r11 leftovers (the stalest
    evidence anywhere) topped up from the 50-entry r12 cohort (a
    rotated-out entry keeps both-scale in-repo DuckDB parity coverage
    every pytest run, and no driver grading has ever diverged from
    that gate). Beyond requiring the full r11-leftover set, this pins
    the REST of the window to r12-cohort rows + the r16 registration,
    so a fresh entry can't silently displace a stale one."""
    r11_leftovers = {
        # All 20 entries last graded r11 — must all be graded this round:
        "agg_suite", "contrastive_pairs", "dedup_lsh_eval",
        "dedup_minhash_verified", "dedup_span_winnow_screen_entropic",
        "doc_chunking", "exact_ngram_decontamination",
        "graph_triangle_count", "join_full_outer", "mixture_rebalance",
        "null_semantics", "q10_returned_item_customers",
        "q15_top_supplier", "q19_disjunctive_predicates",
        "related_docs_topk", "scalar_functions", "sequence_packing",
        "span_corruption_plan", "stratified_sample", "topk_orders",
    }
    r12_cohort = {
        "agg_approx_suite", "approx_distinct_rollup",
        "bloom_ngram_decontamination", "bm25_search",
        "bpe_pair_merge_stats", "cms_heavy_hitter_estimates",
        "corpus_shard_plan", "decontamination", "dedup_incremental",
        "dedup_lsh_band_sweep", "dedup_prefix_filter", "dedup_semdedup",
        "dedup_span_excision", "dedup_span_excision_minlen",
        "dq_validation_suite", "dsir_importance_select",
        "embedding_pq_codes", "entity_resolution_clusters",
        "epoch_shuffle_plan", "equi_depth_histogram",
        "events_hourly_resample", "events_native_session_window",
        "events_rolling_1h_stats", "events_rolling_7d_active_users",
        "events_rolling_anomaly_flags", "graph_bfs_reach",
        "graph_pagerank_converged", "incremental_agg_maintenance",
        "knn_pq_adc", "kv_text_roundtrip", "leakage_safe_splits",
        "mr_inverted_index_capped", "multi_touch_attribution",
        "multimodal_features", "multimodal_payload_dedup",
        "orc_roundtrip", "pipeline_llm_training_prep",
        "pq_trained_codebook_encode", "q1_pricing_summary",
        "q2_min_cost_supplier", "q3_shipping_priority",
        "quantile_sketch_estimates", "quantile_sketch_rollup",
        "scd2_user_value_history", "table_profile", "text_stats",
        "trigram_substring_search", "twap_user_value", "wordcount",
        "zorder_write_prune",
    }
    r16_new = {"sketch_store_retention"}
    window = set(PRIORITY)
    assert r11_leftovers <= window, sorted(r11_leftovers - window)
    rest = window - r11_leftovers
    assert rest <= r12_cohort | r16_new, sorted(rest - (r12_cohort | r16_new))
    assert len(window & r12_cohort) == 29
    assert r16_new <= window
