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
    """The queries this round's rotation must grade: with 214/214
    ever-graded after r11 and zero backlog, the window's job is
    freshness — VERDICT r11 #1 names the full r6 and r7 cohorts (38
    entries last graded four-to-five rounds ago) as the stalest
    evidence (a rotated-out entry keeps both-scale in-repo DuckDB
    parity coverage every pytest run, and no driver grading has ever
    diverged from that gate)."""
    must_grade = {
        # The full r6 cohort (16):
        "agg_approx_suite", "approx_distinct_rollup", "corpus_shard_plan",
        "decontamination", "dedup_incremental", "dq_validation_suite",
        "events_native_session_window", "events_rolling_1h_stats",
        "events_rolling_7d_active_users", "events_rolling_anomaly_flags",
        "incremental_agg_maintenance", "multimodal_features",
        "q3_shipping_priority", "scd2_user_value_history", "text_stats",
        "zorder_write_prune",
        # The full r7 cohort (22):
        "bm25_search", "bpe_pair_merge_stats", "dedup_lsh_band_sweep",
        "dedup_prefix_filter", "embedding_pq_codes",
        "entity_resolution_clusters", "epoch_shuffle_plan",
        "equi_depth_histogram", "events_hourly_resample",
        "graph_pagerank_converged", "knn_pq_adc", "kv_text_roundtrip",
        "leakage_safe_splits", "multi_touch_attribution",
        "multimodal_payload_dedup", "pipeline_llm_training_prep",
        "pq_trained_codebook_encode", "q1_pricing_summary",
        "table_profile", "trigram_substring_search", "twap_user_value",
        "wordcount",
    }
    assert must_grade <= set(PRIORITY), sorted(must_grade - set(PRIORITY))
