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
    """The queries this round's rotation must grade: with 219/219
    ever-graded after r14 and zero backlog, the window's job is
    freshness — VERDICT r14 #3 names the 19 r10 leftovers (the stalest
    evidence anywhere) topped up from the 50-entry r11 cohort (a
    rotated-out entry keeps both-scale in-repo DuckDB parity coverage
    every pytest run, and no driver grading has ever diverged from
    that gate). Beyond requiring the full r10-leftover set, this pins
    the REST of the window to r11-cohort rows + the r15 registration,
    so a fresh entry can't silently displace a stale one."""
    r10_leftovers = {
        # All 19 entries last graded r10 — must all be graded this round:
        "multimodal_mdct_roundtrip", "multimodal_mjpeg_avi_roundtrip",
        "multimodal_png_roundtrip", "multimodal_ppm_resize_real",
        "multimodal_resize", "multimodal_ulaw_roundtrip",
        "multimodal_wav_decimate_real", "q14_promo_revenue_ratio",
        "q16_supplier_part_variety", "q17_small_quantity_revenue",
        "q18_large_volume_customers", "q22_dormant_rich_customers",
        "q4_late_shipment_priority", "q5_local_supplier_volume",
        "regex_functions", "set_operations", "sql_q6_forecast_revenue",
        "window_rank_per_group", "window_running_sum",
    }
    r11_cohort = {
        "agg_suite", "asof_join_click_purchase",
        "bucketed_join_no_shuffle", "contrastive_pairs", "dedup_exact",
        "dedup_lsh_eval", "dedup_minhash_lsh", "dedup_minhash_verified",
        "dedup_ngram_jaccard", "dedup_simhash",
        "dedup_span_winnow_screen_entropic", "doc_chunking",
        "dynamic_partition_pruning", "events_funnel",
        "events_json_extract", "events_sessionization",
        "events_sliding_window", "events_tumbling_window",
        "exact_ngram_decontamination", "graph_pagerank",
        "graph_triangle_count", "interval_overlap_join",
        "join_full_outer", "kmeans_lloyd_refine", "knn_ivf",
        "lang_id_heuristic", "mixture_rebalance", "mr_generic_wordcount",
        "mr_inverted_index", "mr_secondary_sort",
        "multimodal_h264_annexb_roundtrip", "multimodal_metadata_stats",
        "multimodal_mp3_framing_roundtrip", "null_semantics",
        "partitioned_write_prune", "pii_redaction",
        "q10_returned_item_customers", "q15_top_supplier",
        "q19_disjunctive_predicates", "related_docs_topk",
        "scalar_functions", "sequence_packing", "sessions_per_hour",
        "span_corruption_plan", "sql_grouping_sets", "stratified_sample",
        "tfidf_top_terms", "topk_orders", "wholetext_file_stats",
        "window_functions_suite",
    }
    r15_new = {"sketch_store_compaction"}
    window = set(PRIORITY)
    assert r10_leftovers <= window, sorted(r10_leftovers - window)
    rest = window - r10_leftovers
    assert rest <= r11_cohort | r15_new, sorted(rest - (r11_cohort | r15_new))
    assert len(window & r11_cohort) == 30
    assert r15_new <= window
