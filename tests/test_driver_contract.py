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
    """The queries this round's rotation must grade: with 217/217
    ever-graded after r13 and zero backlog, the window's job is
    freshness — VERDICT r13 #3 names the 17 r9 leftovers (the stalest
    evidence anywhere) topped up from the 50-entry r10 cohort (a
    rotated-out entry keeps both-scale in-repo DuckDB parity coverage
    every pytest run, and no driver grading has ever diverged from
    that gate). Beyond requiring the full r9-leftover set, this pins
    the REST of the window to r10-cohort rows + the r14 registration,
    so a fresh entry can't silently displace a stale one."""
    r9_leftovers = {
        # All 17 entries last graded r9 — must all be graded this round:
        "array_functions", "bpe_encode_census", "deterministic_sample",
        "doc_repetition_stats", "domain_quota_sample",
        "events_dow_hour_profile", "events_pivot", "events_unpivot",
        "events_user_activity", "events_value_histogram",
        "fuzzy_name_pairs", "length_bucketed_batching", "map_functions",
        "pipeline_corpus_prep", "term_frequencies", "unigram_commonness",
        "vocab_oov_rates",
    }
    r10_cohort = {
        "agg_cube", "agg_percentiles", "agg_rollup",
        "cdc_latest_wins_merge", "date_functions",
        "dedup_connected_components", "dedup_embedding_cosine",
        "dedup_embedding_srp", "dedup_span_winnow_screen",
        "distinct_values", "doc_winnowing_fingerprints",
        "events_cohort_retention", "filter_project",
        "gzip_jsonl_roundtrip", "join_left_outer", "join_semi_anti",
        "knn_bruteforce", "mr_generic_charcount", "mr_salted_wordcount",
        "multimodal_adpcm_roundtrip", "multimodal_animgif_roundtrip",
        "multimodal_flac_roundtrip", "multimodal_frame_sample",
        "multimodal_gif_roundtrip", "multimodal_jpeg_color_roundtrip",
        "multimodal_jpeg_roundtrip", "multimodal_mcv_roundtrip",
        "multimodal_mdct_roundtrip", "multimodal_mjpeg_avi_roundtrip",
        "multimodal_png_roundtrip", "multimodal_ppm_resize_real",
        "multimodal_resize", "multimodal_ulaw_roundtrip",
        "multimodal_wav_decimate_real", "q12_priority_by_returnflag",
        "q13_order_count_distribution", "q14_promo_revenue_ratio",
        "q16_supplier_part_variety", "q17_small_quantity_revenue",
        "q18_large_volume_customers", "q22_dormant_rich_customers",
        "q4_late_shipment_priority", "q5_local_supplier_volume",
        "range_join_price_bands", "regex_functions", "set_operations",
        "sql_q6_forecast_revenue", "window_rank_per_group",
        "window_running_sum", "wordcount_topk",
    }
    r14_new = {"hll_sketch_day_range", "cms_sketch_day_range"}
    window = set(PRIORITY)
    assert r9_leftovers <= window, sorted(r9_leftovers - window)
    rest = window - r9_leftovers
    assert rest <= r10_cohort | r14_new, sorted(rest - (r10_cohort | r14_new))
    assert len(window & r10_cohort) == 31
    assert r14_new <= window
