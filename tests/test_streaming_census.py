"""Locks the streaming-twin census (VERDICT r7 #6): the TWINS table in
streaming/jobs.py — from which QUERIES.md's streaming section is
generated — must be COMPLETE (every run_streaming_* function in the
streaming package appears exactly once) and TRUTHFUL (every batch
query it names is registered; every equivalence test it names exists
in the test suite). A twin added without a census row, or a census row
pointing at a renamed test, fails here instead of silently rotting the
generated documentation.
"""

from __future__ import annotations

import inspect
import os

from ds_mapreduce_spark.plans.registry import load_all
from ds_mapreduce_spark.streaming import jobs, sessionize

REGISTRY = load_all()
TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def _streaming_fns(module):
    return {
        name
        for name, obj in inspect.getmembers(module, inspect.isfunction)
        if name.startswith("run_streaming_") and obj.__module__ == module.__name__
    }


def test_census_is_complete_and_unique():
    actual = _streaming_fns(jobs) | _streaming_fns(sessionize)
    listed = [t["fn"] for t in jobs.TWINS]
    assert len(listed) == len(set(listed)), "duplicate census rows"
    assert set(listed) == actual, (
        f"missing from TWINS: {sorted(actual - set(listed))}; "
        f"stale in TWINS: {sorted(set(listed) - actual)}"
    )


def test_census_rows_resolve():
    test_src = open(os.path.join(TESTS_DIR, "test_streaming.py")).read()
    for t in jobs.TWINS:
        module = sessionize if t.get("module") == "sessionize" else jobs
        assert hasattr(module, t["fn"]), t["fn"]
        assert t["batch"] in REGISTRY, (
            f"{t['fn']}: batch query {t['batch']!r} not registered"
        )
        assert f"def {t['test']}(" in test_src, (
            f"{t['fn']}: equivalence test {t['test']!r} not found in "
            "tests/test_streaming.py"
        )
