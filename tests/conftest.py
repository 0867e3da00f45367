from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_project_using_telegram_and_aws_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

# --- suite tiers -----------------------------------------------------------
# core tier:  python -m pytest tests/ -m "not slow"   (product pins, <15 min
#             target — every session runs this before a commit)
# full tier:  python -m pytest tests/                 (adds hypothesis
#             property tests, the differential-fuzz axes, and the marked
#             multi-round e2e modules — close-outs and the driver run this)
# Hypothesis-driven tests are auto-marked: a new property test lands in the
# full tier without anyone remembering a decorator.

SLOW_MODULES = {
    "test_differential_fuzz",  # 20 oracle fuzz axes, many Spark jobs each
    "test_full_recipe",        # corpus-recipe e2e chains
    # the streaming-lake e2e family: multi-round foreachBatch streams
    # with checkpoint resume / crash-replay choreography — measured
    # ~12 min of the suite (r12 durations report). Sessions touching
    # streaming/{upsert,ivm,funnel,...} run these files directly.
    "test_upsert",
    "test_upsert_manifest",
    "test_ivm",
    "test_streaming_recipe",
    "test_dsir_gate",
    "test_drift_monitor",
    "test_embedding_drift_monitor",
    "test_sketch_ledger",
}

# modules that MIX fast batch pins with heavy stream e2e: only the
# tests matching these name substrings go to the full tier
SLOW_NAME_PATTERNS = {
    "test_funnel": ("incremental", "stream"),
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-tier only (hypothesis / fuzz axes / heavy e2e); "
        "the core tier runs -m 'not slow'",
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        fn = getattr(item, "function", None)
        is_hypothesis = fn is not None and hasattr(fn, "hypothesis")
        patterns = SLOW_NAME_PATTERNS.get(item.module.__name__, ())
        if (
            is_hypothesis
            or item.module.__name__ in SLOW_MODULES
            or any(p in item.name for p in patterns)
        ):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
