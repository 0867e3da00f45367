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
    # Tests run tiny fixtures, so the suite is job-scheduling-latency
    # bound, not compute bound: a narrower master means fewer no-op
    # tasks per stage. local[8] measured ~31% faster than local[32]
    # over a representative module subset (ABBA: 98.9/118.2 s at 8 vs
    # 153.0/161.1 s at 32 on this host), and local[8] is exactly what
    # tools/run_core_tier.sh has always validated the suite under. An
    # explicit $SPARK_GRAFT_CPUS still wins (the driver's scaling axis).
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus is None:
        cpus = str(min(8, os.cpu_count() or 8))
    s = get_spark("tests", master=f"local[{cpus}]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
