"""Compressibility pins: repetitive text scores below prose, prose
below random hex, short docs are NULL, the gate keeps the band, and
results match a direct zlib recomputation."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.compressibility import (
    compressibility_gate,
    compression_ratios,
)

REPETITIVE = "buy now click here " * 40
PROSE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "sailors argue about the weather in a harbor tavern near the "
    "lighthouse on a cold november evening full of gulls and rope"
) * 3
# printable-ASCII stream from sha256 digests: ~6.5 bits/char entropy,
# zlib ratio ~0.87 — the "not actually text" high tail
RANDOM_TEXT = "".join(
    chr(33 + c % 94)
    for c in b"".join(
        __import__("hashlib").sha256(bytes([i])).digest() for i in range(20)
    )
)
ROWS = [(0, REPETITIVE), (1, PROSE), (2, RANDOM_TEXT), (3, "tiny"), (4, "")]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text"])


def test_ordering_and_exact_values(docs):
    got = {r["doc_id"]: r for r in compression_ratios(docs).collect()}
    assert got[0]["compression_ratio"] < got[1]["compression_ratio"]
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"]
    for doc_id, text in ROWS[:3]:
        raw = text.encode()
        assert got[doc_id]["n_bytes"] == len(raw)
        assert got[doc_id]["n_compressed"] == len(zlib.compress(raw, 6))
        assert got[doc_id]["compression_ratio"] == round(
            len(zlib.compress(raw, 6)) / len(raw), 6
        )
    # short docs: counted but unjudged
    assert got[3]["compression_ratio"] is None
    assert got[4]["n_bytes"] == 0 and got[4]["compression_ratio"] is None


def test_gate_keeps_the_band(docs):
    kept = {
        r["doc_id"]
        for r in compressibility_gate(docs, lo=0.20, hi=0.80).collect()
    }
    assert 1 in kept              # prose in band
    assert 0 not in kept          # repetitive low tail dropped
    assert 2 not in kept          # incompressible high tail dropped
    assert {3, 4} <= kept         # too-short docs pass (NULL ratio)


def test_only_id_and_text_enter_python(docs):
    """Plan hygiene: the scored plan's scan reads exactly the two used
    columns (column pruning through the Pandas UDF)."""
    wide = docs.withColumn("extra", F.lit("x"))
    plan = (
        compression_ratios(wide)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "extra" not in plan.split("ArrowEvalPython")[-1]
