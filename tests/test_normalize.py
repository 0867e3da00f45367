"""Normalization pins: control/zero-width stripping, Unicode
whitespace canonicalization, NFC composition parity with unicodedata,
NFKC compatibility folding, tier ordering, and the dedup payoff
(byte-different renderings hash equal after the pass)."""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.normalize import (
    normalize_corpus,
    normalize_text,
    normalize_unicode,
)


def _one(spark, text):
    return spark.createDataFrame([(0, text)], ["doc_id", "text"])


def _got(df):
    return df.collect()[0]["text"]


def test_jvm_tier_strips_and_canonicalizes(spark):
    dirty = "a\x00b​c  d　e  f\r\n g\t"
    got = _one(spark, dirty).select(
        normalize_text(F.col("text")).alias("text")
    ).collect()[0]["text"]
    assert got == "abc d e f\ng"


def test_nfc_matches_unicodedata(spark):
    # e + combining acute vs precomposed é
    decomposed = "café des réves"
    got = _got(normalize_unicode(_one(spark, decomposed), "NFC"))
    assert got == unicodedata.normalize("NFC", decomposed)
    assert "é" in got and "́" not in got


def test_nfkc_folds_compatibility_forms(spark):
    got = _got(normalize_unicode(_one(spark, "ﬁle ２０２６"), "NFKC"))
    assert got == "file 2026"
    with pytest.raises(ValueError):
        normalize_unicode(_one(spark, "x"), "NFX")


def test_composed_pass_and_dedup_payoff(spark):
    """Two byte-different renderings of the same sentence hash equal
    after normalize_corpus — the reason the pass runs before dedup."""
    a = "café noir​ et crème"
    b = "café noir et crème "
    df = spark.createDataFrame(
        [(1, a, "web"), (2, b, "wiki")], ["doc_id", "text", "source"]
    )
    out = normalize_corpus(df)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["text"] == rows[2]["text"] == "café noir et crème"
    assert rows[1]["source"] == "web"  # other columns preserved
    hashes = out.select(F.md5("text").alias("h")).distinct().count()
    assert hashes == 1
    # the all-JVM fast path skips Python but keeps the cleanup
    fast = normalize_corpus(df, unicode_form=None)
    assert "ArrowEvalPython" not in (
        fast._jdf.queryExecution().executedPlan().toString()
    )


def test_null_text_survives(spark):
    df = spark.createDataFrame([(0, None)], "doc_id long, text string")
    assert _got(normalize_unicode(df)) is None
