"""Exact-substring dedup (`operators/substr_dedup.py`) — differential
against a brute-force Python oracle (all k-gram occurrences counted,
islands stitched by hand), plus the module's stated guarantees:
full coverage of any planted ≥k duplicate in every occurrence, and
paper-policy removal (cut ALL copies, merged overlaps)."""

from __future__ import annotations

import random
from collections import Counter

from data_pipeline_project_using_telegram_and_aws_spark.operators.substr_dedup import (
    exact_substring_spans,
    remove_spans,
)


def _brute_spans(docs, k, min_count=2):
    c = Counter()
    for _, t in docs:
        for p in range(len(t) - k + 1):
            c[t[p:p + k]] += 1
    spans = []
    for d, t in docs:
        marked = [
            p for p in range(len(t) - k + 1) if c[t[p:p + k]] >= min_count
        ]
        runs = []
        for p in marked:
            if runs and p == runs[-1][1] + 1:
                runs[-1] = (runs[-1][0], p)
            else:
                runs.append((p, p))
        spans.extend((d, a + 1, b - a + k) for a, b in runs)
    return sorted(spans)


def _py_remove(t, spans):
    iv = sorted((s - 1, s - 1 + ln) for _, s, ln in spans)
    merged = []
    for s, e in iv:
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    out, cur = "", 0
    for s, e in merged:
        out += t[cur:s]
        cur = e
    return out + t[cur:]


def _fixture_docs():
    rng = random.Random(42)

    def rnd(n):
        return "".join(rng.choice("abcd ") for _ in range(n))

    dup = "the quick brown fox jumps over the lazy dog again and again"
    return [
        ("d1", rnd(40) + dup + rnd(35)),
        ("d2", rnd(25) + dup + rnd(50)),
        ("d3", rnd(90)),
        # within-document repeat plus cross-document prefix overlap
        ("d4", "xyz" + dup[:30] + "qqq" + dup[:30] + "zz"),
        ("d5", "short"),
    ]


def test_spans_match_brute_force(spark):
    docs = _fixture_docs()
    k = 12
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = sorted(
        (r.doc_id, r.span_start, r.span_length)
        for r in exact_substring_spans(df, k=k).collect()
    )
    want = _brute_spans(docs, k)
    assert got == want and len(got) >= 4


def test_planted_duplicate_fully_covered_everywhere(spark):
    """The no-false-negative guarantee: a ≥k string occurring in
    three places (two docs, one twice) is fully inside a reported
    span at every occurrence."""
    k = 20
    dup = "0123456789abcdefghij-SHARED-jihgfedcba9876543210"
    docs = [
        ("a", "AAA" + dup + "BBB"),
        ("b", "CC" + dup + "DD" + dup + "EE"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    spans = {
        (r.doc_id, r.span_start, r.span_length)
        for r in exact_substring_spans(df, k=k).collect()
    }
    for d, t in docs:
        at = 0
        while True:
            p = t.find(dup, at)
            if p < 0:
                break
            assert any(
                sd == d and s <= p + 1 and p + 1 + len(dup) <= s + ln
                for sd, s, ln in spans
            ), (d, p, spans)
            at = p + 1


def test_remove_spans_paper_policy(spark):
    """All occurrences cut (no survivor copy), overlap merge correct,
    span-free documents pass through untouched — against the Python
    removal oracle."""
    docs = _fixture_docs()
    k = 12
    df = spark.createDataFrame(docs, "doc_id string, text string")
    spans_df = exact_substring_spans(df, k=k)
    want_spans = _brute_spans(docs, k)
    cleaned = {
        r.doc_id: r.text for r in remove_spans(df, spans_df).collect()
    }
    for d, t in docs:
        assert cleaned[d] == _py_remove(
            t, [x for x in want_spans if x[0] == d]
        ), d
    # the shared sentence is gone from every doc that carried it
    assert "quick brown fox" not in cleaned["d1"]
    assert "quick brown fox" not in cleaned["d2"]
    # d3/d5 had no spans at k=12 with this seed → identical text
    assert cleaned["d3"] == docs[2][1]
    assert cleaned["d5"] == "short"


def test_randomized_differential(spark):
    """Randomized corpora over a tiny alphabet (dense accidental
    repeats — the hard case for island stitching) stay byte-equal to
    the brute-force oracle, spans and removal both."""
    rng = random.Random(7)
    for trial in range(3):
        docs = [
            (
                f"t{trial}_{i}",
                "".join(rng.choice("ab") for _ in range(rng.randint(0, 60))),
            )
            for i in range(6)
        ]
        k = rng.choice([4, 6])
        df = spark.createDataFrame(docs, "doc_id string, text string")
        got = sorted(
            (r.doc_id, r.span_start, r.span_length)
            for r in exact_substring_spans(df, k=k).collect()
        )
        want = _brute_spans(docs, k)
        assert got == want, (trial, k, got, want)
        cleaned = {
            r.doc_id: r.text
            for r in remove_spans(df, exact_substring_spans(df, k=k)).collect()
        }
        for d, t in docs:
            assert cleaned[d] == _py_remove(
                t, [x for x in want if x[0] == d]
            ), (trial, d)


def test_gram_hash_matches_winnowing_recipe(spark):
    """The 48-bit md5-prefix gram hash is byte-identical to
    `winnowing.winnow_fingerprints`' — the two span-dedup schemes
    share one reproducible fingerprint space."""
    from pyspark.sql import functions as F

    from data_pipeline_project_using_telegram_and_aws_spark.operators.substr_dedup import (
        _gram_hash,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.winnowing import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [("x", "abcdefghijklmno")], "doc_id string, text string"
    )
    k = 8
    ours = {
        r.h
        for r in df.select(
            F.explode(F.sequence(F.lit(1), F.length("text") - k + 1)).alias(
                "p"
            ),
            "text",
        )
        .select(_gram_hash(F.col("text"), F.col("p"), k).alias("h"))
        .collect()
    }
    theirs = {
        r.fingerprint
        for r in winnow_fingerprints(df, k=k, window=1).collect()
    }
    # window=1 keeps every gram, so the fingerprint sets coincide
    assert theirs == ours and len(ours) > 0
