"""Corpus-curation pipeline: every drop is staged, reasoned, and the
survivors are exactly the documents no stage rejects."""

from __future__ import annotations

from data_pipeline_project_using_telegram_and_aws_spark.operators.curation import curate_corpus

GOOD = "the quick brown fox jumps over the lazy dog near the river bank"
NEAR = "the quick brown fox jumps over the lazy dog near the river shore"


def _docs(spark):
    rows = [
        (1, GOOD, "en"),
        (2, GOOD, "en"),            # exact dup of 1
        (3, NEAR, "en"),            # near dup of 1 (one token differs)
        (4, "short text here", "en"),            # < 5 tokens → quality
        (5, "!!! ??? ... ;;; ,,, !!! ??? ...", "en"),  # punct junk
        (6, "ein ganz anderer text mit vielen verschiedenen neuen worten",
         "de"),                     # fine but wrong language
        (7, "completely different content about spark query engines and "
            "distributed joins for large scale analytics", "en"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_curation_stages_and_ledger(spark):
    kept, ledger = curate_corpus(
        _docs(spark),
        jaccard_threshold=0.5,
        min_tokens=5,
        keep_langs=["en"],
    )
    assert sorted(r.doc_id for r in kept.collect()) == [1, 7]
    entries = {r.doc_id: (r.stage, r.reason) for r in ledger.collect()}
    assert set(entries) == {2, 3, 4, 5, 6}
    assert entries[2][0] == "exact_dedup"
    assert entries[3][0] == "near_dedup" and "vs doc 1" in entries[3][1]
    assert entries[4] == ("quality", "too_short")
    assert entries[5] == ("quality", "punct_ratio")
    assert entries[6] == ("language", "lang=de")


def test_curation_drops_each_doc_exactly_once(spark):
    kept, ledger = curate_corpus(
        _docs(spark), jaccard_threshold=0.5, keep_langs=["en"]
    )
    dropped = [r.doc_id for r in ledger.collect()]
    assert len(dropped) == len(set(dropped))
    kept_ids = {r.doc_id for r in kept.collect()}
    assert kept_ids.isdisjoint(dropped)
    assert kept_ids | set(dropped) == {1, 2, 3, 4, 5, 6, 7}
