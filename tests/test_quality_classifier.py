"""Trained quality classifier (operators/quality_classifier.py):
separability on synthetic good-vs-gibberish corpora, the per-row score
contract, and the filter composition."""

from __future__ import annotations

import random

import pytest

PROSE_VOCAB = (
    "the quick brown fox jumps over lazy dog and runs through green "
    "fields while birds sing in morning light near quiet river banks"
).split()

GIBBERISH_VOCAB = ["zx%d" % i for i in range(200)]


def _doc(vocab, rng, n=12):
    return " ".join(rng.choice(vocab) for _ in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(7)
    rows = []
    for i in range(150):
        rows.append((i, _doc(PROSE_VOCAB, rng), 1.0))
    for i in range(150, 300):
        rows.append((i, _doc(GIBBERISH_VOCAB, rng), 0.0))
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_separates_prose_from_gibberish(corpus, spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.quality_classifier import (
        score_documents,
        train_quality_classifier,
    )

    train = corpus.filter("doc_id % 5 != 0")
    test = corpus.filter("doc_id % 5 = 0")
    model = train_quality_classifier(train, n_features=1 << 12)
    got = score_documents(model, test).join(
        test.select("doc_id", "label"), "doc_id"
    )
    rows = got.collect()
    assert len(rows) == test.count()  # one score per doc, nothing drops
    acc = sum(
        1 for r in rows if (r.quality_prob >= 0.5) == (r.label == 1.0)
    ) / len(rows)
    assert acc >= 0.95
    assert all(0.0 <= r.quality_prob <= 1.0 for r in rows)


def test_filter_keeps_prose(corpus):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.quality_classifier import (
        quality_filter,
        train_quality_classifier,
    )

    model = train_quality_classifier(corpus, n_features=1 << 12)
    kept = quality_filter(model, corpus, threshold=0.5)
    labels = [r.label for r in kept.select("label").collect()]
    # overwhelmingly the prose half survives
    assert len(labels) > 0
    assert sum(labels) / len(labels) >= 0.95
    # score column rides along for downstream mixing/audit
    assert "quality_prob" in kept.columns


def test_scoring_handles_empty_text(corpus, spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.quality_classifier import (
        score_documents,
        train_quality_classifier,
    )

    model = train_quality_classifier(corpus, n_features=1 << 12)
    odd = spark.createDataFrame(
        [(1000, ""), (1001, "   "), (1002, "the quick brown fox")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.quality_prob for r in score_documents(model, odd).collect()}
    assert set(got) == {1000, 1001, 1002}
    assert all(0.0 <= p <= 1.0 for p in got.values())
