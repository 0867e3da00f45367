"""Unigram cross-entropy scoring (operators/lm_score.py): hand-computed
model, quality ordering, OOV handling, and the row contract."""

from __future__ import annotations

import math

import pytest

from data_pipeline_project_using_telegram_and_aws_spark.operators.lm_score import (
    unigram_cross_entropy,
    unigram_model,
)


def test_model_matches_hand_computation(spark):
    # corpus tokens: a a a b  ->  counts a=3 b=1, total=4, V=2, alpha=0.5
    docs = spark.createDataFrame([(1, "a a a b")], ["doc_id", "text"])
    rows = {r.token: r for r in unigram_model(docs).collect()}
    denom = 4 + 0.5 * 3
    assert rows["a"].logp == pytest.approx(math.log2(3.5 / denom))
    assert rows["b"].logp == pytest.approx(math.log2(1.5 / denom))
    assert rows["a"].oov_logp == pytest.approx(math.log2(0.5 / denom))
    assert rows["a"].oov_logp == rows["b"].oov_logp


def test_cross_entropy_orders_common_vs_rare(spark):
    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),        # in-domain
            (2, "zxqv wkrp mblt qqzz"),        # fully OOV
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.bits_per_token
           for r in unigram_cross_entropy(docs, ref_docs=ref).collect()}
    assert got[1] < got[2]
    # a fully-OOV doc scores exactly the OOV floor
    oov = unigram_model(ref).collect()[0].oov_logp
    assert got[2] == pytest.approx(round(-oov, 4))


def test_self_scoring_repetition_is_cheap(spark):
    docs = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"), (2, "six distinct tokens here now friend")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.bits_per_token
           for r in unigram_cross_entropy(docs).collect()}
    # under the self-model the repeated token is high-probability
    assert got[1] < got[2]


def test_zero_token_docs_keep_their_row(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in unigram_cross_entropy(docs).collect()}
    assert set(got) == {1, 2, 3}
    for d in (2, 3):
        assert got[d].n_tokens == 0 and got[d].bits_per_token is None


def test_partitioning_invariant(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} shared common") for i in range(40)],
        ["doc_id", "text"],
    )
    a = sorted(map(tuple, unigram_cross_entropy(docs).collect()))
    b = sorted(map(tuple, unigram_cross_entropy(docs.repartition(7)).collect()))
    assert a == b
