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


def _hand_bigram_bits(ref_texts, doc_tokens, alpha=0.5, lam=0.7):
    """Independent Python recomputation of the interpolated bigram score."""
    from collections import Counter

    uni = Counter()
    bi = Counter()
    for t in ref_texts:
        toks = [x for x in t.split(" ") if x]
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    V = len(uni)
    total = sum(uni.values())
    c1 = Counter()
    for (a, _), n in bi.items():
        c1[a] += n

    def p_uni(t):
        return (uni.get(t, 0) + alpha) / (total + alpha * (V + 1))

    def p_bi(a, b):
        return (bi.get((a, b), 0) + alpha) / (c1.get(a, 0) + alpha * (V + 1))

    logs = [math.log2(p_uni(doc_tokens[0]))]
    for a, b in zip(doc_tokens, doc_tokens[1:]):
        logs.append(math.log2(lam * p_bi(a, b) + (1 - lam) * p_uni(b)))
    return round(-sum(logs) / len(logs), 4)


def test_bigram_matches_hand_computation(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.lm_score import (
        bigram_interpolated_cross_entropy,
    )

    ref_texts = ["a b a b c", "b a b", "c a"]
    ref = spark.createDataFrame(
        list(enumerate(ref_texts)), ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b a b a"), (3, "z z"), (4, ""), (5, "a")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_tokens, r.bits_per_token)
        for r in bigram_interpolated_cross_entropy(docs, ref_docs=ref).collect()
    }
    assert got[1] == (3, _hand_bigram_bits(ref_texts, ["a", "b", "c"]))
    assert got[2] == (4, _hand_bigram_bits(ref_texts, ["b", "a", "b", "a"]))
    assert got[3] == (2, _hand_bigram_bits(ref_texts, ["z", "z"]))
    # zero-token row kept with NULL bits; single token = unigram only
    assert got[4] == (0, None)
    assert got[5] == (1, _hand_bigram_bits(ref_texts, ["a"]))


def test_bigram_beats_unigram_on_ordered_text(spark):
    """The bigram model must reward in-domain ORDER: a document whose
    tokens are reference-frequent but scrambled scores worse than the
    same tokens in reference order."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.lm_score import (
        bigram_interpolated_cross_entropy,
    )

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "fox the brown quick")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.bits_per_token
           for r in bigram_interpolated_cross_entropy(docs, ref_docs=ref).collect()}
    assert got[1] < got[2]


def _hand_kn_bits(ref_texts, doc_tokens, d=0.75, alpha=0.5):
    """Independent Python recomputation of interpolated Kneser-Ney."""
    from collections import Counter, defaultdict

    uni = Counter()
    bi = Counter()
    for t in ref_texts:
        toks = [x for x in t.split(" ") if x]
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    V = len(uni)
    B = len(bi)
    total = sum(uni.values())
    c1 = Counter()
    fwd = defaultdict(set)
    bwd = defaultdict(set)
    for (a, b), n in bi.items():
        c1[a] += n
        fwd[a].add(b)
        bwd[b].add(a)

    def p_cont(t):
        return (len(bwd.get(t, ())) + alpha) / (B + alpha * (V + 1))

    def p_kn(a, b):
        n1 = c1.get(a, 0)
        if n1 == 0:
            return p_cont(b)
        return (max(bi.get((a, b), 0) - d, 0) / n1
                + d * len(fwd[a]) / n1 * p_cont(b))

    logs = [math.log2((uni.get(doc_tokens[0], 0) + alpha)
                      / (total + alpha * (V + 1)))]
    for a, b in zip(doc_tokens, doc_tokens[1:]):
        logs.append(math.log2(p_kn(a, b)))
    return round(-sum(logs) / len(logs), 4)


def test_kneser_ney_matches_hand_computation(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.lm_score import (
        kneser_ney_cross_entropy,
    )

    ref_texts = ["a b a b c", "b a b", "c a", "d c a b"]
    ref = spark.createDataFrame(list(enumerate(ref_texts)), ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d c a b a"), (3, "z q"), (4, ""), (5, "b")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_tokens, r.bits_per_token)
        for r in kneser_ney_cross_entropy(docs, ref_docs=ref).collect()
    }
    assert got[1] == (3, _hand_kn_bits(ref_texts, ["a", "b", "c"]))
    assert got[2] == (5, _hand_kn_bits(ref_texts, ["d", "c", "a", "b", "a"]))
    # fully OOV: unseen prefix backs off to smoothed continuation
    assert got[3] == (2, _hand_kn_bits(ref_texts, ["z", "q"]))
    assert got[4] == (0, None)
    assert got[5] == (1, _hand_kn_bits(ref_texts, ["b"]))


def test_kneser_ney_demotes_single_context_tokens(spark):
    """The KN property: a token frequent ONLY after one fixed context
    ('francisco' after 'san') gets low continuation probability in a
    novel context, while an equally-frequent token seen after many
    contexts scores better there."""
    ref_rows = [(i, "san francisco") for i in range(10)]
    ref_rows += [(100 + i, f"ctx{i} door") for i in range(10)]
    ref = spark.createDataFrame(ref_rows, ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(1, "new francisco"), (2, "new door")], ["doc_id", "text"]
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.lm_score import (
        kneser_ney_cross_entropy,
    )

    got = {r.doc_id: r.bits_per_token
           for r in kneser_ney_cross_entropy(docs, ref_docs=ref).collect()}
    # both bigrams are unseen; 'door' continues 10 distinct contexts,
    # 'francisco' only one — door must score strictly better
    assert got[2] < got[1]
