"""BPE training/encoding (operators/bpe.py) vs an independent pure-Python
reference implementation (the standard word-count BPE loop), plus the
row contract and the vocab-sized-Python claim."""

from __future__ import annotations

from collections import Counter

import pytest

from data_pipeline_project_using_telegram_and_aws_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_segment_words,
    train_bpe,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "low lower newest",
]


def _ref_train(texts, n_merges, min_pair_freq=2):
    """Independent reference: Sennrich-style BPE over word counts with
    (freq desc, pair lexicographic) tie-break."""
    words = Counter()
    for t in texts:
        words.update(w for w in t.split(" ") if w)
    vocab = {w: list(w) + [END_OF_WORD] for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += words[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        (a, b), _ = best
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        list(enumerate(CORPUS)), ["doc_id", "text"]
    )


def test_merges_match_reference(docs):
    got = train_bpe(docs, n_merges=12)
    want, _ = _ref_train(CORPUS, 12)
    assert got == want and len(got) > 3


def test_segmentation_matches_reference_vocab(docs, spark):
    merges, ref_vocab = _ref_train(CORPUS, 12)
    words = spark.createDataFrame(
        [(w,) for w in ref_vocab], ["word"]
    )
    got = {
        r.word: list(r.pieces)
        for r in bpe_segment_words(words, merges).collect()
    }
    assert got == ref_vocab


def test_segmentation_roundtrip_reconstructs_words(docs, spark):
    """Concatenating a word's pieces and stripping the end marker must
    reproduce the word — for trained words AND unseen ones."""
    merges = train_bpe(docs, n_merges=12)
    words = spark.createDataFrame(
        [("low",), ("lowest",), ("zebra",)], ["word"]
    )
    for r in bpe_segment_words(words, merges).collect():
        assert "".join(r.pieces) == r.word + END_OF_WORD


def test_encode_row_contract(docs, spark):
    merges = train_bpe(docs, n_merges=12)
    extra = spark.createDataFrame(
        [(100, "low newest"), (101, ""), (102, "   ")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in bpe_encode(extra, merges).collect()}
    assert len(out) == 3  # zero-token docs keep their row
    assert out[101].pieces == [] and out[101].n_pieces == 0
    assert out[102].pieces == [] and out[102].n_pieces == 0
    # pieces are position-ordered across the document
    joined = "".join(out[100].pieces)
    assert joined == "low" + END_OF_WORD + "newest" + END_OF_WORD
    assert out[100].n_pieces == len(out[100].pieces) > 0


def test_early_stop_on_min_pair_freq(spark):
    """A corpus of hapax words yields no merges at min_pair_freq=2
    unless words share structure; all-distinct chars → empty table."""
    docs = spark.createDataFrame([(0, "ab cd ef")], ["doc_id", "text"])
    assert train_bpe(docs, n_merges=10, min_pair_freq=2) == []


def test_roundtrip_property_on_random_words(spark):
    """Property: for ANY corpus and ANY word (trained-on or unseen),
    concatenating the BPE pieces reproduces word + END_OF_WORD, and no
    piece is empty."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcd", min_size=1, max_size=8)

    @settings(max_examples=15, deadline=None)
    @given(st.lists(word, min_size=2, max_size=12), st.lists(word, min_size=1, max_size=4))
    def check(corpus_words, probe_words):
        docs = spark.createDataFrame(
            [(0, " ".join(corpus_words))], ["doc_id", "text"]
        )
        merges = train_bpe(docs, n_merges=6, min_pair_freq=2)
        probes = spark.createDataFrame(
            [(w,) for w in set(probe_words)], ["word"]
        )
        for r in bpe_segment_words(probes, merges).collect():
            assert "".join(r.pieces) == r.word + END_OF_WORD
            assert all(p for p in r.pieces)

    check()


def test_merge_table_round_trip(spark, tmp_path):
    """save/load preserves the ranked merge list exactly, and the
    reloaded tokenizer encodes identically."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.bpe import (
        bpe_encode,
        load_merges,
        save_merges,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [(0, "low lower lowest"), (1, "new newer newest")],
        ["doc_id", "text"],
    )
    merges = train_bpe(docs, n_merges=6, min_pair_freq=1)
    path = str(tmp_path / "merges")
    save_merges(merges, spark, path)
    assert load_merges(spark, path) == merges
    a = {r["doc_id"]: r["pieces"] for r in bpe_encode(docs, merges).collect()}
    b = {
        r["doc_id"]: r["pieces"]
        for r in bpe_encode(docs, load_merges(spark, path)).collect()
    }
    assert a == b
