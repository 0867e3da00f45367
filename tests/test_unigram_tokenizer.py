"""Unigram-LM tokenizer pins: the structural contract (single-char
floor, probability distribution, vocab-size target, concatenation
invariant), Viterbi optimality against an independent brute-force
enumeration, determinism, compression on repetitive text, and the
encode plan shape (broadcast-only, zero-token rows kept)."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.unigram_tokenizer import (
    train_unigram,
    unigram_encode,
)

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cats sat on the mats"),
    (2, "thematic thesis on the theme"),
    (3, "cat mat sat that"),
    (4, "the the the theme them"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


@pytest.fixture(scope="module")
def pieces(spark, docs):
    return train_unigram(docs, vocab_size=30, max_piece_len=4).cache()


def test_vocab_contract(pieces, docs):
    rows = pieces.collect()
    vocab = {r["piece"]: r["logprob"] for r in rows}
    # every character of the corpus survives (segmentability floor)
    chars = set("".join(t for _, t in CORPUS).replace(" ", ""))
    assert chars <= {p for p in vocab if len(p) == 1}
    # target respected
    assert len(vocab) <= 30
    # a proper distribution
    assert abs(sum(math.exp(lp) for lp in vocab.values()) - 1.0) < 1e-9
    # the corpus's dominant substring survives pruning as a piece
    assert any("the" in p for p in vocab if len(p) > 1)


def test_encode_concatenation_invariant(docs, pieces):
    enc = unigram_encode(docs, pieces, max_piece_len=4)
    joined = {
        r["doc_id"]: "".join(r["pieces"]) for r in enc.collect()
    }
    for doc_id, text in CORPUS:
        assert joined[doc_id] == text.replace(" ", "")


def test_zero_token_doc_keeps_row(docs, pieces):
    enc = {r["doc_id"]: r for r in unigram_encode(docs, pieces).collect()}
    assert enc[5]["pieces"] == []
    assert enc[5]["n_pieces"] == 0


def test_viterbi_optimality_vs_bruteforce(spark, docs, pieces):
    """The returned segmentation maximizes total logprob: enumerate ALL
    segmentations of each short word independently and compare."""
    logp = {r["piece"]: r["logprob"] for r in pieces.collect()}

    def all_segmentations(word):
        n = len(word)
        for cuts in range(2 ** max(0, n - 1)):
            pieces_, start = [], 0
            for i in range(1, n):
                if cuts & (1 << (i - 1)):
                    pieces_.append(word[start:i])
                    start = i
            pieces_.append(word[start:])
            yield pieces_

    words = ["the", "cats", "theme", "mat", "thesis"]
    enc = unigram_encode(
        spark.createDataFrame(
            list(enumerate(words)), ["doc_id", "text"]
        ),
        pieces,
        max_piece_len=4,
    ).collect()
    got = {words[r["doc_id"]]: list(r["pieces"]) for r in enc}
    for w in words:
        best = max(
            (
                sum(logp[p] for p in seg)
                for seg in all_segmentations(w)
                if all(p in logp for p in seg)
            ),
        )
        score = sum(logp[p] for p in got[w])
        assert abs(score - best) < 1e-9, (w, got[w], score, best)


def test_training_is_deterministic(spark, docs):
    a = sorted(
        (r["piece"], round(r["logprob"], 12))
        for r in train_unigram(docs, vocab_size=30, max_piece_len=4).collect()
    )
    b = sorted(
        (r["piece"], round(r["logprob"], 12))
        for r in train_unigram(
            docs.repartition(7), vocab_size=30, max_piece_len=4
        ).collect()
    )
    assert a == b


def test_compresses_repetitive_text(spark):
    """A corpus dominated by one long word should yield multi-char
    pieces that beat character-level encoding."""
    df = spark.createDataFrame(
        [(i, "abracadabra " * 5) for i in range(10)], ["doc_id", "text"]
    )
    pieces = train_unigram(df, vocab_size=20, max_piece_len=6)
    enc = unigram_encode(df, pieces, max_piece_len=6).collect()[0]
    n_chars = len("abracadabra") * 5
    assert enc["n_pieces"] < n_chars / 2


def test_unseen_chars_fall_back_to_singletons(spark, docs, pieces):
    """Encoding a word with characters never seen in training segments
    them as single-char fallbacks instead of failing."""
    enc = unigram_encode(
        spark.createDataFrame([(0, "theZZ")], ["doc_id", "text"]),
        pieces,
        max_piece_len=4,
    ).collect()[0]
    assert "".join(enc["pieces"]) == "theZZ"


def test_encode_plan_is_broadcast_only(spark, docs, pieces):
    """The corpus side never shuffles by word: the word → pieces join
    is a broadcast, pinned with auto-broadcast disabled."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            unigram_encode(docs, pieces)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        # the only sort-merge join is the final doc-keyed reassembly —
        # never a word-keyed shuffle of the corpus
        for frag in plan.split("SortMergeJoin")[1:]:
            assert frag.lstrip().startswith("[doc_id")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_byte_fallback_closes_the_alphabet(spark, docs, pieces):
    """With byte_fallback, unseen characters emit <0xNN> byte pieces —
    the piece alphabet stays trained-vocab ∪ byte symbols; without it
    the raw character leaks through."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.unigram_tokenizer import (
        unigram_encode,
    )

    odd = spark.createDataFrame([(0, "theß")], ["doc_id", "text"])
    plain = unigram_encode(odd, pieces, max_piece_len=4).collect()[0]
    assert "ß" in plain["pieces"]
    fb = unigram_encode(
        odd, pieces, max_piece_len=4, byte_fallback=True
    ).collect()[0]
    # ß is two UTF-8 bytes: C3 9F, in order
    assert fb["pieces"][-2:] == ["<0xC3>", "<0x9F>"]
    assert "ß" not in fb["pieces"]
    vocab = {r["piece"] for r in pieces.collect()}
    for p in fb["pieces"]:
        assert p in vocab or (p.startswith("<0x") and len(p) == 6)
    # known text is untouched by the flag
    known = unigram_encode(
        spark.createDataFrame([(0, "the cat")], ["doc_id", "text"]),
        pieces, max_piece_len=4, byte_fallback=True,
    ).collect()[0]
    assert "".join(known["pieces"]) == "thecat"


def test_pieces_artifact_round_trip(spark, docs, pieces, tmp_path):
    """The trained piece table persists as plain parquet and the
    reloaded artifact encodes identically — the tokenizer ships as
    data, no pickling."""
    path = str(tmp_path / "pieces")
    pieces.write.parquet(path)
    reloaded = spark.read.parquet(path)
    a = {
        r["doc_id"]: list(r["pieces"])
        for r in unigram_encode(docs, pieces, max_piece_len=4).collect()
    }
    b = {
        r["doc_id"]: list(r["pieces"])
        for r in unigram_encode(docs, reloaded, max_piece_len=4).collect()
    }
    assert a == b


def test_prune_is_gradual(spark):
    """Regression: prune_frac was dead code (max() instead of min()),
    so the entire overage was cut in one round with no EM re-estimation
    between prunes. With a small prune_frac the trainer must still
    converge to the target size, and a full-overage prune_frac=1.0 run
    must also land on target — both ending EXACTLY at or below
    vocab_size with every single character retained."""
    rows = [(i, ("abcdef" * 3) + "ghij" * 2 + "kl" * i) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for frac in (0.2, 1.0):
        pieces = {
            r["piece"]
            for r in train_unigram(
                docs, vocab_size=14, max_piece_len=4, prune_frac=frac
            ).collect()
        }
        assert len(pieces) <= 14
        chars = {c for _, t in rows for c in t}
        assert chars <= pieces  # single-character floor survives
