"""Piece-id pins: reserved layout (specials, byte symbols, lexicographic
learned pieces), re-derivation determinism, unk accounting, empty docs,
and the unigram → ids → pack composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.token_ids import (
    encode_ids,
    piece_ids,
)


@pytest.fixture(scope="module")
def vocab(spark):
    pieces = spark.createDataFrame(
        [("the",), ("cat",), ("at",), ("<unk>",)], ["piece"]
    )
    return piece_ids(pieces, byte_symbols=True).cache()


def test_layout(spark, vocab):
    ids = {r["piece"]: r["token_id"] for r in vocab.collect()}
    assert ids["<pad>"] == 0 and ids["<unk>"] == 1
    assert ids["<bos>"] == 2 and ids["<eos>"] == 3
    assert ids["<0x00>"] == 4 and ids["<0xFF>"] == 4 + 255
    # learned pieces: lexicographic after the reserved block; the
    # colliding "<unk>" keeps its reserved id (no duplicate row)
    learned = sorted(
        (p, i) for p, i in ids.items()
        if p in {"the", "cat", "at"}
    )
    base = 4 + 256
    assert learned == [("at", base), ("cat", base + 1), ("the", base + 2)]
    assert vocab.filter("piece = '<unk>'").count() == 1
    with pytest.raises(ValueError):
        piece_ids(vocab.select("piece"), specials=("<pad>",))


def test_rederivation_is_deterministic(spark, vocab):
    pieces = spark.createDataFrame(
        [("cat",), ("at",), ("the",)], ["piece"]
    ).repartition(3)
    again = {
        r["piece"]: r["token_id"]
        for r in piece_ids(pieces, byte_symbols=True).collect()
    }
    want = {r["piece"]: r["token_id"] for r in vocab.collect()}
    for p in ("the", "cat", "at"):
        assert again[p] == want[p]


def test_encode_ids_and_unk_accounting(spark, vocab):
    enc = spark.createDataFrame(
        [
            (0, ["the", "cat"]),
            (1, ["the", "zzz", "at"]),   # zzz unseen → unk
            (2, []),
        ],
        "doc_id long, pieces array<string>",
    )
    out = {r["doc_id"]: r for r in encode_ids(enc, vocab).collect()}
    ids = {r["piece"]: r["token_id"] for r in vocab.collect()}
    assert list(out[0]["token_ids"]) == [ids["the"], ids["cat"]]
    assert out[0]["n_unk"] == 0
    assert list(out[1]["token_ids"]) == [ids["the"], 1, ids["at"]]
    assert out[1]["n_unk"] == 1
    assert list(out[2]["token_ids"]) == [] and out[2]["n_tokens"] == 0


def test_unigram_to_ids_composition(spark):
    """End-to-end: train unigram → encode with byte fallback → ids —
    zero unk by construction (the closed-alphabet promise)."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.unigram_tokenizer import (
        train_unigram,
        unigram_encode,
    )

    docs = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the mat"), (2, "theß")],
        ["doc_id", "text"],
    )
    pieces = train_unigram(
        docs.filter("doc_id < 2"), vocab_size=25, max_piece_len=3
    )
    enc = unigram_encode(docs, pieces, max_piece_len=3, byte_fallback=True)
    vocab = piece_ids(pieces.select("piece"), byte_symbols=True)
    out = encode_ids(enc, vocab)
    assert out.agg(F.sum("n_unk")).collect()[0][0] == 0
    assert out.filter("doc_id = 2").collect()[0]["n_tokens"] > 0
