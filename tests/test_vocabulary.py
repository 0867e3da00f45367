from __future__ import annotations

from data_pipeline_project_using_telegram_and_aws_spark.operators.vocabulary import (
    build_vocab,
    encode_documents,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "rare unicorn words"),
        ],
        ["doc_id", "text"],
    )


def test_vocab_ranked_by_df_then_token(spark):
    vocab = {r.token: (r.token_id, r.df) for r in build_vocab(_docs(spark)).collect()}
    # df: the=2, sat=2, everything else 1; ties break lexicographically
    assert vocab["sat"][1] == 2 and vocab["the"][1] == 2
    assert vocab["sat"][0] == 1 and vocab["the"][0] == 2  # 'sat' < 'the'
    assert all(tid >= 1 for tid, _ in vocab.values())  # 0 reserved for OOV
    ids = [tid for tid, _ in vocab.values()]
    assert sorted(ids) == list(range(1, len(vocab) + 1))  # dense


def test_encode_orders_positions_and_counts_oov(spark):
    docs = _docs(spark)
    vocab = build_vocab(docs, vocab_size=4)  # keeps sat,the + 2 more
    vmap = {r.token: r.token_id for r in vocab.collect()}
    enc = {r.doc_id: r for r in encode_documents(docs, vocab).collect()}
    for doc_id, text in [(1, "the cat sat on the mat"), (2, "the dog sat")]:
        want = [vmap.get(t, 0) for t in text.split()]
        assert list(enc[doc_id].token_ids) == want
        assert enc[doc_id].n_tokens == len(want)
        assert enc[doc_id].n_oov == sum(1 for i in want if i == 0)
    # fully-OOV doc still encodes, as zeros
    assert enc[3].n_oov >= 1 and len(enc[3].token_ids) == 3


def test_vocab_is_deterministic_function_of_corpus(spark):
    a = {(r.token, r.token_id) for r in build_vocab(_docs(spark)).collect()}
    b = {
        (r.token, r.token_id)
        for r in build_vocab(_docs(spark).repartition(5)).collect()
    }
    assert a == b


def test_encode_then_pack_composes(spark):
    """The full trainer-prep chain: encode to ids, pack by the EXACT id
    count (n_tokens_col), every document placed exactly once."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
        pack_sequences,
        packing_stats,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j % 7}" for j in range(i % 15 + 1))) for i in range(50)],
        ["doc_id", "text"],
    )
    enc = encode_documents(docs, build_vocab(docs))
    packed = pack_sequences(
        enc, budget=24, n_shards=4, text_col=None, n_tokens_col="n_tokens"
    )
    assert packed.count() == 50  # nothing lost, nothing duplicated
    stats = packing_stats(packed, 24).collect()
    assert sum(r.seq_tokens for r in stats) == sum(
        r.n_tokens for r in enc.collect()
    )
    # a sequence overflows only via one straddling document
    for r in stats:
        assert r.seq_tokens <= 24 + 15


def test_encode_keeps_zero_token_documents(spark):
    """Row contract: one output row per input document, even when the
    text tokenizes to nothing (the posexplode-drops-the-doc hazard —
    downstream packing assumes every doc is placed exactly once)."""
    docs = spark.createDataFrame(
        [(1, "the cat"), (2, ""), (3, "   "), (4, None)],
        ["doc_id", "text"],
    )
    enc = {r.doc_id: r for r in encode_documents(docs, build_vocab(docs)).collect()}
    assert set(enc) == {1, 2, 3, 4}
    for d in (2, 3, 4):
        assert list(enc[d].token_ids) == []
        assert enc[d].n_tokens == 0 and enc[d].n_oov == 0
    assert enc[1].n_tokens == 2


def test_oov_report(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_pipeline_project_using_telegram_and_aws_spark.operators.vocabulary import (
        build_vocab,
        oov_report,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = build_vocab(docs)
    # the training corpus itself: zero OOV
    clean = oov_report(docs, vocab).collect()[0]
    assert clean["n_oov"] == 0 and clean["oov_rate"] == 0.0
    assert clean["n_tokens"] > 0

    # a drifted batch: half known tokens, half novel
    batch = spark.createDataFrame(
        [(0, "data stream zzzznovel1 zzzznovel2")], ["doc_id", "text"]
    )
    known = {r["token"] for r in vocab.select("token").collect()}
    assert {"data", "stream"} <= known
    rep = oov_report(batch, vocab).collect()[0]
    assert rep["n_tokens"] == 4
    assert rep["n_oov"] == 2 and rep["n_oov_types"] == 2
    assert rep["oov_rate"] == 0.5

    # empty batch: a zero row, not a crash
    empty = oov_report(
        spark.createDataFrame([(0, "")], ["doc_id", "text"]), vocab
    ).collect()[0]
    assert empty["n_tokens"] == 0 and empty["oov_rate"] == 0.0
