from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.chunking import (
    chunk_documents,
)


def _doc(spark, n_tokens: int):
    text = " ".join(f"t{i}" for i in range(n_tokens))
    return spark.createDataFrame([(1, text)], ["doc_id", "text"])


def test_chunk_boundaries_and_overlap(spark):
    rows = sorted(
        chunk_documents(_doc(spark, 25), chunk_tokens=10, overlap=3).collect(),
        key=lambda r: r.chunk_index,
    )
    # stride 7: starts 0,7,14,21 — 21 covers tokens 21..24
    assert [r.chunk_start for r in rows] == [0, 7, 14, 21]
    assert [r.n_tokens for r in rows] == [10, 10, 10, 4]
    assert rows[0].chunk_text.split()[-3:] == rows[1].chunk_text.split()[:3]
    # every token appears; reconstruction from strides matches original
    rebuilt = rows[0].chunk_text.split()
    for r in rows[1:]:
        rebuilt += r.chunk_text.split()[3:]
    assert rebuilt == [f"t{i}" for i in range(25)]


def test_short_and_empty_documents(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "   ")], ["doc_id", "text"]
    )
    rows = chunk_documents(df, chunk_tokens=10, overlap=2).collect()
    by_doc = {r.doc_id: r for r in rows}
    assert set(by_doc) == {1}  # empty docs vanish
    assert by_doc[1].n_tokens == 3 and by_doc[1].chunk_index == 0


def test_exact_multiple_has_no_empty_tail(spark):
    rows = chunk_documents(_doc(spark, 20), chunk_tokens=10, overlap=0).collect()
    assert sorted(r.n_tokens for r in rows) == [10, 10]


def test_no_shuffle(spark):
    plan = (
        chunk_documents(_doc(spark, 50))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_documents(_doc(spark, 10), chunk_tokens=8, overlap=8)


def test_doc_shorter_than_overlap_yields_one_chunk(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    rows = chunk_documents(df, chunk_tokens=10, overlap=3).collect()
    assert len(rows) == 1
    assert rows[0].chunk_index == 0 and rows[0].n_tokens == 2


def test_chunking_reconstruction_property_batch(spark):
    """Randomized reconstruction invariant over one batched run: for any
    doc, dropping each later chunk's first `overlap` tokens and
    concatenating reproduces the original token stream exactly."""
    import random

    rng = random.Random(17)
    docs = [
        (i, " ".join(f"x{rng.randrange(50)}" for _ in range(rng.randrange(1, 60))))
        for i in range(50)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    ck, ov = 12, 5
    rows = chunk_documents(df, chunk_tokens=ck, overlap=ov).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in docs:
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_index)
        rebuilt = chunks[0].chunk_text.split()
        for c in chunks[1:]:
            rebuilt += c.chunk_text.split()[ov:]
        assert rebuilt == text.split(), doc_id
        # chunk sizes: all full except possibly the last
        for c in chunks[:-1]:
            assert c.n_tokens == ck
