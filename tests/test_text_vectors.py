"""Hashed TF-IDF vector pins: exact recomputation in Python (hash →
tf-idf → densify → normalize), similarity ordering (near-duplicate
texts closer than unrelated ones), zero-token handling, determinism,
and composition with the kNN join."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.text_vectors import (
    hashed_tfidf_vectors,
)

ROWS = [
    (0, "spark shuffles data between executors during wide joins"),
    (1, "spark shuffles data between executors during wide joins today"),
    (2, "violets bloom quietly beneath the garden wall in april"),
    (3, ""),
]
DIM = 64


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text"])


@pytest.fixture(scope="module")
def vecs(spark, docs):
    return {
        r["doc_id"]: list(r["embedding"])
        for r in hashed_tfidf_vectors(docs, dim=DIM).collect()
    }


def test_matches_python_recomputation(spark, docs, vecs):
    """Recompute doc 0's vector independently, using Spark only for the
    xxhash64 bucket assignment (the one engine-defined primitive)."""
    terms = sorted(
        {t for _, text in ROWS for t in text.split() if t}
    )
    buckets = {
        r["t"]: r["b"]
        for r in spark.createDataFrame([(t,) for t in terms], ["t"])
        .select("t", F.pmod(F.xxhash64("t"), F.lit(DIM)).alias("b"))
        .collect()
    }
    n_docs = len(ROWS)
    # per-bucket df across docs
    doc_buckets = [
        {buckets[t] for t in text.split() if t} for _, text in ROWS
    ]
    df = {}
    for bs in doc_buckets:
        for b in bs:
            df[b] = df.get(b, 0) + 1
    want = [0.0] * DIM
    tf = {}
    for t in ROWS[0][1].split():
        tf[buckets[t]] = tf.get(buckets[t], 0) + 1
    for b, f in tf.items():
        want[b] = f * (math.log((n_docs + 1) / (df[b] + 1)) + 1.0)
    nrm = math.sqrt(sum(x * x for x in want))
    want = [x / nrm for x in want]
    got = vecs[0]
    assert len(got) == DIM
    for g, w in zip(got, want):
        assert abs(g - w) < 1e-6


def test_similarity_ordering_and_zero_docs(vecs):
    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))  # unit vectors

    assert cos(vecs[0], vecs[1]) > 0.9
    assert cos(vecs[0], vecs[2]) < 0.3
    assert all(x == 0.0 for x in vecs[3])
    for d in (0, 1, 2):
        assert abs(sum(x * x for x in vecs[d]) - 1.0) < 1e-6


def test_deterministic_across_layouts(spark, docs, vecs):
    again = {
        r["doc_id"]: list(r["embedding"])
        for r in hashed_tfidf_vectors(
            docs.repartition(7), dim=DIM
        ).collect()
    }
    assert again == vecs


def test_composes_with_knn_join(spark, docs):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.semdedup import (
        knn_join,
    )

    emb = hashed_tfidf_vectors(docs, dim=DIM).withColumnRenamed(
        "doc_id", "vec_id"
    )
    nn = knn_join(emb.filter("vec_id != 3"), knn=1, k=1, sample_n=8)
    top = {r["vec_id"]: r["neighbor_id"] for r in nn.collect()}
    assert top[0] == 1 and top[1] == 0  # the near-duplicates find each other


def test_pool_vectors_mean_and_norm(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.text_vectors import (
        pool_vectors,
    )

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (0, [0.0, 1.0]),
            (1, [2.0, 0.0]),
        ],
        ["doc_id", "embedding"],
    )
    got = {
        r["doc_id"]: list(r["embedding"])
        for r in pool_vectors(df, "doc_id").collect()
    }
    # doc 0: mean (0.5, 0.5) → normalized (√2/2, √2/2)
    assert abs(got[0][0] - 0.7071067) < 1e-5
    assert abs(got[0][1] - 0.7071067) < 1e-5
    assert got[1] == [1.0, 0.0]
    raw = {
        r["doc_id"]: list(r["embedding"])
        for r in pool_vectors(df, "doc_id", normalize=False).collect()
    }
    assert raw[0] == [0.5, 0.5] and raw[1] == [2.0, 0.0]
