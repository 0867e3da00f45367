"""Retrieval metrics (operators/retrieval_metrics.py) against hand
computations and an independent pure-Python trec_eval-convention model."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st

from data_pipeline_project_using_telegram_and_aws_spark.operators.retrieval_metrics import (
    retrieval_metrics,
    retrieval_metrics_summary,
)


def _results(spark, rows):
    return spark.createDataFrame(rows, ["query_id", "doc_id", "rank"])


def _qrels(spark, rows, graded=False):
    cols = ["query_id", "doc_id"] + (["rel"] if graded else [])
    return spark.createDataFrame(rows, cols)


# ------------------------------------------------- independent model
def _py_metrics(results, qrels, k):
    """results: {q: [doc in rank order]}; qrels: {q: {doc: rel}}."""
    out = {}
    for q, judged in qrels.items():
        rel_docs = {d: r for d, r in judged.items() if r > 0}
        if not rel_docs:
            continue
        top = results.get(q, [])[:k]
        hits = [(i + 1, d) for i, d in enumerate(top) if d in rel_docs]
        dcg = sum(
            (2 ** rel_docs[d] - 1) / math.log2(rk + 1) for rk, d in hits
        )
        ideal = sorted(rel_docs.values(), reverse=True)[:k]
        idcg = sum(
            (2 ** r - 1) / math.log2(i + 2) for i, r in enumerate(ideal)
        )
        out[q] = {
            "recall": len(hits) / len(rel_docs),
            "precision": len(hits) / k,
            "mrr": 1.0 / hits[0][0] if hits else 0.0,
            "ndcg": dcg / idcg,
            "hit": 1.0 if hits else 0.0,
        }
    return out


def test_hand_computed_binary_metrics(spark):
    # query 1: relevant {10, 11, 12}; top-3 retrieved (10, 99, 11)
    res = _results(
        spark, [(1, 10, 1), (1, 99, 2), (1, 11, 3), (1, 12, 4)]
    )
    qr = _qrels(spark, [(1, 10), (1, 11), (1, 12)])
    row = retrieval_metrics(res, qr, k=3).collect()[0]
    assert row.recall == pytest.approx(2 / 3)
    assert row.precision == pytest.approx(2 / 3)
    assert row.mrr == pytest.approx(1.0)
    # DCG = 1/log2(2) + 1/log2(4); IDCG = 1/log2(2)+1/log2(3)+1/log2(4)
    dcg = 1.0 + 1.0 / 2.0
    idcg = 1.0 + 1.0 / math.log2(3) + 0.5
    assert row.ndcg == pytest.approx(round(dcg / idcg, 6))
    assert row.hit == 1.0 and row.n_relevant == 3 and row.n_retrieved == 3


def test_graded_ndcg_orders_by_gain(spark):
    # swapping a grade-3 doc below a grade-1 doc must lower nDCG
    qr = _qrels(spark, [(1, 10, 3), (1, 11, 1)], graded=True)
    good = _results(spark, [(1, 10, 1), (1, 11, 2)])
    bad = _results(spark, [(1, 11, 1), (1, 10, 2)])
    g = retrieval_metrics(good, qr, k=2, rel_col="rel").collect()[0]
    b = retrieval_metrics(bad, qr, k=2, rel_col="rel").collect()[0]
    assert g.ndcg == pytest.approx(1.0)
    assert b.ndcg < 1.0
    want_b = (1.0 + 7.0 / math.log2(3)) / (7.0 + 1.0 / math.log2(3))
    assert b.ndcg == pytest.approx(round(want_b, 6))


def test_zero_result_query_scores_zero_not_absent(spark):
    res = _results(spark, [(1, 10, 1)])
    qr = _qrels(spark, [(1, 10), (2, 20)])
    rows = {r.query_id: r for r in retrieval_metrics(res, qr, k=5).collect()}
    assert set(rows) == {1, 2}
    z = rows[2]
    assert (z.recall, z.precision, z.mrr, z.ndcg, z.hit) == (0, 0, 0, 0, 0)
    assert z.n_retrieved == 0


def test_no_relevant_judgments_query_excluded(spark):
    res = _results(spark, [(3, 30, 1)])
    qr = _qrels(spark, [(3, 30, 0)], graded=True)  # judged NOT relevant
    assert retrieval_metrics(res, qr, k=5, rel_col="rel").count() == 0


def test_duplicate_qrels_keep_max_grade(spark):
    res = _results(spark, [(1, 10, 1)])
    qr = _qrels(spark, [(1, 10, 1), (1, 10, 3)], graded=True)
    row = retrieval_metrics(res, qr, k=2, rel_col="rel").collect()[0]
    # one judgment at rel=3: recall 1/1, not 2 hits over 2 judgments
    assert row.recall == 1.0 and row.n_relevant == 1
    assert row.ndcg == pytest.approx(1.0)


def test_unjudged_retrieved_docs_do_not_count(spark):
    res = _results(spark, [(1, 99, 1), (1, 98, 2), (1, 10, 3)])
    qr = _qrels(spark, [(1, 10)])
    row = retrieval_metrics(res, qr, k=3).collect()[0]
    assert row.recall == 1.0
    assert row.precision == pytest.approx(1 / 3)
    assert row.mrr == pytest.approx(1 / 3)


def test_summary_macro_averages(spark):
    res = _results(spark, [(1, 10, 1), (2, 99, 1)])
    qr = _qrels(spark, [(1, 10), (2, 20)])
    row = retrieval_metrics_summary(res, qr, k=1).collect()[0]
    assert row.n_queries == 2
    assert row.recall == pytest.approx(0.5)
    assert row.mrr == pytest.approx(0.5)
    assert row.hit == pytest.approx(0.5)
    with pytest.raises(ValueError, match="k="):
        retrieval_metrics(res, qr, k=0)


@settings(max_examples=25, deadline=None)
@given(
    res=st.lists(
        st.tuples(st.integers(0, 3), st.permutations(list(range(8)))),
        min_size=0,
        max_size=4,
        unique_by=lambda t: t[0],
    ),
    qrels=st.lists(
        st.tuples(
            st.integers(0, 3), st.integers(0, 7), st.integers(0, 3)
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: (t[0], t[1]),
    ),
    k=st.sampled_from([1, 3, 8]),
)
def test_python_model_fuzz(spark, res, qrels, k):
    res_rows = [
        (q, d, i + 1) for q, docs in res for i, d in enumerate(docs)
    ]
    model_res = {q: list(docs) for q, docs in res}
    model_qr = {}
    for q, d, r in qrels:
        model_qr.setdefault(q, {})[d] = r
    want = _py_metrics(model_res, model_qr, k)
    if not res_rows:
        res_rows = [(999, 0, 1)]  # schema anchor; query 999 unjudged
    got = {
        r.query_id: r
        for r in retrieval_metrics(
            _results(spark, res_rows),
            _qrels(spark, list(qrels), graded=True),
            k=k,
            rel_col="rel",
        ).collect()
    }
    assert set(got) == set(want)
    for q, m in want.items():
        for name, v in m.items():
            assert got[q][name] == pytest.approx(v, abs=1e-6), (q, name)


def test_measures_ivf_recall_against_brute_force_oracle(spark):
    """The evaluator in anger: brute-force top-k as the qrels, IVF as
    the system under test — summary recall@k must equal the
    independently computed overlap fraction, and probing EVERY list
    must push recall to exactly 1.0 (IVF with full probes IS brute
    force on these lists)."""
    import pyspark.sql.functions as F

    from data_pipeline_project_using_telegram_and_aws_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    k = 5
    queries = emb.filter(F.col("vec_id") < 4)
    truth = brute_force_topk(emb, queries, k=k).select(
        "query_id", F.col("vec_id").alias("doc_id")
    )
    ivf = ivf_topk(
        emb, n_centroids=8, n_queries=4, nprobe=2, k=k
    ).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.col("ivf_rank").alias("rank"),
    )
    got = retrieval_metrics_summary(ivf, truth, k=k).collect()[0]
    truth_sets = {}
    for r in truth.collect():
        truth_sets.setdefault(r.query_id, set()).add(r.doc_id)
    ivf_sets = {}
    for r in ivf.collect():
        ivf_sets.setdefault(r.query_id, set()).add(r.doc_id)
    want_recall = sum(
        len(truth_sets[q] & ivf_sets.get(q, set())) / len(truth_sets[q])
        for q in truth_sets
    ) / len(truth_sets)
    assert got.n_queries == 4
    assert got.recall == pytest.approx(round(want_recall, 4), abs=1e-4)
    full = ivf_topk(emb, n_centroids=8, n_queries=4, nprobe=8, k=k).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.col("ivf_rank").alias("rank"),
    )
    full_row = retrieval_metrics_summary(full, truth, k=k).collect()[0]
    assert full_row.recall == pytest.approx(1.0)
    assert full_row.ndcg == pytest.approx(1.0)
