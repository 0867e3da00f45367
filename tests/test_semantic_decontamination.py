"""Semantic (embedding-space) decontamination: the exact broadcast path
against a NumPy full-matrix oracle, the banded LSH path's subset +
planted-recall properties, and the zero-shuffle plan pin for the
broadcast path (the corpus must never move for an MB-scale eval suite).
"""

from __future__ import annotations

import numpy as np

from data_pipeline_project_using_telegram_and_aws_spark.operators.decontamination import (
    semantic_contamination_report,
    semantically_contaminated_ids,
)

DIMS = 8
TAU = 0.90


def _vectors():
    """Deterministic corpus/eval embeddings with planted contamination:
    train 0 is eval 100 verbatim; train 1 is eval 101 lightly perturbed
    (cos ~ 0.9999); the rest are seeded gaussians — whatever random
    pairs clear tau, the NumPy oracle clears them too."""
    rng = np.random.RandomState(7)
    ev = {100 + i: rng.randn(DIMS) for i in range(4)}
    tr = {i: rng.randn(DIMS) for i in range(30)}
    tr[0] = ev[100].copy()
    tr[1] = ev[101] + 1e-4 * rng.randn(DIMS)
    return tr, ev


def _df(spark, vecs):
    return spark.createDataFrame(
        [(int(k), [float(x) for x in v]) for k, v in sorted(vecs.items())],
        "vec_id long, embedding array<double>",
    )


def _numpy_pairs(tr, ev, tau=TAU):
    out = set()
    for t, tv in tr.items():
        for e, evv in ev.items():
            cos = round(
                float(
                    tv @ evv / (np.linalg.norm(tv) * np.linalg.norm(evv))
                ),
                4,
            )
            if cos >= tau:
                out.add((t, e, cos))
    return out


def test_broadcast_path_matches_numpy_oracle(spark):
    tr, ev = _vectors()
    got = {
        (r["train_doc_id"], r["eval_doc_id"], r["cos_sim"])
        for r in semantic_contamination_report(
            _df(spark, tr), _df(spark, ev), tau=TAU
        ).collect()
    }
    want = _numpy_pairs(tr, ev)
    assert got == want
    # the planted pairs are in there
    assert any(t == 0 and e == 100 for t, e, _ in got)
    assert any(t == 1 and e == 101 for t, e, _ in got)


def test_banded_path_subset_with_planted_recall(spark):
    tr, ev = _vectors()
    exact = {
        (r["train_doc_id"], r["eval_doc_id"], r["cos_sim"])
        for r in semantic_contamination_report(
            _df(spark, tr), _df(spark, ev), tau=TAU
        ).collect()
    }
    banded = {
        (r["train_doc_id"], r["eval_doc_id"], r["cos_sim"])
        for r in semantic_contamination_report(
            _df(spark, tr),
            _df(spark, ev),
            tau=TAU,
            method="banded",
            n_planes=16,
            rows_per_band=4,
            dims=DIMS,
        ).collect()
    }
    # exact rescoring on candidates: banded rows are a subset of exact
    assert banded <= exact
    # a verbatim copy shares every sign bit, so every band matches:
    # the planted pairs cannot be missed
    assert any(t == 0 and e == 100 for t, e, _ in banded)
    assert any(t == 1 and e == 101 for t, e, _ in banded)


def test_contaminated_ids_are_distinct_flag_handles(spark):
    tr, ev = _vectors()
    ids = [
        r["train_doc_id"]
        for r in semantically_contaminated_ids(
            _df(spark, tr), _df(spark, ev), tau=TAU
        ).collect()
    ]
    want = {t for t, _, _ in _numpy_pairs(tr, ev)}
    assert sorted(ids) == sorted(want)
    assert len(ids) == len(set(ids))


def test_broadcast_path_never_shuffles_the_corpus(spark):
    tr, ev = _vectors()
    plan = (
        semantic_contamination_report(_df(spark, tr), _df(spark, ev))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") == 0


def test_empty_eval_set_reports_nothing(spark):
    tr, _ = _vectors()
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    assert (
        semantic_contamination_report(_df(spark, tr), empty).count() == 0
    )


def test_unknown_method_and_missing_dims_raise(spark):
    import pytest

    tr, ev = _vectors()
    with pytest.raises(ValueError, match="unknown method"):
        semantic_contamination_report(
            _df(spark, tr), _df(spark, ev), method="annoy"
        ).collect()
    with pytest.raises(ValueError, match="needs dims"):
        semantic_contamination_report(
            _df(spark, tr), _df(spark, ev), method="banded"
        ).collect()


def test_against_table_matches_inline_report(spark, tmp_path):
    """The persisted-eval-table probe is the inline broadcast path with
    the eval side read from the catalog — identical rows."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.decontamination import (
        build_eval_embedding_table,
        semantic_contamination_against_table,
    )

    tr, ev = _vectors()
    build_eval_embedding_table(_df(spark, ev), "eval_emb_sem_test")
    try:
        got = {
            (r["train_doc_id"], r["eval_doc_id"], r["cos_sim"])
            for r in semantic_contamination_against_table(
                spark, _df(spark, tr), "eval_emb_sem_test", tau=TAU
            ).collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS eval_emb_sem_test")
    assert got == _numpy_pairs(tr, ev)
