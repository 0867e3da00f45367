"""Embedding drift report: planted direction shift, planted rescale,
exact-copy stability, NULL-slice null-safe join, one-sided slices, and
the in-plan mixed-dimension guard."""

from __future__ import annotations

import pytest

from data_pipeline_project_using_telegram_and_aws_spark.operators.embedding_drift import (
    embedding_drift_report,
)

SCHEMA = "grp string, embedding array<float>"


def _vecs(axis: int, scales, dim: int = 4):
    out = []
    for s in scales:
        v = [0.0] * dim
        v[axis] = float(s)
        v[(axis + 1) % dim] = 0.1 * float(s)  # slight off-axis spread
        out.append(v)
    return out


def test_planted_shifts_and_stability(spark):
    scales = [1.0, 1.2, 1.4, 1.6, 1.8, 2.0]
    base_rows = (
        [("stable", v) for v in _vecs(0, scales)]
        + [("rotated", v) for v in _vecs(0, scales)]
        + [("scaled", v) for v in _vecs(0, scales)]
        + [("base_only", v) for v in _vecs(0, scales)]
    )
    cur_rows = (
        [("stable", v) for v in _vecs(0, scales)]  # exact copy
        + [("rotated", v) for v in _vecs(2, scales)]  # new direction
        + [("scaled", v) for v in _vecs(0, [3 * s for s in scales])]
        + [("cur_only", v) for v in _vecs(1, scales)]
    )
    rep = {
        r["grp"]: r
        for r in embedding_drift_report(
            spark.createDataFrame(base_rows, SCHEMA),
            spark.createDataFrame(cur_rows, SCHEMA),
            by=["grp"],
            norm_bins=8,
        ).collect()
    }
    assert rep["stable"]["centroid_cos"] == pytest.approx(1.0, abs=1e-5)
    assert rep["stable"]["norm_psi"] == pytest.approx(0.0, abs=1e-6)

    # direction moved, scale did not: cos collapses, norms agree
    assert rep["rotated"]["centroid_cos"] < 0.2
    assert rep["rotated"]["norm_psi"] == pytest.approx(0.0, abs=1e-6)

    # scale moved, direction did not: cos stays 1, psi blows up
    assert rep["scaled"]["centroid_cos"] == pytest.approx(1.0, abs=1e-5)
    assert rep["scaled"]["norm_psi"] > 0.25
    assert rep["scaled"]["mean_norm_cur"] == pytest.approx(
        3 * rep["scaled"]["mean_norm_base"], rel=1e-4
    )

    # one-sided slices: counts survive, comparative signals are NULL
    assert rep["base_only"]["n_cur"] == 0
    assert rep["base_only"]["centroid_cos"] is None
    assert rep["base_only"]["norm_psi"] is None
    assert rep["cur_only"]["n_base"] == 0
    assert rep["cur_only"]["centroid_cos"] is None


def test_null_slice_is_one_slice(spark):
    """A NULL slice value must behave exactly like any other slice —
    the struct-keyed join makes NULL==NULL by construction (the IVM
    null-group lesson)."""
    scales = [1.0, 1.5, 2.0, 2.5]
    base = spark.createDataFrame(
        [(None, v) for v in _vecs(0, scales)], SCHEMA
    )
    cur = spark.createDataFrame(
        [(None, v) for v in _vecs(0, scales)], SCHEMA
    )
    rows = embedding_drift_report(base, cur, by=["grp"]).collect()
    assert len(rows) == 1  # NOT two half-rows
    r = rows[0]
    assert r["grp"] is None
    assert r["n_base"] == r["n_cur"] == 4
    assert r["centroid_cos"] == pytest.approx(1.0, abs=1e-5)


def test_global_mode_and_null_vectors(spark):
    scales = [1.0, 1.5, 2.0, 2.5]
    base = spark.createDataFrame(
        [("a", v) for v in _vecs(0, scales)] + [("a", None)], SCHEMA
    )
    cur = spark.createDataFrame(
        [("a", v) for v in _vecs(0, scales)], SCHEMA
    )
    rows = embedding_drift_report(base, cur).collect()
    assert len(rows) == 1
    r = rows[0]
    assert "grp" not in r.asDict()
    assert r["n_base"] == 4  # the NULL vector is excluded
    assert r["centroid_cos"] == pytest.approx(1.0, abs=1e-5)


def test_mixed_dimension_guard_fires(spark):
    base = spark.createDataFrame(
        [("a", [1.0, 0.0, 0.0, 0.0]), ("a", [1.0, 0.0, 0.0])], SCHEMA
    )
    cur = spark.createDataFrame([("a", [1.0, 0.0, 0.0, 0.0])], SCHEMA)
    with pytest.raises(Exception, match="mixed vector dimensions"):
        embedding_drift_report(base, cur, by=["grp"]).collect()


def test_runs_on_the_embeddings_table(spark):
    """Smoke at testdata scale: the synthetic embeddings table drifts
    against a filtered slice of itself without NULL/shape surprises."""
    from data_pipeline_project_using_telegram_and_aws_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    vec_col = [
        c for c, t in emb.dtypes if t.startswith("array")
    ][0]
    half = emb.limit(200)
    rows = embedding_drift_report(
        half, half, vec_col=vec_col
    ).collect()
    assert len(rows) == 1
    assert rows[0]["centroid_cos"] == pytest.approx(1.0, abs=1e-5)
    assert rows[0]["norm_psi"] == pytest.approx(0.0, abs=1e-6)

    # plan hygiene: norms/cosine/PSI fold via JVM higher-order
    # functions — no Python stage anywhere in the report plan
    plan = (
        embedding_drift_report(half, half, vec_col=vec_col)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
