"""Signed random projection: JL distance preservation within the
ε-band on the testdata embeddings, norm preservation in expectation,
determinism across layouts and separate invocations (corpus projected
today == query projected tomorrow), seed sensitivity, pass-through of
other columns, and the zero-shuffle plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.projection import (
    random_projection,
)
from data_pipeline_project_using_telegram_and_aws_spark.sources.tables import load_table


def _vecs(spark, n=40):
    return (
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
        .limit(n)
        .select("vec_id", "embedding", "label")
    )


def _collect_map(df, col="embedding"):
    return {r["vec_id"]: list(r[col]) for r in df.collect()}


def _dist2(a, b):
    return sum((x - y) ** 2 for x, y in zip(a, b))


def test_jl_distance_preservation(spark):
    """Median relative squared-distance distortion over all pairs stays
    inside the k=32 JL band (≈ 1/√k ≈ 0.18); measured on this fixture
    and pinned with margin — a regression in the sign derivation or
    scaling breaks this hard."""
    vecs = _vecs(spark)
    orig = _collect_map(vecs)
    proj = _collect_map(random_projection(vecs, 32))
    ids = sorted(orig)
    dim = len(orig[ids[0]])
    assert all(len(proj[i]) == 32 for i in ids) and dim > 32
    dists = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            d0 = _dist2(orig[ids[a]], orig[ids[b]])
            d1 = _dist2(proj[ids[a]], proj[ids[b]])
            if d0 > 0:
                dists.append(abs(d1 - d0) / d0)
    dists.sort()
    assert dists[len(dists) // 2] < 0.25  # median distortion
    assert dists[int(len(dists) * 0.9)] < 0.6  # tail distortion


def test_norm_preservation_in_expectation(spark):
    vecs = _vecs(spark)
    orig = _collect_map(vecs)
    proj = _collect_map(random_projection(vecs, 32))
    r = [
        math.sqrt(_dist2(proj[i], [0] * 32))
        / math.sqrt(_dist2(orig[i], [0] * len(orig[i])))
        for i in orig
    ]
    assert 0.9 < sum(r) / len(r) < 1.1  # mean norm ratio ≈ 1


def test_determinism_layouts_invocations_and_seed(spark):
    vecs = _vecs(spark, n=20)
    a = _collect_map(random_projection(vecs, 16, seed=7))
    b = _collect_map(random_projection(vecs.repartition(9), 16, seed=7))
    assert a == b  # layout-stable
    # a "query" projected in a separate invocation lands identically
    one = vecs.filter("vec_id = %d" % sorted(a)[0])
    q = _collect_map(random_projection(one, 16, seed=7))
    assert q[sorted(a)[0]] == a[sorted(a)[0]]
    c = _collect_map(random_projection(vecs, 16, seed=8))
    assert a != c  # seed matters


def test_passthrough_outcol_plan_and_validation(spark):
    vecs = _vecs(spark, n=5)
    out = random_projection(vecs, 8, out_col="proj")
    assert set(out.columns) == {"vec_id", "embedding", "label", "proj"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection
    with pytest.raises(ValueError, match="out_dim"):
        random_projection(vecs, 0)
