"""Similarity search: exactness of brute force, recall of the LSH path."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_project_using_telegram_and_aws_spark.operators import similarity as S

_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _vectors(spark, n=40, dims=16, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(dims)]))
    # vec n: a near-copy of vec 0 (tiny perturbation) → its top neighbor
    rows.append((n, [x + 0.001 for x in rows[0][1]]))
    return spark.createDataFrame(rows, _SCHEMA), {r[0]: r[1] for r in rows}


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_brute_force_matches_python_reference(spark):
    df, vecs = _vectors(spark)
    queries = df.filter(F.col("vec_id") == 0)
    got = S.brute_force_topk(df, queries, k=3).collect()
    expected = sorted(
        ((round(_cos(vecs[0], v), 4), i) for i, v in vecs.items() if i != 0),
        key=lambda t: (-t[0], t[1]),
    )[:3]
    assert [(r.vec_id, r.cos_sim) for r in got] == [
        (i, c) for c, i in expected
    ]
    assert got[0].vec_id == 40  # the planted near-copy wins


def test_lsh_bucket_determinism_and_recall(spark):
    df, _ = _vectors(spark, dims=64)
    b1 = {r.vec_id: r.bucket for r in S.hyperplane_buckets(df, spark).collect()}
    b2 = {r.vec_id: r.bucket for r in S.hyperplane_buckets(df, spark).collect()}
    assert b1 == b2                      # md5 planes → fully deterministic
    assert all(0 <= v < 256 for v in b1.values())
    # the planted near-copy of vec 0 must land in vec 0's bucket
    assert b1[40] == b1[0]
    pairs = S.lsh_neardup_pairs(df, spark, top=5).collect()
    assert (pairs[0].vec_a, pairs[0].vec_b) == (0, 40)
    assert pairs[0].cos_sim > 0.999
