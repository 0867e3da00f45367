"""Signed random projection (Johnson–Lindenstrauss): embed
``array<float>`` vectors into a lower dimension with pairwise
geometry approximately preserved — the standard pre-step that makes
everything downstream (k-means, kNN, LSH banding, PQ codebooks)
cheaper by d/k with a quantified accuracy cost.

The projection is the Achlioptas ±1 scheme: out[j] = (1/√k) ·
Σ_i v[i] · s(i, j) with s(i, j) ∈ {+1, −1}. JL gives relative
squared-distance distortion ≤ ε with k = O(log n / ε²); the ±1 signs
are as good as Gaussians (Achlioptas 2001) and — the reason this
implementation exists — need NO stored matrix: s(i, j) derives from
``xxhash64(i, j, seed)`` inside the row expression, so the operator is
a PURE PROJECTION (zero shuffle, zero broadcast, no Python, nothing
to persist or version except the (k, seed) pair). Re-running with the
same seed on any partition layout reproduces bit-identical outputs;
a query vector projected later with the same (k, seed) lands in the
same space as the corpus — the property that makes projected ANN
indexes serviceable.

Cost, stated honestly: O(d · k) hash evaluations + multiply-adds per
row (nested higher-order functions, JVM-side). That is the price of
matrix-free determinism; at d=256, k=32 it is ~8k fused ops per row —
scan-dominated at any corpus size, and embarrassingly parallel.

What projection preserves, stated honestly: COARSE structure. Cluster
identity survives (pinned: projected top-k stays within the query's
true cluster on separated data), but fine within-cluster rankings
that ride on margins smaller than the ε-distortion legitimately
scramble — measured 0.16 exact-top-5 recall on isotropic random
vectors (where ALL margins are tiny, the JL worst case) and 0.53
within tight clusters. Use it for routing, clustering, LSH banding,
and candidate generation; rerank candidates in the full dimension
when exact neighbor order matters (the `pq.py` two-stage pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def random_projection(
    vectors: DataFrame,
    out_dim: int,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Project ``vec_col`` to ``out_dim`` components (replacing the
    column unless ``out_col`` names a new one). Deterministic in
    (data, out_dim, seed); layout-stable; all other columns pass
    through untouched."""
    if out_dim < 1:
        raise ValueError("random_projection: out_dim must be >= 1")
    scale = 1.0 / (out_dim ** 0.5)
    v = F.col(vec_col)
    idx = F.sequence(F.lit(0), F.size(v) - 1)

    def component(j):
        signed = F.zip_with(
            v,
            idx,
            lambda x, i: x
            * F.when(
                F.pmod(F.xxhash64(i, j, F.lit(seed)), F.lit(2)) == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        )
        return (
            F.aggregate(signed, F.lit(0.0), lambda a, x: a + x)
            * F.lit(scale)
        ).cast("float")

    projected = F.transform(
        F.sequence(F.lit(0), F.lit(out_dim - 1)), component
    )
    target = out_col or vec_col
    return vectors.withColumn(target, projected)
