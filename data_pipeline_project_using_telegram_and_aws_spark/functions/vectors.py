"""Vector math over ``array<float>`` columns — all JVM-side expressions,
no UDFs.

Two formulations:

- ``dim=None``: ``zip_with``/``aggregate`` fold — works for any length,
  but Catalyst evaluates higher-order-function lambdas *interpreted*
  (never whole-stage-codegen'd), ~100× the per-element cost.
- ``dim=K`` (the hot path): the fold is unrolled at plan-build time into
  a chain of ``element_at``/multiply/add projections — ordinary
  expressions inside whole-stage codegen, in the same left-to-right
  accumulation order as the fold so results are bit-identical.

Floats are widened to double *before* multiplication so Spark's
accumulation matches an oracle that computes on ``DOUBLE[]`` — keeps
cosine values bit-comparable after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    if dim is None:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + F.element_at(a, i).cast("double") * F.element_at(b, i).cast(
            "double"
        )
    return acc


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def cosine_with_norms(a: Column, b: Column, norm_a: Column, norm_b: Column,
                      dim: int | None = None) -> Column:
    """Cosine with precomputed norms — avoids recomputing ``norm`` per pair
    inside a pairwise join (the norms are computed once per vector and
    carried through the join)."""
    return dot(a, b, dim) / (norm_a * norm_b)
