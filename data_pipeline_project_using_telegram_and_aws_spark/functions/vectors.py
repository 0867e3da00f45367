"""Vector math over ``array<float>`` columns — all JVM-side expressions,
no UDFs.

Formulation note (measured, sf0.1, 64-dim embeddings): the
``zip_with``/``aggregate`` fold runs through Catalyst's interpreted
higher-order-function path, but an unrolled ``element_at`` chain was
tried as a "codegen hot path" and measured *slower* — at 64 dims the
n-term arithmetic chain exceeds whole-stage-codegen's expression
splitting thresholds inside joins/aggregates, falls back to interpreted
per-node evaluation, and ran 3-6× slower than the fold on the banded
near-dup rerank. The fold is the hot path; the unrolled variant was
removed.

Floats are widened to double *before* multiplication so Spark's
accumulation matches an oracle that computes on ``DOUBLE[]`` — keeps
cosine values bit-comparable after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_with_norms(
    a: Column, b: Column, norm_a: Column, norm_b: Column
) -> Column:
    """Cosine with precomputed norms — avoids recomputing ``norm`` per pair
    inside a pairwise join (the norms are computed once per vector and
    carried through the join)."""
    return dot(a, b) / (norm_a * norm_b)
