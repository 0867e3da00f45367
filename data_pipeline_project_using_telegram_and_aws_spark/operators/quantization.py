"""Embedding quantization: per-vector int8 scalar quantization — the
4× storage/bandwidth cut that makes 100 TB-scale ANN shuffles and
broadcast payloads tractable (float32[64] → int8[64] + two float
constants per vector).

Per-vector (not per-corpus) min/max quantization keeps the operator a
pure projection — no statistics pass, no shuffle, embarrassingly
parallel — at a small precision cost vs learned codebooks (product
quantization needs k-means training; use the IVF machinery in
``operators/similarity`` if that trade is ever worth it).

These expressions use Catalyst higher-order functions (``transform``),
which evaluate interpreted (see ``operators/dedup`` module notes): fine
here because the element count is rows × dims (same as any vector op in
this engine, e.g. ``functions/vectors.cosine``), NOT a corpus-scaling
explosion like shingles × salts. Quantize once at ingest, store the
int8 array, and the hot ANN path reads 4× less.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_LEVELS = 255  # int8 code points used: -128..127


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, qvec: array<tinyint>, q_min, q_scale) — per-vector int8
    codes. Dequantization: ``value ≈ (code + 128) * q_scale + q_min``.
    Constant vectors (max == min) get scale 0 and all codes -128, which
    round-trips exactly."""
    v = F.col(vec_col)
    vmin = F.array_min(v)
    vmax = F.array_max(v)
    scale = (vmax - vmin) / F.lit(float(_LEVELS))
    code = F.transform(
        v,
        lambda x: (
            F.when(scale == 0.0, F.lit(0)).otherwise(
                F.round((x - vmin) / scale)
            ).cast("int")
            - 128
        ).cast("tinyint"),
    )
    return df.select(
        F.col(id_col),
        code.alias("qvec"),
        vmin.cast("double").alias("q_min"),
        scale.cast("double").alias("q_scale"),
    )


def dequantize(
    qvec: Column | str, q_min: Column | str, q_scale: Column | str
) -> Column:
    """array<double> reconstruction of a quantized vector."""
    q = F.col(qvec) if isinstance(qvec, str) else qvec
    mn = F.col(q_min) if isinstance(q_min, str) else q_min
    sc = F.col(q_scale) if isinstance(q_scale, str) else q_scale
    return F.transform(q, lambda c: (c.cast("double") + 128.0) * sc + mn)


def quantization_error_stats(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """One-row audit of the quantize→dequantize round trip: worst and
    mean absolute element error plus the worst cosine rotation between
    original and reconstructed vectors — the number that says whether
    int8 is safe for the ANN recall target."""
    from ..functions.vectors import cosine

    q = quantize_embeddings(df, vec_col, id_col)
    joined = df.select(F.col(id_col), F.col(vec_col)).join(q, id_col)
    recon = dequantize("qvec", "q_min", "q_scale")
    abs_err = F.zip_with(
        F.col(vec_col), recon, lambda a, b: F.abs(a - b)
    )
    return joined.select(
        F.array_max(abs_err).alias("__row_max"),
        F.aggregate(
            abs_err, F.lit(0.0), lambda acc, x: acc + x
        ).alias("__row_sum"),
        F.size(F.col(vec_col)).alias("__dims"),
        cosine(F.col(vec_col), recon).alias("__cos"),
    ).agg(
        F.round(F.max("__row_max"), 6).alias("max_abs_err"),
        F.round(
            F.sum("__row_sum") / F.sum(F.col("__dims").cast("double")), 6
        ).alias("mean_abs_err"),
        F.round(F.min("__cos"), 6).alias("worst_cosine"),
    )
