"""Hashed TF-IDF document vectors: text → dense ``array<float>`` with
no external model — the in-engine bridge from the text operators to the
similarity stack (`knn_join`, IVF ANN, SemDeDup, quantization all take
an embedding column; this makes one from the corpus itself).

Design, all JVM-side:

- **hashing trick** (same stance as the quality classifier): terms map
  to ``pmod(xxhash64(term), dim)`` — no vocabulary pass, no fit/predict
  asymmetry, new terms at serving time land in a bucket instead of OOV;
- **tf-idf weight** per (doc, bucket): ``tf · ln((N+1)/(df+1)) + 1``
  smoothed idf, df computed per BUCKET (post-hash), so the statistics
  pass is bounded by ``dim``, not vocabulary size;
- **densify** via ``map_from_entries`` + a ``transform(sequence(...))``
  fill — one groupBy per doc carrying ≤ dim entries, no pivot, no UDF;
- optional L2 normalization so downstream cosine reduces to a dot.

Scale: one exploded aggregation (doc × distinct-bucket — capped at
``dim`` per doc), one bucket-df aggregation over ``dim`` rows, one
per-doc groupBy. The corpus shuffles twice (term rows, then doc rows),
both with map-side partial aggregation. Collisions are the accepted
hashing-trick trade: they add noise, not bias, and ``dim`` is the dial
(the classifier's docstring carries the same argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hashed_tfidf_vectors(
    docs: DataFrame,
    dim: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """(id, embedding: array<float>) — deterministic, model-free
    document vectors. Zero-token documents get the zero vector (kept:
    absence of text is representable, and downstream cosine guards
    against zero norms)."""
    if dim < 2:
        raise ValueError("hashed_tfidf_vectors: dim must be >= 2")
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("term"),
    ).withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(dim)))
    tf = toks.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    df_per_bucket = tf.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("df")
    )
    weighted = (
        tf.join(F.broadcast(df_per_bucket), "bucket")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "bucket",
            (
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + 1.0) / (F.col("df") + 1.0)
                    )
                    + 1.0
                )
            ).alias("w"),
        )
    )
    entries = weighted.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "w"))
        ).alias("__m")
    )
    # element_at on a MAP is a KEY lookup (bucket id), not positional
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("bigint")), F.lit(0.0)
        ),
    )
    vec = entries.select(F.col(id_col), dense.alias("__v"))
    if normalize:
        nrm = F.sqrt(
            F.aggregate(
                "__v", F.lit(0.0), lambda acc, x: acc + x * x
            )
        )
        vec = vec.select(
            F.col(id_col),
            F.when(
                nrm > 0, F.transform("__v", lambda x: x / nrm)
            ).otherwise(F.col("__v")).alias("__v"),
        )
    out = vec.select(
        F.col(id_col), F.col("__v").cast("array<float>").alias("embedding")
    )
    # zero-token docs have no term rows: re-attach with the zero vector
    zeros = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)), lambda i: F.lit(0.0)
    ).cast("array<float>")
    return (
        docs.select(id_col)
        .join(out, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("embedding", zeros).alias("embedding"),
        )
    )


def pool_vectors(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Mean-pool vectors per group — chunk embeddings → document
    embedding (the composition partner of `operators/chunking.py`:
    embed chunks, pool back to the document). One partial-agg'd
    aggregation: ``zip_with`` element sums + a count, divided and
    optionally re-normalized JVM-side. The collected list is
    group-sized (chunks per document — tens, by chunking's overlap
    math), never corpus-sized. Assumes equal dimensions (the
    producer's contract); empty groups can't occur (no rows, no
    group)."""
    summed = df.groupBy(group_col).agg(
        F.aggregate(
            F.collect_list(vec_col),
            F.expr("cast(array() as array<double>)"),
            lambda acc, v: F.when(
                F.size(acc) == 0, v.cast("array<double>")
            ).otherwise(
                F.zip_with(acc, v, lambda a, b: a + b)
            ),
        ).alias("__sum"),
        F.count(F.lit(1)).alias("__n"),
    )
    mean = F.transform("__sum", lambda x: x / F.col("__n"))
    out = summed.select(F.col(group_col), mean.alias("__v"))
    if normalize:
        nrm = F.sqrt(
            F.aggregate("__v", F.lit(0.0), lambda a, x: a + x * x)
        )
        out = out.select(
            F.col(group_col),
            F.when(nrm > 0, F.transform("__v", lambda x: x / nrm))
            .otherwise(F.col("__v"))
            .alias("__v"),
        )
    return out.select(
        F.col(group_col),
        F.col("__v").cast("array<float>").alias(vec_col),
    )
