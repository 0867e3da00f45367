from __future__ import annotations

import random

from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.quantization import (
    dequantize,
    quantization_error_stats,
    quantize_embeddings,
)


def _vectors(spark, n=50, dims=32, seed=11):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dims)]) for i in range(n)
    ]
    rows.append((n, [0.25] * dims))  # constant vector edge case
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_roundtrip_error_bounded_by_half_step(spark):
    df = _vectors(spark)
    out = df.join(quantize_embeddings(df), "vec_id").select(
        "vec_id",
        "embedding",
        "q_scale",
        dequantize("qvec", "q_min", "q_scale").alias("recon"),
    )
    rows = out.collect()
    for r in rows:
        for a, b in zip(r.embedding, r.recon):
            # scalar quantization error is at most half a code step
            assert abs(a - b) <= r.q_scale / 2 + 1e-9


def test_constant_vector_roundtrips_exactly(spark):
    df = _vectors(spark)
    r = (
        df.filter(F.col("vec_id") == 50)
        .join(quantize_embeddings(df), "vec_id")
        .select(dequantize("qvec", "q_min", "q_scale").alias("recon"))
        .collect()[0]
    )
    assert all(abs(x - 0.25) < 1e-12 for x in r.recon)


def test_codes_are_tinyint_range(spark):
    q = quantize_embeddings(_vectors(spark))
    assert dict(q.dtypes)["qvec"] == "array<tinyint>"
    bad = q.select(
        F.explode("qvec").alias("c")
    ).filter((F.col("c") < -128) | (F.col("c") > 127)).count()
    assert bad == 0


def test_error_stats_show_cosine_preserved(spark):
    stats = quantization_error_stats(_vectors(spark)).collect()[0]
    # int8 over unit-range vectors: tiny element error, cosine ~1
    assert stats.max_abs_err < 0.01
    assert stats.worst_cosine > 0.999


def test_quantized_ann_recall_against_exact(spark, sf_dir):
    """The 4x payload cut must not cost search quality: brute-force
    top-5 over int8-reconstructed embeddings recovers >= 90% of the
    exact float top-5 on the testdata corpus (random vectors are the
    hard case for recall — real clustered embeddings separate further).
    Composes quantize_embeddings -> dequantize -> brute_force_topk."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.quantization import (
        dequantize,
        quantize_embeddings,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.similarity import (
        brute_force_topk,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    recon = quantize_embeddings(emb).select(
        "vec_id", dequantize("qvec", "q_min", "q_scale").alias("embedding")
    )
    rq = recon.filter(F.col("vec_id") < 8)

    def topk(corpus, qs):
        rows = brute_force_topk(corpus, qs, k=5).collect()
        out = {}
        for r in rows:
            out.setdefault(r.query_id, set()).add(r.vec_id)
        return out

    exact = topk(emb, queries)
    quant = topk(recon, rq)
    hits = sum(len(exact[q] & quant[q]) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.9, (hits, total)
