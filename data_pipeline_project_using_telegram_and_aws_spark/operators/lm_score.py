"""Unigram language-model quality scoring: per-document cross-entropy
(bits per token) under a reference corpus's unigram distribution — the
corpus-statistics stand-in for the CCNet/KenLM n-gram perplexity filter
(low bits/token ≈ ordinary prose for the reference domain, high ≈
off-domain, garbled, or keyword-stuffed text). A learned KenLM would
slot in as a Pandas-UDF scorer; this operator is the honest version
derivable from the corpus alone, like ``vocabulary.py``'s word-level
codec vs a trained BPE.

Model: add-``alpha`` smoothed unigram probabilities over the reference
corpus, with a single OOV bucket —

    p(t) = (count(t) + alpha) / (total + alpha·(V + 1))

where V is the reference vocabulary size and the "+1" is the OOV
bucket's share; an unseen token scores p(OOV) = alpha / denominator.

Scale shape (all JVM-side, no Python):
- model: one exploded aggregation over the reference corpus (map-side
  partial agg), then total/V attached via a vocab-sized window — the
  model never leaves the plan and broadcasts to the scoring join
  (unigram vocabularies are ~10⁵-10⁶ rows);
- scoring: explode scored docs' tokens, broadcast-join the model,
  per-doc mean of -log2 p — one shuffle keyed by doc id, carrying one
  double per token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _tokens(text_col: str):
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != "")


def unigram_model(
    ref_docs: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """(token, logp, oov_logp): smoothed log2 probability per reference
    token; ``oov_logp`` (identical on every row) is the score an unseen
    token receives — carried as a column so a scorer can recover it from
    any one row without a second aggregation over the reference."""
    counts = (
        ref_docs.select(F.explode(_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.partitionBy()
    denom = (
        F.sum("__n").over(w).cast("double")
        + F.lit(alpha) * (F.count(F.lit(1)).over(w) + F.lit(1.0))
    )
    return counts.select(
        "token",
        F.log2((F.col("__n") + F.lit(alpha)) / denom).alias("logp"),
        F.log2(F.lit(alpha) / denom).alias("oov_logp"),
    )


def unigram_cross_entropy(
    docs: DataFrame,
    ref_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """(doc_id, n_tokens, bits_per_token) — mean -log2 p(token) per
    document under ``ref_docs``'s unigram model (default: score the
    corpus against itself, the self-perplexity quality signal).
    Zero-token documents keep their row with NULL ``bits_per_token``
    (the encode_documents row contract)."""
    model = unigram_model(ref_docs if ref_docs is not None else docs,
                          text_col, alpha)
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("token")
    )
    # oov_logp is constant across the model; min() is just a picker
    oov = model.agg(F.min("oov_logp").alias("__oov"))
    scored = (
        toks.join(F.broadcast(model.select("token", "logp")), "token", "left")
        .crossJoin(F.broadcast(oov))
        .select(
            id_col,
            F.coalesce("logp", F.col("__oov")).alias("__logp"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(-F.avg("__logp"), 4).alias("bits_per_token"),
        )
    )
    return docs.select(id_col).join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        F.col("bits_per_token"),
    )
