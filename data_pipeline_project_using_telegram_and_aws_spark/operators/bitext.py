"""Margin-based bitext mining — finding translation / paraphrase
pairs across two embedded corpora by the MARGIN between a pair's
cosine and each side's local neighborhood density (Artetxe & Schwenk,
"Margin-based Parallel Corpus Mining with Multilingual Sentence
Embeddings", arXiv:1811.01136 — the method behind the public CCMatrix
/ WikiMatrix corpora). The reference pipeline has no cross-corpus
surface at all (it is a single-stream webhook ETL); this is
north-star training-data work: mined pairs are how public translation
and sentence-pair datasets are actually built at crawl scale.

Why margin instead of raw cosine: embedding spaces have hubs — rows
whose cosine is high against EVERYTHING. A raw threshold either
admits hub garbage or rejects legitimate pairs in dense regions. The
margin normalizes each pair's cosine by the mean cosine of both
endpoints' k-nearest neighborhoods, so "close for x AND close for y,
relative to what close means locally" is the criterion:

    ratio:    cos(x,y) / ((avg_fwd(x) + avg_bwd(y)) / 2)
    distance: cos(x,y) -  (avg_fwd(x) + avg_bwd(y)) / 2
    absolute: cos(x,y)                       (the degenerate baseline)

Spark shape — one scored-pair set, both directions derived from it:
the naive formulation runs a kNN src→tgt and another tgt→src; both
directions' neighborhoods are the SAME pair set read through two
windows, so this module scores pairs ONCE and takes per-src and
per-tgt rank/average over the single result — half the pair work,
and immune to the id-collision subtlety a two-kNN composition has
when the corpora share id values.

Scale: the default candidate generator is the exact tier (cross join
with the smaller side broadcast, norms precomputed once per row —
right whenever one side fits a broadcast, e.g. mining against a
curated seed corpus). For two large sides, pass ``pairs=`` from the
ANN stack (`similarity.lsh_banded_neardup_pairs` across the union, or
an IVF bucket join) — the margin math downstream is identical: one
window per direction on the candidate set, partitioned by the
respective id (two shuffles of the candidate set, nothing bigger).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_with_norms, norm

MARGIN_METHODS = ("ratio", "distance", "absolute")


def score_pairs(
    src: DataFrame,
    tgt: DataFrame,
    src_id: str = "src_id",
    tgt_id: str = "tgt_id",
    vec_col: str = "embedding",
    broadcast: str = "tgt",
) -> DataFrame:
    """Exact-tier candidate scoring: every (src, tgt) pair with its
    4-dp-rounded cosine (the rounding convention every similarity
    operator here uses, so ranks reproduce across engines). Norms are
    computed once per row and carried through the join. ``broadcast``
    names the smaller side ('tgt' | 'src' | None for a plain shuffled
    cross join)."""
    s = src.select(
        F.col(src_id), F.col(vec_col).alias("__sv"),
        norm(F.col(vec_col)).alias("__sn"),
    )
    t = tgt.select(
        F.col(tgt_id), F.col(vec_col).alias("__tv"),
        norm(F.col(vec_col)).alias("__tn"),
    )
    if broadcast == "tgt":
        t = F.broadcast(t)
    elif broadcast == "src":
        s = F.broadcast(s)
    return s.crossJoin(t).select(
        src_id,
        tgt_id,
        F.round(
            cosine_with_norms(
                F.col("__sv"), F.col("__tv"),
                F.col("__sn"), F.col("__tn"),
            ),
            4,
        ).alias("cos_sim"),
    )


def _margin(method: str, cos: Column, avg: Column) -> Column:
    if method == "ratio":
        return cos / avg
    if method == "distance":
        return cos - avg
    return cos  # absolute


def mine_bitext(
    src: DataFrame | None = None,
    tgt: DataFrame | None = None,
    k: int = 4,
    method: str = "ratio",
    threshold: float | None = None,
    mutual: bool = True,
    src_id: str = "src_id",
    tgt_id: str = "tgt_id",
    vec_col: str = "embedding",
    pairs: DataFrame | None = None,
    broadcast: str = "tgt",
) -> DataFrame:
    """Mined (src_id, tgt_id, cos_sim, margin) pairs, best-per-src by
    margin (the paper's "max" retrieval strategy), optionally
    intersected with best-per-tgt (``mutual`` — the forward/backward
    agreement filter), optionally floored at ``threshold``.

    Neighborhood averages use each endpoint's top-``k`` cosines BY
    RANK within the candidate set; a row with fewer than k candidates
    (possible under a blocked ``pairs=`` generator) averages what it
    has — stated contract, matching how blocked ANN mining actually
    behaves. Ties rank by the neighbor id ascending (reproducible
    across engines). ``threshold`` is method-relative: ratio margins
    sit around 1.0, distance margins around 0.0, absolute IS the
    cosine.

    Pass either (src, tgt) for exact-tier scoring via
    :func:`score_pairs`, or a precomputed ``pairs`` DataFrame
    ((src_id, tgt_id, cos_sim) — e.g. ANN-blocked candidates) for the
    scale path."""
    if method not in MARGIN_METHODS:
        raise ValueError(
            f"mine_bitext: method {method!r} not in {MARGIN_METHODS}"
        )
    if k < 1:
        raise ValueError(f"mine_bitext: k={k} must be >= 1")
    if pairs is None:
        if src is None or tgt is None:
            raise ValueError(
                "mine_bitext: pass (src, tgt) DataFrames or pairs="
            )
        pairs = score_pairs(
            src, tgt, src_id, tgt_id, vec_col, broadcast
        )

    w_fwd = Window.partitionBy(src_id).orderBy(
        F.desc("cos_sim"), F.asc(tgt_id)
    )
    w_bwd = Window.partitionBy(tgt_id).orderBy(
        F.desc("cos_sim"), F.asc(src_id)
    )
    ranked = pairs.select(
        src_id, tgt_id, "cos_sim",
        F.row_number().over(w_fwd).alias("__rf"),
        F.row_number().over(w_bwd).alias("__rb"),
    )
    # per-endpoint neighborhood means over the SAME ranked pair set
    fwd_avg = (
        ranked.filter(F.col("__rf") <= k)
        .groupBy(src_id)
        .agg(F.avg("cos_sim").alias("__fa"))
    )
    bwd_avg = (
        ranked.filter(F.col("__rb") <= k)
        .groupBy(tgt_id)
        .agg(F.avg("cos_sim").alias("__ba"))
    )
    # candidates worth scoring: inside either direction's top-k
    cand = (
        ranked.filter((F.col("__rf") <= k) | (F.col("__rb") <= k))
        .join(fwd_avg, src_id)
        .join(bwd_avg, tgt_id)
        .withColumn(
            "margin",
            F.round(
                _margin(
                    method,
                    F.col("cos_sim"),
                    (F.col("__fa") + F.col("__ba")) / 2.0,
                ),
                4,
            ),
        )
    )
    w_best_f = Window.partitionBy(src_id).orderBy(
        F.desc("margin"), F.asc(tgt_id)
    )
    best = cand.withColumn(
        "__bf", F.row_number().over(w_best_f)
    ).filter(F.col("__bf") == 1)
    if mutual:
        w_best_b = Window.partitionBy(tgt_id).orderBy(
            F.desc("margin"), F.asc(src_id)
        )
        best_b = (
            cand.withColumn("__bb", F.row_number().over(w_best_b))
            .filter(F.col("__bb") == 1)
            .select(src_id, tgt_id)
        )
        best = best.join(best_b, [src_id, tgt_id])
    if threshold is not None:
        best = best.filter(F.col("margin") >= threshold)
    return best.select(src_id, tgt_id, "cos_sim", "margin")


def decontaminate_semantic(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "doc_id",
    eval_id_col: str = "eval_id",
    vec_col: str = "embedding",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Embedding-level decontamination: drop corpus rows whose cosine
    against ANY eval-set row reaches ``threshold`` — the semantic
    complement to `decontamination.py`'s n-gram overlap (paraphrased
    or reformatted benchmark leakage has no n-gram signature but
    lands at high embedding cosine; public corpus builds run both
    gates). Returns the SURVIVING corpus rows, all columns intact.

    Eval sets are small by nature, so the exact tier broadcasts the
    eval side (one pass over the corpus, no shuffle of corpus rows).
    For an unusually large eval union, pass ANN-blocked ``pairs=``
    ((doc_id, eval_id, cos_sim)) and only the anti-join runs here."""
    if pairs is None:
        pairs = score_pairs(
            corpus, eval_df,
            src_id=id_col, tgt_id=eval_id_col,
            vec_col=vec_col, broadcast="tgt",
        )
    hits = (
        pairs.filter(F.col("cos_sim") >= threshold)
        .select(id_col)
        .distinct()
    )
    return corpus.join(hits, id_col, "left_anti")
