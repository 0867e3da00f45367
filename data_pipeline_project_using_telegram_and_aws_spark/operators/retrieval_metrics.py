"""Retrieval evaluation — recall@k, precision@k, MRR@k, nDCG@k, hit@k
over a ranked-results table and a relevance-judgments (qrels) table:
the missing evaluator for the retrieval family (`retrieval.py` BM25,
`similarity.py` ANN, `hybrid.py` fusion/MMR all emit the (query_id,
doc_id, rank) shape this consumes). The LLM-pipeline uses are recall
floors for ANN index tuning (`lsh_tuning.py` reasons about them; this
measures them), fusion A/B reads (did RRF beat either list?), and
retrieval-based decontamination audits (is the scrubbed corpus still
findable?).

Definitions (trec_eval conventions, stated so the oracle is unambiguous):
- a judged-relevant doc is a qrels row with ``rel > 0``; graded ``rel``
  feeds nDCG, binary everything else;
- recall@k = |relevant ∩ top-k| / |relevant|; precision@k = |relevant ∩
  top-k| / k (k the DIAL, not the retrieved count — short result lists
  are penalized, as trec_eval does);
- MRR@k = 1/rank of the first relevant result at rank ≤ k, else 0;
- DCG@k = Σ_{rank ≤ k} (2^rel − 1)/log2(rank+1) over judged docs in the
  results; IDCG@k = the same sum over the query's top-min(k, |judged|)
  grades sorted descending; nDCG = DCG/IDCG;
- queries with NO relevant docs are excluded from per-query rows and
  the macro average (their metrics are 0/0 — trec_eval drops them too);
  queries with relevant docs but no results score 0 across the board.

Scale shape: qrels are human/synthetic judgments — orders of magnitude
smaller than any corpus, broadcast everywhere; the results side makes
ONE query-keyed aggregation pass. Per-query output is |queries| rows;
the summary is one row. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_METRICS = ["recall", "precision", "mrr", "ndcg", "hit"]


def _query_ideals(qrels: DataFrame, k: int, query_id_col: str, rel_col: str):
    """(query, n_relevant, idcg) for queries with ≥1 relevant doc —
    qrels-sized work throughout."""
    judged = qrels.filter(F.col(rel_col) > 0)
    w = Window.partitionBy(query_id_col).orderBy(F.desc(rel_col))
    ideal = (
        judged.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .groupBy(query_id_col)
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col(rel_col)) - 1.0)
                / F.log2(F.col("__r") + 1.0)
            ).alias("__idcg")
        )
    )
    totals = judged.groupBy(query_id_col).agg(
        F.count(F.lit(1)).alias("__n_rel")
    )
    return totals.join(ideal, query_id_col)


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str | None = None,
) -> DataFrame:
    """(query_id, recall, precision, mrr, ndcg, hit, n_relevant,
    n_retrieved) — one row per query that has ≥1 relevant judgment
    (module docstring for the conventions). ``rel_col=None`` treats
    every qrels row as binary-relevant (rel=1). Metrics are rounded to
    6 dp so reports hash-compare across engines.

    Plan: top-k filter → broadcast join the qrels (judgment sets are
    small by construction) → one query-keyed aggregation; the ideal
    side is qrels-sized. A right join from the per-query aggregates
    onto the ideal table keeps zero-result queries (they score 0, not
    absent)."""
    if k <= 0:
        raise ValueError(f"retrieval_metrics: k={k} must be > 0")
    rc = "__rel"
    q = (
        qrels.select(
            query_id_col, id_col, F.col(rel_col).cast("double").alias(rc)
        )
        if rel_col is not None
        else qrels.select(query_id_col, id_col, F.lit(1.0).alias(rc))
    )
    # one judgment per (query, doc): conflicting grades keep the max —
    # duplicate qrels rows must not inflate hit counts or DCG
    q = q.groupBy(query_id_col, id_col).agg(F.max(rc).alias(rc))
    ideals = _query_ideals(q, k, query_id_col, rc)
    topk = results.filter(F.col(rank_col) <= k).select(
        query_id_col, id_col, F.col(rank_col).cast("double").alias("__rk")
    )
    joined = topk.join(
        F.broadcast(q.filter(F.col(rc) > 0)), [query_id_col, id_col], "left"
    )
    per_q = joined.groupBy(query_id_col).agg(
        F.count(F.lit(1)).alias("n_retrieved"),
        F.sum(
            F.when(F.col(rc).isNotNull(), 1).otherwise(0)
        ).alias("__hits"),
        F.min(
            F.when(F.col(rc).isNotNull(), F.col("__rk"))
        ).alias("__first"),
        F.sum(
            F.when(
                F.col(rc).isNotNull(),
                (F.pow(F.lit(2.0), F.col(rc)) - 1.0)
                / F.log2(F.col("__rk") + 1.0),
            ).otherwise(0.0)
        ).alias("__dcg"),
    )
    out = (
        per_q.join(F.broadcast(ideals), query_id_col, "right")
        .select(
            query_id_col,
            F.round(
                F.coalesce(F.col("__hits"), F.lit(0))
                / F.col("__n_rel"),
                6,
            ).alias("recall"),
            F.round(
                F.coalesce(F.col("__hits"), F.lit(0)) / F.lit(float(k)), 6
            ).alias("precision"),
            F.round(
                F.coalesce(1.0 / F.col("__first"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("__dcg"), F.lit(0.0)) / F.col("__idcg"), 6
            ).alias("ndcg"),
            F.when(
                F.coalesce(F.col("__hits"), F.lit(0)) > 0, 1.0
            ).otherwise(0.0).alias("hit"),
            F.col("__n_rel").alias("n_relevant"),
            F.coalesce(F.col("n_retrieved"), F.lit(0)).alias(
                "n_retrieved"
            ),
        )
    )
    return out


def retrieval_metrics_summary(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str | None = None,
) -> DataFrame:
    """One macro-averaged row: (n_queries, recall, precision, mrr,
    ndcg, hit) — the unweighted mean over :func:`retrieval_metrics`'s
    per-query rows (trec_eval's macro convention: every judged query
    counts once, however many judgments it has)."""
    per_q = retrieval_metrics(
        results, qrels, k, query_id_col, id_col, rank_col, rel_col
    )
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        *[F.round(F.avg(m), 6).alias(m) for m in _METRICS],
    )
