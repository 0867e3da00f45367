"""Preference-training records: scored responses per prompt →
(chosen, rejected) pairs for DPO/RLHF-style training, and best-of-n
selection for rejection sampling — the record shapes that sit between
a reward model's scores and the trainer, downstream of the same
dialog/quality machinery the SFT records use.

Semantics, stated precisely (where silent variants bite):

- **Ties are deterministic**: winner/loser order on (score, id), so
  two responses with equal score always resolve the same way across
  runs and partition layouts — a nondeterministic pair set makes
  training runs unreproducible in a way nobody traces back to the
  data job.
- **A pair needs a margin**: chosen == rejected score carries no
  preference signal; ``min_margin`` (default 0 = any strict
  difference) drops prompts whose best and worst tie, and the margin
  rides the record for loss weighting / curriculum use downstream.
- **NULL scores are not preferences**: unscored responses are
  excluded before selection (an unscored response is an abstention,
  not a low score).

Plan shapes: one partial-agg'd groupBy per operator —
``max_by``/``min_by`` over (score, id) structs for the pair builder
(group-sized output, no window, no join-back), a rank window for
best-of-n (the same keyed shuffle a groupBy would pay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def build_preference_pairs(
    responses: DataFrame,
    prompt_col: str = "prompt_id",
    response_col: str = "response",
    score_col: str = "score",
    id_col: str = "response_id",
    min_margin: float = 0.0,
) -> DataFrame:
    """One row per prompt with ≥2 scored responses and a margin above
    ``min_margin``: (prompt, chosen, rejected, chosen_score,
    rejected_score, margin, n_responses). Chosen = highest (score,
    id); rejected = lowest (score, id) — deterministic under ties,
    and the margin filter drops no-signal prompts."""
    scored = responses.filter(F.col(score_col).isNotNull())
    key = lambda: F.struct(
        F.col(score_col).cast("double").alias("s"),
        F.col(id_col).alias("i"),
        F.col(response_col).alias("r"),
    )
    grouped = scored.groupBy(prompt_col).agg(
        F.max(key()).alias("__best"),
        F.min(key()).alias("__worst"),
        F.count(F.lit(1)).alias("n_responses"),
    )
    margin = F.col("__best.s") - F.col("__worst.s")
    return (
        grouped.filter(
            (F.col("n_responses") >= 2) & (margin > F.lit(min_margin))
        )
        .select(
            prompt_col,
            F.col("__best.r").alias("chosen"),
            F.col("__worst.r").alias("rejected"),
            F.col("__best.i").alias("chosen_id"),
            F.col("__worst.i").alias("rejected_id"),
            F.round(F.col("__best.s"), 6).alias("chosen_score"),
            F.round(F.col("__worst.s"), 6).alias("rejected_score"),
            F.round(margin, 6).alias("margin"),
            "n_responses",
        )
    )


def best_of_n(
    responses: DataFrame,
    prompt_col: str = "prompt_id",
    score_col: str = "score",
    id_col: str = "response_id",
    k: int = 1,
) -> DataFrame:
    """Rejection sampling: the top ``k`` scored responses per prompt
    (all columns kept, plus ``response_rank`` starting at 1), ties
    resolved deterministically on (score desc, id asc). Unscored
    responses never win. One rank window on the prompt key."""
    if k < 1:
        raise ValueError("best_of_n: k must be >= 1")
    w = Window.partitionBy(prompt_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        responses.filter(F.col(score_col).isNotNull())
        .withColumn("response_rank", F.row_number().over(w))
        .filter(F.col("response_rank") <= k)
    )
