"""Sliced model evaluation: exact AUC per group in one pass — the
"is the quality classifier fair across languages/sources" check that a
single corpus-level number hides (a 0.95 global AUC can hide a 0.6 on
the smallest language; sliced AUC is how that surfaces before the
filter silently skews the corpus mixture).

Exact, not sampled: AUC via the Mann-Whitney U statistic,
``(Σ avg-ranks of positives − n₊(n₊+1)/2) / (n₊ · n₋)``, with proper
tie handling (average ranks). Plan: one keyed shuffle on the group,
two windows riding the same sort (rank within group, tie counts within
(group, score)), one aggregation — no pairwise expansion (the naive
AUC-as-pair-count is O(n²) per group; ranks make it O(n log n) in the
sort). Degenerate groups (one class only) report NULL AUC instead of a
misleading number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def auc_by_group(
    scored: DataFrame,
    label_col: str,
    score_col: str,
    by: str,
) -> DataFrame:
    """(group, n_pos, n_neg, auc): exact ROC-AUC of ``score_col``
    against binary ``label_col`` (0/1 or boolean) per group; NULL auc
    where a group has a single class. Rows with NULL label or score
    are excluded."""
    d = scored.filter(
        F.col(label_col).isNotNull() & F.col(score_col).isNotNull()
    ).select(
        F.col(by),
        F.col(label_col).cast("double").alias("__y"),
        F.col(score_col).cast("double").alias("__s"),
    )
    w_ord = Window.partitionBy(by).orderBy("__s")
    w_tie = Window.partitionBy(by, "__s")
    ranked = d.withColumn(
        "__avg_rank",
        # rank() is the min rank of a tie run; the average rank of the
        # run is min + (ties - 1) / 2
        F.rank().over(w_ord)
        + (F.count(F.lit(1)).over(w_tie) - 1) / 2.0,
    )
    agg = ranked.groupBy(by).agg(
        F.sum(F.when(F.col("__y") == 1.0, F.col("__avg_rank"))).alias(
            "__rank_sum"
        ),
        F.sum(F.when(F.col("__y") == 1.0, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("__y") == 0.0, 1).otherwise(0)).alias("n_neg"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            (
                F.col("__rank_sum")
                - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
            )
            / (F.col("n_pos") * F.col("n_neg")),
            6,
        ),
    )
    return agg.select(by, "n_pos", "n_neg", auc.alias("auc"))
