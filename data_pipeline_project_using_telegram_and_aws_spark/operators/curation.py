"""Corpus curation: the end-to-end cleaning pipeline a training-data user
runs over a raw document corpus, composed from this engine's operators —

    exact dedup  →  MinHash-LSH near-dup dedup  →  quality gate  →
    (optional) language filter

Each stage both filters the surviving set and appends to a *drop ledger*
(doc_id, stage, reason[, evidence]) so every removal is auditable — at
100 TB the ledger is what lets you answer "why is this document gone" a
month later without re-running anything.

Scale shape: every stage is a pure DataFrame composition over the ops in
:mod:`dedup` (hash group-by, banded LSH — both sub-quadratic) plus
row-local quality expressions; the only joins against the corpus are
broadcast- or key-equi-joins on doc ids. Near-dup grouping keeps the
LOWEST id of each candidate pair (greedy per-pair, not connected
components: A~B and B~C can keep A and C even if A~C was never a
candidate — the standard large-scale compromise; exact transitive
closure would need an iterative union-find pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from . import dedup as D

LEDGER_COLS = ["doc_id", "stage", "reason"]


def _tokens(col):
    return F.filter(F.split(col, " "), lambda t: t != "")


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    jaccard_threshold: float = 0.8,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_punct_ratio: float = 0.3,
    keep_langs: list[str] | None = None,
    lang_col: str = "lang",
) -> tuple[DataFrame, DataFrame]:
    """Run the full curation pipeline; returns ``(kept, ledger)``.

    ``kept`` preserves the input schema; ``ledger`` has one row per
    dropped document: (doc_id, stage, reason). Stages run in fixed order
    and each operates on the previous stage's survivors, so a document is
    dropped exactly once, by the first stage that rejects it.
    """
    ledgers: list[DataFrame] = []

    # ---- stage 1: exact dedup (keep lowest id per identical text) -------
    hashed = D.with_text_hash(docs, text_col)
    w = Window.partitionBy("text_hash").orderBy(id_col)
    ranked = hashed.withColumn("__rn", F.row_number().over(w))
    ledgers.append(
        ranked.filter(F.col("__rn") > 1).select(
            F.col(id_col).alias("doc_id"),
            F.lit("exact_dedup").alias("stage"),
            F.concat(F.lit("duplicate text_hash="), F.col("text_hash")).alias(
                "reason"
            ),
        )
    )
    survivors = ranked.filter(F.col("__rn") == 1).drop("__rn", "text_hash")

    # ---- stage 2: near-dup dedup (MinHash-LSH, drop higher id) ----------
    cand = D.minhash_lsh_candidates(
        survivors, n=ngram, id_col=id_col, text_col=text_col
    ).filter(F.col("est_jaccard") >= jaccard_threshold)
    near_drops = (
        cand.groupBy(F.col("doc_b").alias("doc_id"))
        .agg(F.min("doc_a").alias("__kept"), F.max("est_jaccard").alias("__j"))
        .select(
            "doc_id",
            F.lit("near_dedup").alias("stage"),
            F.concat(
                F.lit("minhash est_jaccard="),
                # fixed 4-dp decimal rendering — double→string formatting
                # differs across engines, DECIMAL(6,4) strings don't
                F.col("__j").cast("decimal(6,4)").cast("string"),
                F.lit(" vs doc "),
                F.col("__kept").cast("string"),
            ).alias("reason"),
        )
    )
    ledgers.append(near_drops)
    survivors = survivors.join(
        near_drops.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )

    # ---- stage 3: quality gate (row-local, whole-stage codegen) ---------
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_punct = F.length(F.regexp_replace(F.col(text_col), "[^!?.,;:]", ""))
    punct_ratio = n_punct / F.greatest(F.length(text_col), F.lit(1))
    reason = (
        F.when(n_tok < min_tokens, F.lit("too_short"))
        .when(n_tok > max_tokens, F.lit("too_long"))
        .when(punct_ratio > max_punct_ratio, F.lit("punct_ratio"))
    )
    flagged = survivors.withColumn("__reason", reason)
    ledgers.append(
        flagged.filter(F.col("__reason").isNotNull()).select(
            F.col(id_col).alias("doc_id"),
            F.lit("quality").alias("stage"),
            F.col("__reason").alias("reason"),
        )
    )
    survivors = flagged.filter(F.col("__reason").isNull()).drop("__reason")

    # ---- stage 4: optional language allow-list --------------------------
    if keep_langs is not None:
        bad = ~F.col(lang_col).isin(*keep_langs)
        ledgers.append(
            survivors.filter(bad).select(
                F.col(id_col).alias("doc_id"),
                F.lit("language").alias("stage"),
                F.concat(F.lit("lang="), F.col(lang_col)).alias("reason"),
            )
        )
        survivors = survivors.filter(~bad)

    ledger = ledgers[0]
    for extra in ledgers[1:]:
        ledger = ledger.unionByName(extra)
    return survivors, ledger
