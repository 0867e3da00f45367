"""Benchmark decontamination: find training documents that share word
n-grams with a held-out evaluation set (the train/test-overlap audit every
LLM data pipeline runs before training — contaminated training documents
inflate eval scores).

Semantics follow the standard n-gram collision report (GPT-3 appendix /
PaLM-style): a training doc is *contaminated* by an eval doc when the two
share at least one word n-gram (n≈8-13 for real corpora; callers pick n
to match their token distribution). The report carries the collision
count and the contaminated fraction of the eval doc's grams, so the
downstream policy (drop the training doc, or flag the eval doc) has the
evidence attached.

Scale design (100 TB train corpus × MB-scale benchmark suite):
- the train side is shingled once and joined by gram — an inverted-index
  equi-join, never a cross join (reuses :func:`dedup.shingle_rows`, the
  codegen'd position-explode shingler);
- the eval side is tiny by nature (benchmarks are curated sets), so its
  gram table is **broadcast**: the train corpus NEVER shuffles. Train
  grams are deliberately NOT pre-deduplicated (that dropDuplicates
  would shuffle every gram in the corpus); instead the per-occurrence
  gram rows hit the broadcast join first — whose selectivity is the
  contamination rate, near zero on a clean corpus — and only the
  surviving collision rows are deduplicated and aggregated. Distinct
  after the join equals distinct before it, at a shuffle bounded by
  collisions instead of corpus size;
- gram equality uses the raw gram string; at petabyte scale substitute
  ``md5(gram)`` on BOTH sides to shrink the broadcast (same join shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import shingle_rows


def contamination_report(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(train_doc_id, eval_doc_id, shared_ngrams, eval_ngrams,
    contamination) — one row per contaminated (train, eval) pair.

    ``contamination`` = shared / eval-doc distinct grams, rounded to 4 dp:
    1.0 means the eval doc appears verbatim (modulo gram coverage) in the
    training document.
    """
    tg = shingle_rows(train, n, id_col, text_col, distinct=False).select(
        F.col(id_col).alias("train_doc_id"), "shingle"
    )
    eg = _eval_grams(eval_docs, n, id_col, text_col)
    return _collide(tg, eg)


def _eval_grams(
    eval_docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(eval_doc_id, shingle, eval_ngrams): the held-out suite's distinct
    grams with per-doc totals attached — the broadcast side of every
    contamination join."""
    eg = shingle_rows(eval_docs, n, id_col, text_col, distinct=True).select(
        F.col(id_col).alias("eval_doc_id"), "shingle"
    )
    return eg.withColumn(
        "eval_ngrams",
        F.count(F.lit(1)).over(Window.partitionBy("eval_doc_id")),
    )


def _collide(tg: DataFrame, eg: DataFrame) -> DataFrame:
    return (
        tg.join(F.broadcast(eg), "shingle")
        # dedup AFTER the near-empty join, not before it (module note)
        .dropDuplicates(["train_doc_id", "eval_doc_id", "shingle"])
        .groupBy("train_doc_id", "eval_doc_id", "eval_ngrams")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .select(
            "train_doc_id",
            "eval_doc_id",
            "shared_ngrams",
            "eval_ngrams",
            F.round(
                F.col("shared_ngrams") / F.col("eval_ngrams"), 4
            ).alias("contamination"),
        )
    )


def build_eval_gram_table(
    eval_docs: DataFrame,
    table: str,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the held-out suite's gram table — the incremental
    decontamination layout, symmetric to ``dedup.build_minhash_index_table``
    but with the roles reversed: there the CORPUS is the persisted side
    (huge, bucketed, never moves) and the daily batch probes it; here the
    EVAL SUITE is the persisted side (curated, MB-scale, changes only on
    suite versioning) and every daily training batch probes it by
    broadcast. Grams are computed once per suite version instead of once
    per daily batch — and a plain unbucketed table is deliberate: the
    probe reads it whole into a broadcast, so co-location buys nothing."""
    _eval_grams(eval_docs, n, id_col, text_col).write.mode(
        "overwrite"
    ).format("parquet").saveAsTable(table)


def contamination_against_table(
    spark,
    train_batch: DataFrame,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Daily-batch contamination report against a persisted eval gram
    table (``build_eval_gram_table``): identical output contract to
    :func:`contamination_report`, with the eval side read from the
    catalog instead of re-shingled. The train batch never shuffles —
    same broadcast-join shape, pinned by parity test."""
    tg = shingle_rows(train_batch, n, id_col, text_col, distinct=False).select(
        F.col(id_col).alias("train_doc_id"), "shingle"
    )
    return _collide(tg, spark.table(table))
