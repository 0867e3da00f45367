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


# ---------------------------------------------------------------------------
# Semantic (embedding-space) contamination — the paraphrase gap
# ---------------------------------------------------------------------------
# The n-gram report above is surface-exact: a benchmark item that was
# paraphrased, translated, or re-tokenized into the training corpus
# shares no 8-gram with its source and sails through. The semantic
# report closes that gap by comparing in embedding space: a training
# document is *semantically contaminated* by an eval item when their
# embedding cosine reaches ``tau`` (0.9 is a conservative default for
# sentence-embedding models; calibrate on a held-out paraphrase set).
#
# Scale design (100 TB corpus x benchmark-suite eval set):
# - ``method="broadcast"`` (exact): the eval side is broadcast with
#   precomputed norms and the corpus streams past it — ZERO shuffles,
#   N*E*d multiply-adds. Right when E (eval items) is small, the usual
#   case for curated suites.
# - ``method="banded"`` (approximate): both sides hash into
#   ``similarity.banded_buckets`` LSH bands; corpus rows pay
#   n_planes*d projection flops instead of E*d comparisons, candidates
#   come from a broadcast band-bucket join, and only candidates are
#   exactly rescored. Right when E is large (full suite unions,
#   E >> n_planes). Recall < 1 like every LSH path: a true pair missed
#   by all bands is invisible — size (n_planes, rows_per_band) with the
#   measured curves in similarity.py.
# Both paths emit the same contract, mirroring the n-gram report:
# (train_doc_id, eval_doc_id, cos_sim) for pairs at or above tau.
# Ids are namespaced by side — equal id values on the two sides are
# different documents and DO compare (no self-pair exclusion).


def semantic_contamination_report(
    train_vecs: DataFrame,
    eval_vecs: DataFrame,
    tau: float = 0.90,
    method: str = "broadcast",
    n_planes: int = 16,
    rows_per_band: int = 8,
    dims: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(train_doc_id, eval_doc_id, cos_sim) — one row per (train, eval)
    pair whose embedding cosine (rounded to 4 dp, the engine-portable
    rounding every similarity op here uses) is >= ``tau``.

    ``method="broadcast"`` is exact and shuffle-free; ``method="banded"``
    is the LSH-prefiltered scale path (requires ``dims``; exact rescoring
    on candidates, so its rows are always a subset of the exact report).
    """
    from ..functions.vectors import cosine_with_norms, norm

    ev = eval_vecs.select(
        F.col(id_col).alias("eval_doc_id"),
        F.col(vec_col).alias("__evec"),
        norm(F.col(vec_col)).alias("__en"),
    )
    tv = train_vecs.select(
        F.col(id_col).alias("train_doc_id"),
        F.col(vec_col).alias("__tvec"),
        norm(F.col(vec_col)).alias("__tn"),
    )
    if method == "broadcast":
        pairs = tv.crossJoin(F.broadcast(ev))
    elif method == "banded":
        if dims is None:
            raise ValueError(
                "semantic_contamination_report: method='banded' needs "
                "dims (the embedding dimension drives the hyperplane "
                "weights)"
            )
        from .similarity import banded_buckets

        tb = banded_buckets(
            train_vecs, n_planes, rows_per_band, dims, id_col, vec_col
        ).select(
            F.col(id_col).alias("train_doc_id"), "band", "bucket"
        )
        eb = banded_buckets(
            eval_vecs, n_planes, rows_per_band, dims, id_col, vec_col
        ).select(F.col(id_col).alias("eval_doc_id"), "band", "bucket")
        # any shared (band, bucket) makes a candidate; band union =
        # recall, dropDuplicates collapses multi-band hits to one pair
        cand = (
            tb.join(F.broadcast(eb), ["band", "bucket"])
            .select("train_doc_id", "eval_doc_id")
            .dropDuplicates(["train_doc_id", "eval_doc_id"])
        )
        pairs = cand.join(tv, "train_doc_id").join(
            F.broadcast(ev), "eval_doc_id"
        )
    else:
        raise ValueError(
            f"semantic_contamination_report: unknown method {method!r} "
            "(broadcast | banded)"
        )
    return (
        pairs.select(
            "train_doc_id",
            "eval_doc_id",
            F.round(
                cosine_with_norms(
                    F.col("__tvec"),
                    F.col("__evec"),
                    F.col("__tn"),
                    F.col("__en"),
                ),
                4,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= F.lit(tau))
    )


def semantically_contaminated_ids(
    train_vecs: DataFrame,
    eval_vecs: DataFrame,
    tau: float = 0.90,
    **kwargs,
) -> DataFrame:
    """Distinct ``train_doc_id`` rows flagged by
    :func:`semantic_contamination_report` — the anti-join handle, same
    role the n-gram report's train ids play in the eval-leakage recipe
    (flagged docs anti-join out of the corpus before tokenization)."""
    return (
        semantic_contamination_report(train_vecs, eval_vecs, tau, **kwargs)
        .select("train_doc_id")
        .distinct()
    )


def build_eval_embedding_table(
    eval_vecs: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the held-out suite's embeddings with precomputed norms —
    the incremental layout for :func:`semantic_contamination_report`'s
    broadcast path, symmetric to :func:`build_eval_gram_table`: norms
    are computed once per suite version instead of once per daily
    batch, and the plain unbucketed table is deliberate (the probe
    reads it whole into a broadcast)."""
    from ..functions.vectors import norm

    eval_vecs.select(
        F.col(id_col).alias("eval_doc_id"),
        F.col(vec_col).alias("__evec"),
        norm(F.col(vec_col)).alias("__en"),
    ).write.mode("overwrite").format("parquet").saveAsTable(table)


def semantic_contamination_against_table(
    spark,
    train_vecs: DataFrame,
    table: str,
    tau: float = 0.90,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Daily-batch semantic contamination against a persisted eval
    embedding table (:func:`build_eval_embedding_table`): identical
    output contract to the broadcast path of
    :func:`semantic_contamination_report`, with the eval side read from
    the catalog instead of re-normed. The train batch never shuffles."""
    from ..functions.vectors import cosine_with_norms, norm

    tv = train_vecs.select(
        F.col(id_col).alias("train_doc_id"),
        F.col(vec_col).alias("__tvec"),
        norm(F.col(vec_col)).alias("__tn"),
    )
    return (
        tv.crossJoin(F.broadcast(spark.table(table)))
        .select(
            "train_doc_id",
            "eval_doc_id",
            F.round(
                cosine_with_norms(
                    F.col("__tvec"),
                    F.col("__evec"),
                    F.col("__tn"),
                    F.col("__en"),
                ),
                4,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= F.lit(tau))
    )


def scrub_contaminated_spans(
    train: DataFrame,
    eval_docs: DataFrame | None,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hits_per_doc: int | None = None,
    eval_grams: DataFrame | None = None,
) -> DataFrame:
    """Surgical decontamination: instead of dropping a whole training
    document that collides with the eval suite (the
    :func:`contamination_report` → anti-join policy), remove exactly
    the tokens covered by SOME colliding n-gram and keep the rest —
    the right call for long documents quoting one benchmark item.
    ``eval_grams`` (a frame with a ``shingle`` column — e.g. the
    persisted :func:`build_eval_gram_table` table) substitutes for
    re-shingling ``eval_docs``, the incremental daily-batch layout.

    Output: one row per input document — ALL input columns pass
    through (pipeline-stage friendly) with ``text_col`` replaced by
    the scrubbed text, plus ``n_tokens`` and ``n_scrubbed_tokens``
    appended (those two names must not already be input columns).
    Clean documents come back byte-identical (split-on-space +
    join-on-space is the identity), fully contaminated ones with
    empty text (the ``span_exact_dedup`` shared row contract).

    Plan shape (100 TB): positioned grams are the same codegen'd
    position-explode ``shingle_rows`` uses (same tokenization, so
    collisions agree with the report); the eval gram set broadcasts
    and only COLLIDING (doc, pos) rows survive the join — near zero on
    a clean corpus. Colliding positions fold row-locally into merged
    disjoint intervals, and the token filter is one indexed-lambda
    pass per rebuilt document. The per-doc collect of colliding
    positions sits behind the house in-plan guard
    (``scale_rules.collected_group_max_rows``, ~8 B/position), failing
    loudly with the document named — a pathological doc would be one
    that embeds millions of distinct eval grams."""
    clash = {"n_tokens", "n_scrubbed_tokens"} & set(train.columns)
    if clash:
        raise ValueError(
            "scrub_contaminated_spans: input already has "
            f"{sorted(clash)} - the scrub appends those counter "
            "columns; rename the input's first"
        )
    toks = F.split(F.col(text_col), " ")
    pos = F.when(
        F.size("__toks") >= n,
        F.sequence(F.lit(1), F.size("__toks") - n + 1),
    ).otherwise(F.array().cast("array<int>"))
    gram = F.concat_ws(
        " ", *[F.element_at("__toks", F.col("__i") + k) for k in range(n)]
    )
    tg = (
        train.select(F.col(id_col), toks.alias("__toks"))
        .select(id_col, "__toks", F.explode(pos).alias("__i"))
        .select(F.col(id_col).alias("__tid"), "__i", gram.alias("shingle"))
    )
    if eval_grams is not None:
        # the incremental layout: a persisted gram table
        # (build_eval_gram_table / spark.table) — grams MUST come from
        # the same n and shingle_rows tokenization or nothing collides
        eg = eval_grams.select("shingle").distinct()
    elif eval_docs is not None:
        eg = (
            shingle_rows(eval_docs, n, id_col, text_col, distinct=True)
            .select("shingle")
            .distinct()
        )
    else:
        raise ValueError(
            "scrub_contaminated_spans: pass eval_docs or eval_grams"
        )
    hits = tg.join(F.broadcast(eg), "shingle").select("__tid", "__i")
    if max_hits_per_doc is None:
        from ..functions.scale_rules import collected_group_max_rows

        max_hits_per_doc = collected_group_max_rows(bytes_per_row=8)
    hits = (
        hits.withColumn(
            "__hn", F.count(F.lit(1)).over(Window.partitionBy("__tid"))
        )
        .filter(
            F.assert_true(
                F.col("__hn") <= F.lit(max_hits_per_doc),
                F.concat_ws(
                    " ",
                    F.lit("scrub_contaminated_spans: document"),
                    F.col("__tid").cast("string"),
                    F.lit("has"),
                    F.col("__hn").cast("string"),
                    F.lit(
                        "colliding gram positions > max_hits_per_doc="
                        f"{max_hits_per_doc}; the per-doc collect "
                        "materializes the whole group in one task - "
                        "raise the bound only with the scale_rules."
                        "collected_group_max_rows cost model in hand"
                    ),
                ),
            ).isNull()
        )
        .drop("__hn")
    )

    def _fold(acc, p):
        last_e = F.when(
            F.size(acc) > 0, F.element_at(acc, -1)["e"]
        ).otherwise(F.lit(-1))
        merged_last = F.array(
            F.struct(
                F.element_at(acc, -1)["s"].alias("s"),
                F.greatest(last_e, p + F.lit(n)).alias("e"),
            )
        )
        return F.when(
            last_e >= p,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), merged_last),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(p.alias("s"), (p + F.lit(n)).alias("e"))
                ),
            )
        )

    iv = F.aggregate(
        F.col("__starts"),
        F.array().cast("array<struct<s:int,e:int>>"),
        _fold,
    )
    spans = (
        hits.groupBy("__tid")
        .agg(F.array_sort(F.collect_list("__i")).alias("__starts"))
        .select("__tid", iv.alias("__iv"))
    )
    joined = (
        train.join(spans, F.col(id_col) == F.col("__tid"), "left")
        .withColumn("__toks", toks)
        .withColumn(
            "__iv",
            F.coalesce(
                "__iv", F.array().cast("array<struct<s:int,e:int>>")
            ),
        )
    )
    kept = F.filter(
        F.col("__toks"),
        lambda t, i: ~F.exists(
            F.col("__iv"),
            lambda v: (v["s"] <= i + 1) & (i + 1 < v["e"]),
        ),
    )
    passthrough = [
        F.array_join(kept, " ").alias(text_col)
        if c == text_col
        else F.col(c)
        for c in train.columns
    ]
    return joined.select(
        *passthrough,
        F.size("__toks").cast("long").alias("n_tokens"),
        (F.size("__toks") - F.size(kept)).cast("long").alias(
            "n_scrubbed_tokens"
        ),
    )


def decontaminate_corpus(
    docs: DataFrame,
    eval_docs: DataFrame,
    policy: str = "drop",
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hits_per_doc: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One-call decontamination with the curation-style audit contract:
    returns ``(kept, ledger)``, ledger = one row per AFFECTED document
    (doc_id, stage, reason).

    - ``policy="drop"`` (the GPT-3/PaLM appendix policy): any document
      sharing an n-gram with the eval suite is removed; ledger stage
      ``contamination`` carries the worst (eval_doc, contamination)
      pair. ``kept`` ids + ledger ids partition the input ids.
    - ``policy="scrub"`` (the surgical policy): documents are KEPT
      with the colliding token spans cut
      (:func:`scrub_contaminated_spans`); ledger stage ``scrub``
      records scrubbed/total token counts. ``kept`` ids equal the
      input ids; only its ``text_col`` differs.

    Both paths reuse the broadcast-gram machinery above (the corpus
    never shuffles to discover collisions); ``kept`` preserves the
    input schema either way."""
    if policy == "drop":
        report = contamination_report(docs, eval_docs, n, id_col, text_col)
        worst = (
            report.groupBy("train_doc_id")
            .agg(
                F.max(
                    F.struct("contamination", "eval_doc_id")
                ).alias("__w")
            )
            .select(
                F.col("train_doc_id").alias(id_col),
                F.concat_ws(
                    " ",
                    F.lit("eval_doc"),
                    F.col("__w.eval_doc_id").cast("string"),
                    F.lit("contamination"),
                    F.col("__w.contamination").cast("string"),
                ).alias("reason"),
            )
        )
        ledger = worst.select(
            id_col, F.lit("contamination").alias("stage"), "reason"
        )
        kept = docs.join(
            worst.select(id_col), id_col, "left_anti"
        )
        return kept, ledger
    if policy == "scrub":
        scrubbed = scrub_contaminated_spans(
            docs, eval_docs, n, id_col, text_col, max_hits_per_doc
        )
        ledger = (
            scrubbed.filter(F.col("n_scrubbed_tokens") > 0)
            .select(
                id_col,
                F.lit("scrub").alias("stage"),
                F.concat_ws(
                    " ",
                    F.lit("scrubbed"),
                    F.col("n_scrubbed_tokens").cast("string"),
                    F.lit("of"),
                    F.col("n_tokens").cast("string"),
                    F.lit("tokens"),
                ).alias("reason"),
            )
        )
        kept = scrubbed.drop("n_tokens", "n_scrubbed_tokens")
        return kept, ledger
    raise ValueError(
        f"decontaminate_corpus: unknown policy {policy!r} (drop | scrub)"
    )
