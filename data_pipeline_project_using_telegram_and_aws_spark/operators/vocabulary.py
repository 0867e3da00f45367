"""Corpus vocabulary and token-id encoding: the last text-side step
before a trainer — build a frequency-ranked vocab over the corpus, then
encode each document as an ``array<int>`` of token ids (OOV → 0).

This is a *word*-level codec (the honest version buildable from corpus
statistics alone); a learned subword merge table (BPE) is a training
artifact, not a corpus statistic — plug one in by substituting the
``vocab`` table, the encode plan is identical.

Scale shape:
- vocab build: one exploded aggregation (df counts, partial-agg'd) plus
  a rank window over the vocab itself (vocab-sized, not corpus-sized);
- encode: tokens explode with positions, broadcast-join the vocab
  (vocabularies are ~10⁵-10⁶ rows — megabytes), then one groupBy(doc)
  re-assembles ids in position order via row-local struct sort. The
  corpus shuffles once, keyed by doc id, carrying ints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

OOV_ID = 0  # reserved: tokens outside the vocab


def build_vocab(
    docs: DataFrame,
    vocab_size: int = 50_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(token, token_id, df) — the top ``vocab_size`` tokens by document
    frequency (ties broken lexicographically, so the vocab is a pure
    function of the corpus), ids dense from 1 (0 is reserved for OOV)."""
    term_doc = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
            )
        ).alias("token"),
    )
    dfreq = term_doc.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.orderBy(F.desc("df"), "token")
    return (
        dfreq.withColumn("token_id", F.row_number().over(w).cast("long"))
        .filter(F.col("token_id") <= vocab_size)
        .select("token", "token_id", "df")
    )


def encode_documents(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, token_ids: array<long>, n_tokens, n_oov) — each document
    as position-ordered token ids with OOV mapped to ``OOV_ID``.

    Row contract: exactly one output row per input document, INCLUDING
    documents whose text yields zero tokens (empty/whitespace-only) —
    those come back with an empty ``token_ids`` and ``n_tokens = 0``
    rather than silently vanishing (posexplode emits no rows for them,
    so the aggregate alone would drop them and break any downstream
    "every document placed exactly once" packing invariant). The
    restore is a left join from the input ids, keyed the same as the
    groupBy — one id-only exchange."""
    toks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("__pos", "token"),
    )
    mapped = toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        id_col,
        "__pos",
        F.coalesce(F.col("token_id"), F.lit(OOV_ID)).alias("__tid"),
    )
    member = F.struct(F.col("__pos"), F.col("__tid"))
    encoded = (
        mapped.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(member)).alias("__m"))
        .select(
            F.col(id_col),
            F.transform(F.col("__m"), lambda m: m["__tid"]).alias("token_ids"),
            F.size("__m").cast("long").alias("n_tokens"),
            F.size(
                F.filter(F.col("__m"), lambda m: m["__tid"] == OOV_ID)
            )
            .cast("long")
            .alias("n_oov"),
        )
    )
    return docs.select(id_col).join(encoded, id_col, "left").select(
        F.col(id_col),
        F.coalesce("token_ids", F.array().cast("array<long>")).alias(
            "token_ids"
        ),
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        F.coalesce("n_oov", F.lit(0).cast("long")).alias("n_oov"),
    )


def oov_report(
    batch: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    token_col: str = "token",
) -> DataFrame:
    """One-row vocabulary-drift report for an incoming batch against a
    persisted vocabulary: total token occurrences, OOV occurrences,
    distinct OOV types, and the OOV rate — the daily-ingest health
    metric that says when the tokenizer artifact has aged out from
    under the corpus (new language, new domain, log format change).

    Plan: explode the batch once, left-anti-ish mark via a broadcast
    join against the vocab's token column (vocab is vocab-sized by
    definition — the same broadcast stance as ``encode_documents``),
    then one aggregation. The batch shuffles zero times; nothing is
    corpus-sized on the driver."""
    toks = batch.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("token")
    )
    marked = toks.join(
        F.broadcast(
            vocab.select(F.col(token_col).alias("token")).distinct()
            .withColumn("__known", F.lit(True))
        ),
        "token",
        "left",
    )
    return marked.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("__known").isNull(), 1).otherwise(0)).alias(
            "n_oov"
        ),
        F.count_distinct(
            F.when(F.col("__known").isNull(), F.col("token"))
        ).alias("n_oov_types"),
    ).select(
        "n_tokens",
        "n_oov",
        "n_oov_types",
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.col("n_oov") / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("oov_rate"),
    )
