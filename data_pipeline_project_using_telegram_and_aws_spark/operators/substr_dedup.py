"""Exact-substring dedup — the ExactSubstr family (Lee et al.,
"Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499): find every maximal character span whose length-k
windows all repeat somewhere in the corpus, and cut every occurrence.
The paper builds one giant suffix array; that is a single-machine
design. The Spark-shaped equivalent below is an inverted index over
ALL k-gram positions plus per-document island stitching — every step
a keyed shuffle, nothing global, which is what survives a 100 TB
corpus sharded over 1000 executors.

Relationship to `winnowing` (dd7): winnowing SAMPLES k-grams (window
minima) to make candidate FINDING cheap and probabilistic; this module
keeps every position to make span MARKING exact. Use winnowing to find
which documents overlap; use this when the task is "delete every
repeated ≥L-char run from the corpus", the pretraining-dedup step the
paper showed removes memorization fuel.

Contract (stated precisely because the k-gram form is an
approximation of suffix-array maximal repeats):

- NO FALSE NEGATIVES at ≥ k: any substring of length ≥ k that occurs
  twice anywhere (across documents or twice within one) is fully
  covered by reported spans in BOTH places.
- Over-extension is possible (chimeras): a span is reported when each
  of its k-windows repeats SOMEWHERE — adjacent windows may match
  different sources, so a reported span need not occur contiguously
  elsewhere as a whole. For corpus hygiene this errs on the side of
  removing slightly more, the same trade the public Spark/BigQuery
  reimplementations of ExactSubstr make.
- Hash collisions: grams are compared by 48-bit md5-prefix
  (`winnowing`'s reproducible-in-SQL recipe); a collision can mark a
  non-repeated gram (~n²/2⁴⁸ expected false grams — negligible below
  ~10⁷ distinct grams per partition-of-concern, and harmless: one
  extra marked window).

Plan shape: one explode (|text| rows/doc) → one groupBy on gram hash
(the dominant shuffle, count ≥ 2) → one hash-keyed join back → one
per-doc window for island stitching. `remove_spans` is a join + one
fold (merge overlaps, cut) — zero Python end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _gram_hash(text, pos, k: int):
    """48-bit md5-prefix integer of the char k-gram at 1-based
    ``pos`` — `winnowing.winnow_fingerprints`' exact recipe, so the
    two schemes' fingerprints can be cross-checked in tests."""
    return F.conv(
        F.substring(
            F.md5(F.substring(text, pos, k).cast("binary")), 1, 12
        ),
        16,
        10,
    ).cast("long")


def exact_substring_spans(
    df: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """(id, span_start, span_length) — maximal spans (1-based start)
    whose every k-window occurs ≥ ``min_count`` times corpus-wide
    (within-document repeats count). Documents shorter than ``k``
    yield nothing. Spans from distinct islands may overlap by up to
    ``k - 1`` chars (islands are maximal runs of duplicated window
    STARTS); `remove_spans` merges them before cutting.

    Scale: the gram-hash groupBy carries one row per character of
    corpus — the honest cost of exactness (the suffix array pays the
    same n log n on one machine). It shuffles on a uniform 48-bit
    hash, so there is no skew; duplicated-hash survivors are the only
    rows that travel into the join."""
    text = F.col(text_col)
    n_pos = F.length(text) - k + 1
    pos_seq = F.when(n_pos >= 1, F.sequence(F.lit(1), n_pos)).otherwise(
        F.array().cast("array<int>")
    )
    grams = df.select(
        F.col(id_col), text.alias("__t"), F.explode(pos_seq).alias("__p")
    ).select(
        F.col(id_col),
        F.col("__p"),
        _gram_hash(F.col("__t"), F.col("__p"), k).alias("__h"),
    )
    dup = (
        grams.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_count)
        .select("__h")
    )
    marked = grams.join(dup, "__h").select(id_col, "__p")
    # island stitch: consecutive duplicated positions share
    # (p - row_number) — the classic gaps-and-islands key
    rn = F.row_number().over(Window.partitionBy(id_col).orderBy("__p"))
    islands = marked.withColumn("__island", F.col("__p") - rn)
    return (
        islands.groupBy(id_col, "__island")
        .agg(
            F.min("__p").alias("span_start"),
            (F.max("__p") - F.min("__p") + k).alias("span_length"),
        )
        .drop("__island")
    )


def remove_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cut every reported span out of every document (the paper's
    policy: ALL occurrences go — §4.2 of arXiv:2107.06499 found no
    benefit to keeping one copy) and return ``df`` with ``text_col``
    rewritten (documents with no spans pass through unchanged).
    Overlapping/adjacent spans are merged first, then the kept pieces
    are stitched with one fold — array HOFs only, no Python, no
    window: per-document span lists are collected by a keyed groupBy
    and documents are wide, not deep."""
    text = F.col(text_col)
    per_doc = spans.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"),
                    (F.col("span_start") + F.col("span_length")).alias(
                        "e"
                    ),
                )
            )
        ).alias("__spans")
    )
    # merge overlapping/adjacent [s, e) intervals with one fold
    merged = F.aggregate(
        F.col("__spans"),
        F.expr("cast(array() as array<struct<s:int,e:int>>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (x["s"] <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        F.greatest(
                            F.element_at(acc, -1)["e"], x["e"]
                        ).alias("e"),
                    )
                ),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    out = df.join(per_doc, id_col, "left").withColumn("__m", merged)
    # fold over merged spans: carry (kept-so-far, cursor); finish by
    # appending the tail after the last span
    cut = F.aggregate(
        F.col("__m"),
        F.struct(
            F.lit("").alias("kept"), F.lit(1).alias("cur")
        ),
        lambda acc, x: F.struct(
            F.concat(
                acc["kept"],
                F.substring(text, acc["cur"], x["s"] - acc["cur"]),
            ).alias("kept"),
            x["e"].alias("cur"),
        ),
        lambda acc: F.concat(
            acc["kept"],
            F.substring(
                text, acc["cur"], F.length(text) - acc["cur"] + 1
            ),
        ),
    )
    return out.withColumn(
        text_col, F.when(F.col("__m").isNull(), text).otherwise(cut)
    ).drop("__spans", "__m")
