"""Fuzzy record linkage on strings: find near-matching identity
strings (names, titles, addresses) across or within tables — the
entity-resolution sibling of the text near-dup family, for the join
nobody can write with equality (``"J. Smith" ⋈ "John Smith"``).

Same scale doctrine as every pair-finding operator here: NEVER
all-pairs. Candidates come from cheap deterministic blocks — by
default ``soundex`` of the normalized string (phonetic, catches
spelling drift) unioned with the first token (catches word-order and
suffix drift); each is one column + one equi-join. Pairs surface only
within a block, the block guard caps the quadratic expansion
(`scale_rules.blocked_pairs_max_block_rows` — the ss2 stance), and the
expensive measure (Levenshtein, JVM built-in) runs on candidate pairs
only. Scoring is edit-similarity ``1 − dist/maxlen`` on the normalized
strings; the threshold is the caller's precision/recall dial.

Blocking recall is honest: a pair sharing neither soundex-of-first
nor first token is invisible (e.g. a completely different alias) —
the documented trade, identical in kind to LSH band recall, and extra
block keys are pluggable via ``block_exprs``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def normalize_name(c: Column) -> Column:
    """Lower, trim, collapse whitespace, strip punctuation — the
    normalization both blocking and scoring run on."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), r"[^\p{L}\p{Nd} ]", " "),
            r"\s+",
            " ",
        )
    )


def default_blocks(norm: Column) -> list[Column]:
    return [
        F.concat(F.lit("sx:"), F.soundex(norm)),
        F.concat(F.lit("t0:"), F.split(norm, " ")[0]),
    ]


def fuzzy_pairs(
    records: DataFrame,
    id_col: str,
    text_col: str,
    min_similarity: float = 0.8,
    block_exprs: list[Column] | None = None,
    max_block_rows: int | None = None,
) -> DataFrame:
    """(id_a, id_b, similarity) for every candidate pair scoring ≥
    ``min_similarity`` (id_a < id_b; pairs found through several blocks
    appear once). Compose with ``components.connected_components`` for
    entity clusters."""
    if not 0 < min_similarity <= 1:
        raise ValueError("fuzzy_pairs: min_similarity in (0, 1]")
    if max_block_rows is None:
        from ..functions.scale_rules import blocked_pairs_max_block_rows

        max_block_rows = blocked_pairs_max_block_rows()
    norm = normalize_name(F.col(text_col))
    base = records.select(
        F.col(id_col).alias("__id"), norm.alias("__norm")
    ).filter(F.length("__norm") > 0)
    blocks = block_exprs or default_blocks(F.col("__norm"))
    blocked = base.select(
        "__id",
        "__norm",
        F.explode(F.array(*blocks)).alias("__block"),
    ).dropDuplicates(["__id", "__block"])
    from pyspark.sql import Window

    guarded = (
        blocked.withColumn(
            "__bn", F.count(F.lit(1)).over(Window.partitionBy("__block"))
        )
        .filter(
            F.assert_true(
                F.col("__bn") <= F.lit(max_block_rows),
                F.concat_ws(
                    " ",
                    F.lit("fuzzy_pairs: block"),
                    F.col("__block"),
                    F.lit("has"),
                    F.col("__bn").cast("string"),
                    F.lit(
                        f"rows > max_block_rows={max_block_rows}; add a "
                        "finer block_exprs key for this data"
                    ),
                ),
            ).isNull()
        )
        .drop("__bn")
    )
    a = guarded.select(
        "__block",
        F.col("__id").alias("id_a"),
        F.col("__norm").alias("__na"),
    )
    b = guarded.select(
        "__block",
        F.col("__id").alias("id_b"),
        F.col("__norm").alias("__nb"),
    )
    pairs = (
        a.join(b, "__block")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    maxlen = F.greatest(F.length("__na"), F.length("__nb"))
    sim = F.round(
        1.0 - F.levenshtein("__na", "__nb") / maxlen, 4
    )
    return (
        pairs.withColumn("similarity", sim)
        .filter(F.col("similarity") >= min_similarity)
        .select("id_a", "id_b", "similarity")
    )
