"""Piece → integer-id mapping with reserved specials: the final
tokenizer artifact a dataloader consumes — BPE/unigram produce piece
STRINGS (`bpe_encode`, `unigram_encode`); models want dense int ids
with ``<pad>/<unk>/<bos>/<eos>`` at fixed positions and, under byte
fallback, the 256 byte symbols at fixed positions too.

Id layout, deterministic by construction: specials first (0..n-1, in
the order given — position IS the contract), then the optional 256
``<0xNN>`` byte symbols (so a byte-fallback encode can never hit
``<unk>``), then the learned pieces in lexicographic order. Lexicographic
rather than frequency order keeps the mapping a pure function of the
piece SET — re-deriving ids after a re-train with the same vocabulary
yields the same table, no tie-break drift.

Plans: building the table is vocab-sized work (one window over the
piece table); ``encode_ids`` is the house encode shape — posexplode the
piece arrays, broadcast-join the vocab, reassemble per document with
one doc-keyed shuffle. Unknown pieces map to ``<unk>`` and are counted
per document (``n_unk`` — the audit column; a nonzero rate with byte
fallback on means the vocab and encoder disagree, which should be loud).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_SPECIALS = ("<pad>", "<unk>", "<bos>", "<eos>")


def piece_ids(
    pieces: DataFrame,
    specials: tuple[str, ...] = DEFAULT_SPECIALS,
    byte_symbols: bool = False,
    piece_col: str = "piece",
) -> DataFrame:
    """(piece, token_id) for specials ∪ [byte symbols] ∪ learned
    pieces. A learned piece colliding with a special/byte symbol keeps
    the reserved id (deduplicated, reserved wins)."""
    if "<unk>" not in specials:
        raise ValueError("piece_ids: specials must include <unk>")
    spark = pieces.sparkSession
    reserved = list(specials)
    if byte_symbols:
        reserved += [f"<0x{b:02X}>" for b in range(256)]
    res_df = spark.createDataFrame(
        [(p, i) for i, p in enumerate(reserved)],
        "piece string, token_id long",
    )
    base = len(reserved)
    learned = (
        pieces.select(F.col(piece_col).alias("piece"))
        .distinct()
        .join(res_df.select("piece"), "piece", "left_anti")
        .withColumn(
            "token_id",
            F.row_number().over(Window.orderBy("piece")) + base - 1,
        )
    )
    return res_df.unionByName(learned)


def encode_ids(
    encoded: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    pieces_col: str = "pieces",
) -> DataFrame:
    """(id, token_ids: array<long>, n_tokens, n_unk) from a
    piece-string encode and a :func:`piece_ids` table. Empty docs keep
    their row with an empty array."""
    unk = vocab.filter(F.col("piece") == "<unk>").collect()
    if not unk:
        raise ValueError("encode_ids: vocab lacks <unk>")
    unk_id = int(unk[0]["token_id"])
    toks = encoded.select(
        F.col(id_col),
        F.posexplode_outer(F.col(pieces_col)).alias("__pos", "piece"),
    )
    joined = toks.join(F.broadcast(vocab), "piece", "left").select(
        F.col(id_col),
        "__pos",
        F.when(
            F.col("__pos").isNull(), F.lit(None).cast("long")
        ).otherwise(F.coalesce("token_id", F.lit(unk_id))).alias("__tid"),
        (F.col("__pos").isNotNull() & F.col("token_id").isNull()).alias(
            "__is_unk"
        ),
    )
    member = F.struct(F.col("__pos"), F.col("__tid"))
    return (
        joined.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.when(F.col("__pos").isNotNull(), member))
            ).alias("__m"),
            F.sum(F.col("__is_unk").cast("long")).alias("n_unk"),
        )
        .select(
            F.col(id_col),
            F.transform(F.col("__m"), lambda m: m["__tid"]).alias(
                "token_ids"
            ),
            F.size(F.col("__m")).cast("long").alias("n_tokens"),
            F.coalesce("n_unk", F.lit(0)).alias("n_unk"),
        )
    )
