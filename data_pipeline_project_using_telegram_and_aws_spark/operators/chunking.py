"""Document chunking: split long documents into fixed-token windows with
overlap — the preparation step for embedding/retrieval pipelines (and
for packing models whose context is shorter than the longest document;
``packing.pack_sequences(strict=True)`` drops oversized docs, chunking
is the alternative that keeps their content).

Scale shape: tokenize once per row, explode chunk *starts* (an integer
sequence — same codegen'd position-explode pattern as
``dedup.shingle_rows``), and slice the token array per chunk. No
shuffle at all: chunking is a pure flatMap-shaped projection, and chunk
ids are (doc_id, chunk_index) so downstream dedup/embedding joins need
no global renumbering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_index, chunk_text, n_tokens, chunk_start) — one
    row per chunk; consecutive chunks share ``overlap`` tokens so a
    span straddling a boundary appears whole in at least one chunk
    (the retrieval-recall guarantee chunking exists for).

    Chunk starts advance by ``chunk_tokens - overlap``; the final chunk
    may be shorter, and a document shorter than one chunk yields exactly
    one chunk. Empty/whitespace-only documents yield no rows.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    d = df.select(F.col(id_col), toks.alias("__toks")).withColumn(
        "__n", F.size("__toks")
    )
    # last start = the largest multiple of stride still inside the doc
    # such that some new token is covered: ceil((n - overlap)/stride)
    # starts — floored at 1 so a non-empty doc shorter than the overlap
    # still yields its single chunk (a 0 floor would make the sequence
    # below descend into a negative chunk index)
    n_chunks = F.greatest(
        F.ceil((F.col("__n") - overlap) / stride).cast("int"), F.lit(1)
    )
    starts = F.when(
        F.col("__n") > 0, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    out = d.select(
        F.col(id_col), "__toks", "__n", F.explode(starts).alias("chunk_index")
    )
    begin = F.col("chunk_index") * stride
    piece = F.slice(F.col("__toks"), begin + 1, chunk_tokens)
    return out.select(
        F.col(id_col),
        F.col("chunk_index").cast("long").alias("chunk_index"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.least(F.col("__n") - begin, F.lit(chunk_tokens))
        .cast("long")
        .alias("n_tokens"),
        begin.cast("long").alias("chunk_start"),
    )
