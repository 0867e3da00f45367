"""Byte-pair-encoding tokenizer training and encoding on Spark.

The subword merge table that ``vocabulary.py``'s docstring points at as
"a training artifact, not a corpus statistic" — trained here, on Spark,
with the standard word-count formulation (Sennrich et al. 2016,
arXiv:1508.07909): BPE never iterates over the raw corpus. It iterates
over the DISTINCT-WORD frequency table, which is vocab-sized (~10⁵-10⁶
rows) regardless of corpus size. That's the whole scale story:

- one corpus-sized exploded aggregation builds (word, freq) — the only
  pass over the data; every merge iteration after it runs on the word
  table alone, so training cost is O(n_merges · |vocab|), independent
  of corpus bytes;
- per iteration: adjacent symbol pairs are extracted ROW-LOCALLY
  (transform/element_at — no self-join), a freq-weighted pair count
  aggregates map-side, and the argmax pair (one row) comes back to the
  driver — the same tiny-fixpoint collect shape as
  ``components.connected_components``'s convergence check;
- the chosen merge applies to every word as a row-local left-to-right
  fold (``F.aggregate``); the word table is ``localCheckpoint``-ed per
  round to keep the plan flat.

Ties on pair frequency break lexicographically, so the merge table is a
pure function of the corpus (engine-reproducible; the tests pin it
against an independent Python BPE).

Encoding (``bpe_encode``) keeps Python out of the corpus path: only the
DISTINCT words of the documents are segmented — in an Arrow-batched
Pandas UDF applying the merge ranks with the standard priority loop,
memoized per word — and the corpus then broadcast-joins word → pieces
and reassembles per document JVM-side. Python work is vocab-sized; the
corpus shuffles once, keyed by doc id.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

END_OF_WORD = "</w>"


def _adjacent_pairs(arr):
    """Row-local (left, right) structs for adjacent symbol pairs."""
    return F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(arr)),
            lambda i: F.struct(
                F.element_at(arr, i - 1).alias("left"),
                F.element_at(arr, i).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))


def _apply_merge(arr, left: str, right: str):
    """Left-to-right greedy merge of adjacent (left, right) into
    left+right, as a row-local fold. Greediness is safe with one fold
    because the merged symbol differs from ``left`` (right is never
    empty), so a fresh merge can't chain into the same pair within this
    pass — exactly the reference BPE behavior ("aaa" + merge(a,a) →
    ["aa", "a"])."""
    merged = left + right
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over whitespace tokens — the single corpus pass."""
    return (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges; returns the ranked merge
    list [(left, right), ...]. Stops early when the best remaining pair
    falls below ``min_pair_freq`` (merging hapax pairs memorizes the
    corpus). The list IS the tokenizer artifact — hand it to
    ``bpe_encode`` or persist it as a two-column table."""
    words = (
        word_frequencies(docs, text_col)
        .select(
            "freq",
            F.concat(
                F.split("word", ""), F.array(F.lit(END_OF_WORD))
            ).alias("symbols"),
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            words.select(
                "freq", F.explode(_adjacent_pairs("symbols")).alias("p")
            )
            .groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0].n < min_pair_freq:
            break
        left, right = best[0].left, best[0].right
        merges.append((left, right))
        words = words.select(
            "freq", _apply_merge(F.col("symbols"), left, right).alias("symbols")
        ).localCheckpoint(eager=True)
    return merges


def _segment_udf(merges: list[tuple[str, str]]):
    """Arrow-batched segmenter over DISTINCT words: the reference
    priority-queue-free BPE apply loop (scan for the best-ranked pair
    present, merge, repeat), memoized per word."""
    rank = {pair: i for i, pair in enumerate(merges)}
    cache: dict[str, list[str]] = {}

    def segment(word: str) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word) + [END_OF_WORD]
        while len(syms) >= 2:
            pairs = list(zip(syms, syms[1:]))
            ranked = [(rank[p], i) for i, p in enumerate(pairs) if p in rank]
            if not ranked:
                break
            best_rank = min(r for r, _ in ranked)
            left, right = merges[best_rank]
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = syms
        return syms

    @F.pandas_udf(ArrayType(StringType()))
    def seg(words: pd.Series) -> pd.Series:
        return words.map(segment)

    return seg


def bpe_segment_words(
    words: DataFrame, merges: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """(word, pieces: array<string>) for a distinct-word table — the
    only stage where Python touches data, and it's vocab-sized."""
    seg = _segment_udf(merges)
    return words.select(word_col, seg(F.col(word_col)).alias("pieces"))


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pieces: array<string>, n_pieces) — each document as its
    position-ordered BPE pieces. Segmentation runs once per DISTINCT
    word (Pandas UDF, vocab-sized); the corpus-side plan is a
    broadcast join + one doc-keyed shuffle, the ``encode_documents``
    shape. Zero-token docs keep their row with an empty array."""
    toks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("__pos", "word"),
    )
    distinct_words = toks.select("word").distinct()
    segmented = bpe_segment_words(distinct_words, merges)
    member = F.struct(F.col("__pos"), F.col("pieces"))
    encoded = (
        toks.join(F.broadcast(segmented), "word")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(member)).alias("__m"))
        .select(
            F.col(id_col),
            F.flatten(
                F.transform(F.col("__m"), lambda m: m["pieces"])
            ).alias("pieces"),
        )
    )
    return docs.select(id_col).join(encoded, id_col, "left").select(
        F.col(id_col),
        F.coalesce("pieces", F.array().cast("array<string>")).alias("pieces"),
        F.size(F.coalesce("pieces", F.array().cast("array<string>")))
        .cast("long")
        .alias("n_pieces"),
    )


def save_merges(merges: list[tuple[str, str]], spark, path: str) -> None:
    """Persist the merge table as rank-ordered parquet — the tokenizer
    artifact in a form any engine can read back."""
    spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "rank long, left string, right string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[tuple[str, str]]:
    """Inverse of :func:`save_merges`; rank order restored explicitly
    (never trust file order)."""
    return [
        (r["left"], r["right"])
        for r in spark.read.parquet(path).orderBy("rank").collect()
    ]
