"""Unigram-LM tokenizer (SentencePiece-style) training and encoding on
Spark — the other standard subword tokenizer, complementing
``operators/bpe.py``'s merge-table BPE.

Algorithm (Kudo 2018, arXiv:1804.10959, in its hard-EM / Viterbi-EM
variant): seed a large candidate-piece vocabulary from frequent
substrings, alternate (E) Viterbi-segmenting the corpus under current
piece probabilities with (M) re-estimating probabilities from the
resulting piece counts, and prune the lowest-mass multi-character
pieces between rounds until the vocabulary reaches its target size.
Hard EM + count-mass pruning is the documented approximation of the
full forward-backward + loss-delta recipe; what it preserves — and
what the tests pin — is the structural contract: single characters are
never pruned (every string stays segmentable), probabilities are a
distribution, and the returned segmentation is Viterbi-optimal under
the returned probabilities.

Scale story (same as BPE's, deliberately):

- ONE corpus-sized pass builds the distinct-word frequency table
  (``bpe.word_frequencies``); everything after runs on vocab-sized
  operands regardless of corpus bytes.
- Candidate seeding is row-local substring generation over the word
  table (``F.slice``-style nested transforms — JVM-side, no Python)
  followed by one partial-agg'd aggregation.
- Each E-step segments only DISTINCT words, in an Arrow-batched Pandas
  UDF running the O(len · max_piece_len) Viterbi DP, memoized per
  word; counts come back as arrays and aggregate JVM-side weighted by
  word frequency. Python work is vocab-sized — the corpus never meets
  the interpreter.
- Encoding (``unigram_encode``) is byte-identical in shape to
  ``bpe_encode``: segment distinct words in Python, broadcast-join
  word → pieces, reassemble per document JVM-side with one doc-keyed
  shuffle.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from .bpe import word_frequencies


def _seed_candidates(
    words: DataFrame, max_piece_len: int, seed_min_freq: int
) -> DataFrame:
    """(piece, mass) for every substring of length 1..max_piece_len
    with freq-weighted occurrence mass ≥ seed_min_freq — generated
    row-locally (each word row emits its own substrings), aggregated
    map-side. Single characters are exempt from the mass floor: they
    are the segmentability guarantee."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(max_piece_len), F.length("word") - i + 1
                    ),
                ),
                lambda l: F.col("word").substr(i, l),
            ),
        )
    )
    pieces = (
        words.select("freq", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("mass"))
    )
    return pieces.filter(
        (F.length("piece") == 1) | (F.col("mass") >= seed_min_freq)
    )


def _viterbi_factory(
    logp: dict[str, float],
    max_piece_len: int,
    byte_fallback: bool = False,
):
    """Memoized O(len · max_piece_len) Viterbi DP. Characters absent
    from the vocabulary (possible only at encode time, on words unseen
    in training) segment as themselves at a floor score — or, with
    ``byte_fallback``, as SentencePiece-style ``<0xNN>`` byte pieces,
    so the emitted piece ALPHABET stays the fixed trained vocabulary
    plus the 256 byte symbols (a closed id space for the embedding
    table) instead of growing with every novel character."""
    unk = min(logp.values()) - 10.0 if logp else -100.0

    def segment(word: str) -> list[str]:
        n = len(word)
        best = [0.0] + [-math.inf] * n
        back = [0] * (n + 1)
        for i in range(1, n + 1):
            for l in range(1, min(max_piece_len, i) + 1):
                p = logp.get(word[i - l : i])
                if p is None and l == 1:
                    p = unk
                if p is not None and best[i - l] + p > best[i]:
                    best[i] = best[i - l] + p
                    back[i] = l
        out: list[str] = []
        i = n
        while i > 0:
            piece = word[i - back[i] : i]
            if byte_fallback and len(piece) == 1 and piece not in logp:
                out.extend(
                    f"<0x{b:02X}>" for b in reversed(piece.encode("utf-8"))
                )
            else:
                out.append(piece)
            i -= back[i]
        out.reverse()
        return out

    cache: dict[str, list[str]] = {}

    def cached(word: str) -> list[str]:
        got = cache.get(word)
        if got is None:
            got = cache[word] = segment(word)
        return got

    return cached


def _segment_words(
    words: DataFrame,
    logp: dict[str, float],
    max_piece_len: int,
    word_col: str = "word",
    byte_fallback: bool = False,
) -> DataFrame:
    seg = _viterbi_factory(logp, max_piece_len, byte_fallback)

    @F.pandas_udf(ArrayType(StringType()))
    def seg_udf(w: pd.Series) -> pd.Series:
        return w.map(seg)

    return words.select(
        "*", seg_udf(F.col(word_col)).alias("pieces")
    )


def train_unigram(
    docs: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    max_piece_len: int = 8,
    seed_min_freq: int = 2,
    em_iters_per_round: int = 2,
    prune_frac: float = 0.25,
) -> DataFrame:
    """Learn a unigram piece vocabulary of ≤ ``vocab_size`` entries
    (never below the single-character floor). Returns the tokenizer
    artifact as a DataFrame (piece, logprob) — vocab-sized; persist it
    or hand it to :func:`unigram_encode`.

    Each round: ``em_iters_per_round`` hard-EM sweeps over the
    distinct-word table, then prune the lowest-mass multi-character
    pieces (``prune_frac`` of the overage toward the target, at least
    enough to converge). Driver state is the piece→logprob dict —
    vocab-sized by construction, the same bounded-operand stance as
    ``bpe.train_bpe``'s merge list."""
    words = word_frequencies(docs, text_col).localCheckpoint(eager=True)
    cand = _seed_candidates(words, max_piece_len, seed_min_freq).collect()
    mass = {r["piece"]: float(r["mass"]) for r in cand}
    chars = {p for p in mass if len(p) == 1}
    floor = len(chars)
    if vocab_size < floor:
        raise ValueError(
            f"train_unigram: vocab_size={vocab_size} below the "
            f"single-character floor ({floor} distinct characters)"
        )

    def to_logp(m: dict[str, float]) -> dict[str, float]:
        total = sum(m.values())
        return {p: math.log(v / total) for p, v in m.items() if v > 0}

    logp = to_logp(mass)
    while True:
        for _ in range(em_iters_per_round):
            segmented = _segment_words(words, logp, max_piece_len)
            counts = (
                segmented.select(
                    "freq", F.explode("pieces").alias("piece")
                )
                .groupBy("piece")
                .agg(F.sum("freq").alias("mass"))
                .collect()
            )
            new_mass = {r["piece"]: float(r["mass"]) for r in counts}
            # Keep every character segmentable even when Viterbi never
            # chooses it: epsilon mass instead of deletion.
            for c in chars:
                new_mass.setdefault(c, 1e-6)
            logp = to_logp(new_mass)
            mass = new_mass
        if len(logp) <= vocab_size:
            break
        multi = sorted(
            ((p, m) for p, m in mass.items() if len(p) > 1),
            key=lambda x: (x[1], x[0]),
        )
        overage = len(logp) - vocab_size
        # prune only a FRACTION of the overage per round so EM
        # re-estimates between prunes (the SentencePiece schedule);
        # max(1, ...) guarantees progress when the fraction rounds to 0
        n_drop = max(1, min(len(multi), int(overage * prune_frac)))
        for p, _ in multi[:n_drop]:
            del mass[p]
        logp = to_logp(mass)
    spark = docs.sparkSession
    return spark.createDataFrame(
        sorted(logp.items()), "piece string, logprob double"
    )


def unigram_encode(
    docs: DataFrame,
    pieces: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 8,
    byte_fallback: bool = False,
) -> DataFrame:
    """(doc_id, pieces: array<string>, n_pieces): each document as its
    Viterbi-optimal piece sequence under the trained vocabulary —
    ``bpe_encode``'s exact plan shape (distinct-word Python, corpus
    JVM-side, one doc-keyed shuffle; zero-token docs keep their row).
    ``byte_fallback`` closes the piece alphabet: unseen characters emit
    ``<0xNN>`` byte pieces instead of themselves."""
    logp = {
        r["piece"]: float(r["logprob"]) for r in pieces.collect()
    }
    toks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("__pos", "word"),
    )
    distinct_words = toks.select("word").distinct()
    segmented = _segment_words(
        distinct_words, logp, max_piece_len, byte_fallback=byte_fallback
    )
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
