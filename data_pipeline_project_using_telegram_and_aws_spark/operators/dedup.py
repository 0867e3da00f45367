"""Deduplication operators for large-scale text corpora (north-star
extension, SURVEY.md §7 Phase 4).

All operators are pure DataFrame compositions — shuffles only on the keys
that matter, no Python in the hot path — and every hash primitive is
``md5`` so a SQL oracle can reproduce results exactly.

Scale design (100 TB corpus):
- exact dedup: one hash-aggregate on a 32-byte digest, not the full text
  (shuffle carries the digest + doc id only).
- shingling: per-row ``transform(sequence(...))`` — no explode until after
  ``array_distinct``, so the shuffle sees each (doc, shingle) once.
- MinHash/LSH: signature agg shuffles |docs|×|salts| small rows; the band
  join only pairs docs sharing a band bucket — the classic sub-quadratic
  near-dup path. Brute-force pair verification happens only on candidates.
- SimHash: fingerprint is a single int per doc; near-dup candidates join
  on the fingerprint (or banded substrings of it at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_SALTS = 16  # minhash permutations (md5-salted lexicographic min)


def with_text_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("text_hash", F.md5(F.col(text_col).cast("binary")))


def exact_dedup_keep_first(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the lowest-id document per distinct text (hash group-by)."""
    return (
        with_text_hash(df, text_col)
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def shingles(text: F.Column, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of a text column (empty-safe)."""
    toks = F.split(text, " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(k + 1)) for k in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def doc_shingles(
    df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, shingle) exploded pairs + per-doc shingle counts."""
    sh = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    )
    return sh


def ngram_jaccard_pairs(
    df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """All-pairs n-gram Jaccard via an inverted shingle index (shuffle on
    shingle, then on the pair key — never a cross join)."""
    sh = doc_shingles(df, n, id_col, text_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))

    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    # per-doc size table is tiny relative to the pair table — broadcast both
    # sides so the pair stream never reshuffles
    sa = F.broadcast(
        sizes.select(
            F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("size_a")
        )
    )
    sb = F.broadcast(
        sizes.select(
            F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("size_b")
        )
    )
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common")
                / (F.col("size_a") + F.col("size_b") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )


def minhash_signatures(
    df: DataFrame, n: int = 3, n_salts: int = N_SALTS,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """MinHash signature: for each salt, the lexicographic min of
    md5(salt || shingle) — a valid min-wise permutation family, chosen over
    integer hashing because md5 exists identically in the SQL oracle.
    Output: (doc_id, salt, minhash).

    Computed *row-locally*: each salt's min is an ``array_min`` fold over
    the document's shingle array, so nothing shuffles — the naive
    explode(shingles × salts) → groupBy formulation shuffles
    |docs|·|shingles|·|salts| rows (≈80× more here) for identical output.

    The nested lambda is written as one SQL ``expr`` with named variables:
    composing many Python-lambda ``F.transform`` calls in a single
    expression tree silently collides their auto-generated lambda-variable
    names (observed: wrong mins), so higher-order nesting stays in SQL.
    """
    mins = F.expr(
        f"transform(sequence(0, {n_salts - 1}), s -> "
        "array_min(transform(__sh, x -> "
        "md5(concat(cast(s as string), '|', x)))))"
    )
    return (
        df.withColumn("__sh", shingles(F.col(text_col), n))
        .select(F.col(id_col), F.posexplode(mins).alias("salt", "minhash"))
        .filter(F.col("minhash").isNotNull())
        .select(id_col, F.col("salt").cast("long").alias("salt"), "minhash")
    )


def minhash_lsh_candidates(
    df: DataFrame, n: int = 3, n_salts: int = N_SALTS, rows_per_band: int = 2,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Banded LSH over minhash signatures: docs sharing any band bucket
    become candidate pairs; est_jaccard = fraction of matching salts.

    The band join is the sub-quadratic step: bucket key =
    (band, md5(concat of the band's minhashes)). Only bucket collisions are
    paired — at 100 TB this is the difference between feasible and not.
    """
    sigs = minhash_signatures(df, n, n_salts, id_col, text_col)
    # array_sort before hashing: collect_list order is nondeterministic
    bands = (
        sigs.withColumn("band", (F.col("salt") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.array_join(
                    F.array_sort(
                        F.collect_list(
                            F.concat_ws(":", F.lpad("salt", 4, "0"), "minhash")
                        )
                    ),
                    ",",
                )
            ).alias("bucket")
        )
    )
    left = bands.select(F.col(id_col).alias("doc_a"), "band", "bucket")
    right = bands.select(F.col(id_col).alias("doc_b"), "band", "bucket")
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    siga = sigs.select(
        F.col(id_col).alias("doc_a"), "salt", F.col("minhash").alias("mh_a")
    )
    sigb = sigs.select(
        F.col(id_col).alias("doc_b"), "salt", F.col("minhash").alias("mh_b")
    )
    return (
        cand.join(siga, "doc_a")
        .join(sigb, ["doc_b", "salt"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.round(
                F.sum((F.col("mh_a") == F.col("mh_b")).cast("int"))
                / F.lit(float(n_salts)),
                4,
            ).alias("est_jaccard")
        )
    )


def simhash16(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """16-bit SimHash fingerprint per document.

    Bit *i* is the sign of the token-weighted sum of ±1 votes, where the
    vote of a token for bit *i* is the high bit of hex digit *i* of
    md5(token) — fully reproducible in ANSI SQL (no engine-specific
    integer hash), which is the point: near-dup fingerprints stay
    oracle-checkable. Scale: one explode + one 16-column hash-agg.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).filter(F.col("token") != "")
    hashed = toks.withColumn("h", F.md5(F.col("token").cast("binary")))
    votes = [
        F.sum(
            F.when(
                F.substring("h", i + 1, 1).isin(*list("89abcdef")), 1
            ).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(16)
    ]
    sums = hashed.groupBy(id_col).agg(*votes)
    bits = sum(
        (F.when(F.col(f"v{i}") >= 0, 2**i).otherwise(0) for i in range(16)),
        F.lit(0),
    )
    return sums.select(F.col(id_col), bits.cast("long").alias("simhash"))
