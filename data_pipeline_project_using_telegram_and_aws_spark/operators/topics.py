"""Topic balance: cluster the corpus in embedding space, report each
cluster's share, and rebalance by per-cluster sampling — the
mixture-design tool for UNLABELED axes. `weighted_mixture` balances by
a COLUMN (source, lang); this balances by CONTENT, catching the skew
no metadata shows (e.g. half the crawl being product pages).

Pure composition of existing scale-shaped machinery, by design:

- vectors: caller-provided embeddings or in-engine hashed TF-IDF
  (`text_vectors.hashed_tfidf_vectors` — no external model);
- clusters: the deterministic Lloyd trainer + broadcast assignment the
  IVF/SemDeDup stack already shares (`similarity.build_ivf_index` /
  `ivf_assign` — train on a bounded sample, assign without shuffling
  the corpus);
- report: one aggregation; rebalance: `splits.deterministic_take_per_
  group` (exact per-cluster caps) — hash-stable, layout-stable.

The clusters are k-means cells, not human topics; the report's value
is RELATIVE mass and its drift over corpus versions, not the labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .similarity import build_ivf_index, ivf_assign
from .splits import deterministic_take_per_group


def assign_topics(
    vectors: DataFrame,
    k: int = 16,
    centroids: DataFrame | None = None,
    iters: int = 3,
    sample_n: int | None = 256,
    cache_key: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, topic_id): nearest-centroid assignment; pass ``centroids``
    to reuse a trained index (the SemDeDup/IVF sharing pattern)."""
    if centroids is None:
        centroids = build_ivf_index(
            vectors, k=k, iters=iters, sample_n=sample_n,
            cache_key=cache_key, id_col=id_col, vec_col=vec_col,
        )
    return ivf_assign(vectors, centroids, 1, id_col, vec_col).select(
        id_col, F.col("centroid_id").alias("topic_id")
    )


def topic_balance_report(assigned: DataFrame) -> DataFrame:
    """(topic_id, n_docs, share): cluster mass, largest first — feed
    two versions of this to `operators/drift.py`-style comparison or
    eyeball the head for a dominating cell."""
    total = Window.partitionBy()
    return (
        assigned.groupBy("topic_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "share",
            F.round(F.col("n_docs") / F.sum("n_docs").over(total), 6),
        )
        .orderBy(F.desc("n_docs"), "topic_id")
    )


def topic_balanced_sample(
    vectors: DataFrame,
    per_topic: int,
    k: int = 16,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "topic-balance",
    **train_kwargs,
) -> DataFrame:
    """At most ``per_topic`` rows from every cluster, hash-selected —
    the content-balanced subset (caps the dominating topic, keeps the
    tail whole). Returns the input columns + ``topic_id``."""
    if per_topic <= 0:
        raise ValueError("topic_balanced_sample: per_topic must be > 0")
    assigned = assign_topics(
        vectors, k=k, centroids=centroids, id_col=id_col,
        vec_col=vec_col, **train_kwargs,
    )
    joined = vectors.join(assigned, id_col)
    return deterministic_take_per_group(
        joined, "topic_id", per_topic, id_col=id_col, salt=salt
    )


def prototypicality_prune(
    vectors: DataFrame,
    keep_frac: float,
    mode: str = "keep_hard",
    k: int = 16,
    centroids: DataFrame | None = None,
    iters: int = 3,
    sample_n: int | None = 256,
    cache_key: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Prototypicality-based data pruning (Sorscher et al. 2022,
    "Beyond neural scaling laws"): score every example by its cosine to
    its k-means centroid — HIGH cosine = prototypical/easy, LOW =
    outlier/hard — then keep ``keep_frac`` of each cell from the chosen
    end. The paper's operating rule: with ABUNDANT data keep the hard
    tail (``keep_hard`` — prototypical mass is redundant), with scarce
    data keep the easy core (``keep_easy`` — outliers are noise). The
    per-CELL quota keeps pruning from emptying whole regions of
    embedding space, the same failure `topic_balanced_sample` guards.

    Output: (id, topic_id, proto_score, kept rows only) — survivors
    with their cell and score, deterministic under data+seed (score
    ties break on id), layout-stable.

    Plan: centroid training/assignment is the shared bounded-sample
    Lloyd + broadcast-assign machinery (nothing corpus-sized shuffles
    to score); ranking is one cell-keyed window — a single keyed
    shuffle of (id, cell, score) triples, the `topic_balanced_sample`
    shape."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(
            "prototypicality_prune: keep_frac must be in (0, 1]"
        )
    if mode not in ("keep_hard", "keep_easy"):
        raise ValueError(
            "prototypicality_prune: mode must be keep_hard | keep_easy"
        )
    if centroids is None:
        centroids = build_ivf_index(
            vectors, k=k, iters=iters, sample_n=sample_n,
            cache_key=cache_key, id_col=id_col, vec_col=vec_col,
        )
    scored = ivf_assign(
        vectors, centroids, 1, id_col, vec_col, keep_score=True
    ).select(
        id_col,
        F.col("centroid_id").alias("topic_id"),
        F.col("cos").alias("proto_score"),
    )
    order = (
        [F.asc("proto_score"), F.asc(id_col)]
        if mode == "keep_hard"
        else [F.desc("proto_score"), F.asc(id_col)]
    )
    w = Window.partitionBy("topic_id").orderBy(*order)
    cell = Window.partitionBy("topic_id")
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(cell))
        .filter(
            F.col("__rk")
            <= F.ceil(F.col("__n") * F.lit(keep_frac)).cast("int")
        )
        .drop("__rk", "__n")
    )
