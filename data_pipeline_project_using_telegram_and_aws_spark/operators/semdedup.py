"""SemDeDup-style semantic deduplication over an embedding column.

The shape follows the published SemDeDup recipe (Abbas et al. 2023,
arXiv:2303.09540): k-means-cluster the corpus embeddings, then search for
near-duplicate pairs ONLY within each cluster — the clustering turns the
quadratic all-pairs search into k independent intra-cluster searches, the
same blocking idea as LSH but with semantically meaningful blocks. Where
the paper keeps a random/lowest-centroid-similarity exemplar per
duplicate group, this implementation keeps the MINIMUM id — the same
deterministic keep rule every dedup path in this repo uses (the choice of
exemplar is orthogonal to the dedup semantics, and min-id makes the
result engine-reproducible and oracle-checkable).

Composition of existing scale-shaped operators, nothing new in the hot
path:

- centroids: ``similarity.build_ivf_index`` — Lloyd over a bounded
  md5-ordered sample (train cost independent of corpus size), shareable
  with the IVF ANN index of the same corpus (same cache key = train
  once, serve both);
- assignment: ``similarity.ivf_assign`` — broadcast centroids, corpus
  never shuffles for the scoring;
- intra-cluster pairs: ``similarity.blocked_neardup_pairs`` with the
  cluster id as the block key — deliberately quadratic *within* a
  cluster, which is SemDeDup's own cost model: expected cluster size is
  N/k, so choosing k ∝ √N bounds per-cluster work, and the operator's
  in-plan ``scale_rules.blocked_pairs_max_block_rows`` guard fails
  loudly if a skewed cluster would exceed the cost bound instead of
  OOMing an executor;
- closure: ``components.connected_components`` over the
  above-threshold edge list (candidate-sized, orders of magnitude below
  the corpus) — duplicate groups are transitive, exemplar = min id.

At 100 TB: train on a sample, persist assignments bucketed by
centroid_id (``similarity.build_ivf_assignments_table``), and the
pair search reads one bucket per task with zero corpus reshuffle; the
edge list and closure are candidate-sized throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .components import connected_components
from .similarity import (
    blocked_neardup_pairs,
    build_ivf_index,
    hierarchical_ivf_assign,
    ivf_assign,
)


def semantic_dedup(
    vectors: DataFrame,
    centroids: DataFrame | None = None,
    k: int = 16,
    iters: int = 3,
    sample_n: int | None = 256,
    tau: float = 0.4,
    cache_key: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block_rows: int | None = None,
    coarse_probes: int | None = None,
) -> DataFrame:
    """Label every vector with its semantic-duplicate group and keep flag.

    Returns (``id_col``, centroid_id, dup_group, kept): ``dup_group`` is
    the minimum id reachable through intra-cluster cosine-≥-``tau``
    pairs (the vector's own id if it has no duplicate), ``kept`` is true
    exactly for the group exemplar — so ``filter(kept)`` is the deduped
    corpus and ``filter(~kept)`` the auditable drop set.

    Pass ``centroids`` to reuse an already-trained index (e.g. the IVF
    ANN centroids of the same corpus); otherwise one is trained via
    ``build_ivf_index(k, iters, sample_n, cache_key)``.

    ``coarse_probes`` picks the assignment path:

    - ``None`` (default, r14): SCALE-DISPATCHED — flat exact assignment
      below `scale_rules.ivf_two_level_min_k` centroids, two-level
      `similarity.hierarchical_ivf_assign` with
      `scale_rules.ivf_coarse_probes` probed coarse cells at or above
      it, so the 100 TB path is the default path (r13 probe: flat n·k
      scoring walls the pipeline at Θ(n^1.5); two-level held exponent
      0.91 through 200k vectors). The dispatch reads the centroid count
      from `build_ivf_index`'s control-plane stamp when present, else
      one bounded `limit(min_k)` collect of centroid ids — index-sized
      either way. Registered-oracle geometries (sd1: k=16) dispatch
      FLAT by two orders of margin, so driver-checked rows keep the
      exact path.
    - ``0``: force flat exact assignment regardless of k.
    - ``> 0``: force two-level with that many probed coarse cells (the
      r13 opt-in dial, unchanged; see `hierarchical_ivf_assign` for
      the approximation contract — exact when probes ≥ coarse_k)."""
    if centroids is None:
        centroids = build_ivf_index(
            vectors,
            k=k,
            iters=iters,
            sample_n=sample_n,
            cache_key=cache_key,
            id_col=id_col,
            vec_col=vec_col,
        )
    if coarse_probes is None:
        from ..functions.scale_rules import (
            ivf_coarse_probes,
            ivf_two_level_min_k,
        )

        min_k = ivf_two_level_min_k()
        n_cents = getattr(centroids, "_spark_graft_k", None)
        if n_cents is None:
            # bounded control-plane probe (the components/bm25 dispatch
            # pattern): we only need to know whether k reaches min_k
            n_cents = len(
                centroids.select("centroid_id").limit(min_k).collect()
            )
        coarse_probes = ivf_coarse_probes() if n_cents >= min_k else 0
    if coarse_probes:
        assign = hierarchical_ivf_assign(
            vectors, centroids, probes=coarse_probes,
            id_col=id_col, vec_col=vec_col, out_id=id_col,
        )
        clustered = (
            vectors.select(id_col, vec_col)
            .join(assign, id_col)
            .localCheckpoint(eager=False)
        )
    else:
        # r13: the flat assignment carries the vector through its own
        # ranking window (``keep_vec``) instead of re-joining the corpus
        # by id afterwards — one exchange fewer, same rows/values. The
        # checkpoint still makes the assignment feed BOTH the pair scan
        # and the final labeling join exactly once (the bench-scale
        # analogue of persisting assignments bucketed by centroid_id —
        # similarity.build_ivf_assignments_table is that production
        # layout).
        clustered = ivf_assign(
            vectors, centroids, 1, id_col, vec_col,
            out_id=id_col,  # honor a non-default id_col end to end
            keep_vec=True,
        ).localCheckpoint(eager=False)
    edges = blocked_neardup_pairs(
        clustered,
        block_col="centroid_id",
        id_col=id_col,
        vec_col=vec_col,
        max_block_rows=max_block_rows,
    ).filter(F.col("cos_sim") >= tau)
    labels = connected_components(edges, "vec_a", "vec_b").withColumnRenamed(
        "node", id_col
    )
    return (
        clustered.select(id_col, "centroid_id")
        .join(labels, id_col, "left")
        .select(
            id_col,
            "centroid_id",
            F.coalesce("component", F.col(id_col)).alias("dup_group"),
            (F.coalesce("component", F.col(id_col)) == F.col(id_col)).alias(
                "kept"
            ),
        )
    )


def incremental_semantic_dedup(
    new_vectors: DataFrame,
    keepers: DataFrame,
    centroids: DataFrame,
    tau: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Daily-batch SemDeDup: admit only the semantically-new part of a
    batch against an existing exemplar set — the embedding-side twin of
    ``dedup.dedup_against_index`` (MinHash) and the same roles: the new
    batch is small by definition and computes fresh; the corpus-side
    ``keepers`` frame (the exemplars already admitted, typically read
    from a table bucketed by centroid_id —
    ``streaming/index_maintenance.py`` maintains exactly that layout)
    is probed in place and NEVER re-scored against itself.

    Returns ``(admitted, dropped)``: ``admitted`` rows are the batch
    members with no keeper within cosine ``tau`` in their cluster —
    append them to the keeper set to grow the corpus; ``dropped`` rows
    carry the nearest blocking keeper id and the cosine for the audit
    ledger.

    Two scale properties worth naming: (1) the probe joins only
    cluster-mates — the batch shuffles once keyed by centroid_id and
    meets keeper rows of the same cluster, so work is
    |batch| × cluster-occupancy, never |batch| × |corpus|; (2) WITHIN
    the batch, duplicates of each other (not of any keeper) are also
    resolved — by the same intra-cluster closure the full
    :func:`semantic_dedup` uses, restricted to batch rows that survived
    the keeper probe — so admitting a batch twice in a row admits
    nothing the second time."""
    assign_new = ivf_assign(
        new_vectors, centroids, 1, id_col, vec_col, out_id=id_col
    )
    batch = (
        new_vectors.select(id_col, vec_col)
        .join(assign_new, id_col)
        .localCheckpoint(eager=False)
    )
    k = keepers.select(
        F.col(id_col).alias("__keeper_id"),
        F.col(vec_col).alias("__kvec"),
        "centroid_id",
    )
    from ..functions.vectors import cosine

    probed = (
        batch.join(k, "centroid_id", "left")
        .select(
            id_col,
            "centroid_id",
            vec_col,
            "__keeper_id",
            F.when(
                F.col("__keeper_id").isNotNull(),
                F.round(cosine(F.col(vec_col), F.col("__kvec")), 4),
            ).alias("__cos"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc_nulls_last("__cos"), F.asc_nulls_last("__keeper_id")
    )
    nearest = (
        probed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    blocked = nearest.filter(F.col("__cos") >= tau)
    dropped_vs_keepers = blocked.select(
        id_col,
        "centroid_id",
        F.col("__keeper_id").alias("blocking_keeper"),
        F.col("__cos").alias("cos_sim"),
    )
    survivors = batch.join(
        blocked.select(id_col), id_col, "left_anti"
    )
    # intra-batch closure among the survivors: keep min-id exemplars
    intra = semantic_dedup(
        survivors.select(id_col, vec_col),
        centroids=centroids,
        tau=tau,
        id_col=id_col,
        vec_col=vec_col,
    )
    admitted = survivors.join(
        intra.filter(F.col("kept")).select(id_col), id_col
    )
    dropped_intra = (
        survivors.join(
            intra.filter(~F.col("kept")).select(
                id_col, F.col("dup_group").alias("blocking_keeper")
            ),
            id_col,
        )
        .select(
            id_col,
            "centroid_id",
            "blocking_keeper",
            F.lit(None).cast("double").alias("cos_sim"),
        )
    )
    return admitted, dropped_vs_keepers.unionByName(dropped_intra)


def knn_join(
    vectors: DataFrame,
    knn: int,
    centroids: DataFrame | None = None,
    k: int = 16,
    iters: int = 3,
    sample_n: int | None = 256,
    nprobe: int = 1,
    cache_key: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block_rows: int | None = None,
) -> DataFrame:
    """Approximate all-corpus kNN self-join: (``id_col``, neighbor_id,
    cos_sim, nn_rank) — the ``knn`` nearest neighbors of EVERY vector,
    not just of a query set (``similarity.bm25``/``ivf_topk`` serve the
    query-set case). The building block for kNN-graph dedup diagnostics,
    retrieval-augmentation neighborhoods, and label propagation.

    Same cost model as :func:`semantic_dedup`, whose machinery this
    reuses verbatim: cluster blocks cap the quadratic pair scan at
    (N/k)² per cluster with the in-plan block guard; per-vector top-k is
    one rank window over candidate pairs (candidate-sized, never N²).
    ``nprobe`` > 1 assigns each vector to its ``nprobe`` nearest
    centroids, so near-boundary vectors see neighbors in adjacent
    clusters too — recall rises, pair volume multiplies by ≤ nprobe²
    (the usual IVF dial; duplicates from co-probed blocks collapse by
    (src, dst)). Neighbors BEYOND the probed clusters are invisible —
    the approximation, identical to the serving-path IVF trade.
    """
    if centroids is None:
        centroids = build_ivf_index(
            vectors,
            k=k,
            iters=iters,
            sample_n=sample_n,
            cache_key=cache_key,
            id_col=id_col,
            vec_col=vec_col,
        )
    assign = ivf_assign(
        vectors, centroids, nprobe, id_col, vec_col, out_id=id_col
    )
    clustered = (
        vectors.select(id_col, vec_col)
        .join(assign, id_col)
        .localCheckpoint(eager=False)
    )
    pairs = blocked_neardup_pairs(
        clustered,
        block_col="centroid_id",
        id_col=id_col,
        vec_col=vec_col,
        max_block_rows=max_block_rows,
    )
    directed = (
        pairs.select(
            F.col("vec_a").alias(id_col),
            F.col("vec_b").alias("neighbor_id"),
            "cos_sim",
        )
        .unionByName(
            pairs.select(
                F.col("vec_b").alias(id_col),
                F.col("vec_a").alias("neighbor_id"),
                "cos_sim",
            )
        )
        # co-probed clusters produce the same pair once per shared
        # block; cos_sim is identical, keep one
        .dropDuplicates([id_col, "neighbor_id"])
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        directed.withColumn(
            "nn_rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("nn_rank") <= knn)
    )
