"""Deterministic negative sampling: pair every document with ``k``
pseudo-random OTHER documents — the contrastive-training data op
(embedding models train on (anchor, positive, negatives); dedup/ANN
evaluation wants random non-neighbors as controls). `knn_join` finds
the hard neighbors; this finds the uniform-random rest, without RNG
state and without ever materializing the n² pair space.

Scale shape: the id universe reduces once to a REPRESENTATIVE table —
one id per hash bucket, chosen as the md5-min of the bucket (one
partial-agg'd aggregation, ``n_buckets`` rows). Each anchor emits
``k + pad`` probe rows whose target bucket is an independent hash of
(anchor, probe-index, seed); probes equi-join the representative table
on the bucket — ONE keyed shuffle of anchor×(k+pad) rows against
bucket-count rows, nothing quadratic. Self-collisions (an anchor
probing its own bucket may draw itself) are filtered and absorbed by
the pad, ranked by probe index so the kept k are a pure function of
(data, seed).

Uniformity caveat, stated honestly: sampling is uniform over BUCKET
REPRESENTATIVES, not over documents — each anchor can only ever draw
from the ``n_buckets`` md5-min ids. Size ``n_buckets`` ≫ anchors × k
for collision-free diversity, and ≈ corpus size if every document must
be drawable; the default (4096) suits evaluation-control use, not
full-corpus contrastive corpora — pass the bigger dial for those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_BUCKETS = 4096
PAD = 3


def negative_samples(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id_col, neg_id, neg_rank 0..k-1): ``k`` deterministic negatives
    per row, never the row itself.

    Shortfall math, stated honestly: an anchor needs ``k`` DISTINCT
    non-self representatives from its draws, and BOTH self-collisions
    and probe-to-probe bucket collisions consume the slack — with ``m``
    draws over ``R`` occupied buckets the expected number of wasted
    (colliding) draws is ≈ m(m−1)/(2R), the birthday rate, far above
    the old (1/R)^pad folklore. The pad is therefore sized from the
    MEASURED ``R``: pad = PAD + ⌈(k+PAD)²/(2R)⌉ extra probes, so the
    expected waste is covered with the same fixed-PAD headroom on top.
    An anchor can still (rarely) fall short when R is tiny relative to
    k; per-anchor row counts are the caller's audit signal. Extra tail
    probes never change the first-k-distinct prefix, so raising the pad
    is output-compatible for anchors that were already full."""
    if k <= 0:
        raise ValueError("negative_samples: k must be > 0")
    if n_buckets < 2 * (k + PAD):
        raise ValueError(
            "negative_samples: n_buckets too small for k — the draw "
            "space must exceed the per-anchor demand"
        )
    reps = (
        df.select(F.col(id_col))
        .groupBy(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).alias(
                "__bucket"
            )
        )
        .agg(
            F.min_by(
                F.col(id_col), F.md5(F.col(id_col).cast("string"))
            ).alias("neg_id")
        )
    )
    # probes must target OCCUPIED buckets (a sparse corpus occupies a
    # fraction of the bucket space and an inner join on an empty bucket
    # silently starves the anchor): index the representatives densely
    # 0..R-1 and probe over R. The window and count run over the
    # bucket-table — n_buckets-bounded, never corpus-sized.
    reps = (
        reps.withColumn(
            "__ridx",
            F.row_number().over(Window.orderBy("__bucket")) - 1,
        )
        .drop("__bucket")
        # reps feeds both the R count and the probe join: checkpoint so
        # the corpus aggregates once, not once per consumer
        .localCheckpoint(eager=True)
    )
    r = reps.count()  # occupied buckets — control-plane scalar
    if r == 0:
        return reps.select(
            F.col("neg_id").alias(id_col),
            F.col("neg_id"),
            F.lit(0).cast("long").alias("neg_rank"),
        )
    m = k + PAD
    pad = PAD + -(-(m * m) // (2 * r))  # birthday-rate cover, ceil
    probes = df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.lit(k + pad - 1))
        ).alias("__j"),
    ).withColumn(
        "__ridx",
        F.pmod(
            F.xxhash64(F.col(id_col), F.col("__j"), F.lit(seed)),
            F.lit(r),
        ),
    )
    w = Window.partitionBy(id_col).orderBy("__j")
    return (
        probes.join(reps, "__ridx")
        .filter(F.col("neg_id") != F.col(id_col))
        # two probes can land in one bucket: keep each negative once
        # per anchor (first probe index wins) so the k are DISTINCT
        .withColumn(
            "__dup",
            F.row_number().over(
                Window.partitionBy(id_col, "neg_id").orderBy("__j")
            ),
        )
        .filter(F.col("__dup") == 1)
        .withColumn("neg_rank", F.row_number().over(w) - 1)
        .filter(F.col("neg_rank") < k)
        .select(id_col, "neg_id", F.col("neg_rank").cast("long"))
    )


def build_triplets(
    vectors: DataFrame,
    k_hard: int = 2,
    k_rand: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
    n_buckets: int = DEFAULT_BUCKETS,
    **knn_kwargs,
) -> DataFrame:
    """Contrastive training records: (anchor id, positive_id, hard_negs,
    rand_negs) — positive = the anchor's nearest neighbor (the standard
    self-supervised proxy when no labels exist), hard negatives = the
    next ``k_hard`` neighbors (`semdedup.knn_join` — the informative
    ones), random negatives = ``k_rand`` uniform controls
    (:func:`negative_samples`), excluding any id already used as the
    positive or a hard negative for that anchor.

    One kNN pass + one sampling pass + two group-collects; anchors
    whose cluster yields no neighbor (singleton clusters) drop — a
    triplet needs a positive, and the count difference is the caller's
    audit signal."""
    from .semdedup import knn_join

    nn = knn_join(
        vectors, knn=k_hard + 1, id_col=id_col, vec_col=vec_col,
        **knn_kwargs,
    )
    pos = nn.filter(F.col("nn_rank") == 1).select(
        F.col(id_col), F.col("neighbor_id").alias("positive_id")
    )
    hard = (
        nn.filter(F.col("nn_rank") > 1)
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("nn_rank", "neighbor_id"))
            ).alias("__h")
        )
        .select(
            id_col,
            F.transform(F.col("__h"), lambda s: s["neighbor_id"]).alias(
                "hard_negs"
            ),
        )
    )
    rand = (
        negative_samples(
            vectors.select(id_col), k=k_rand + k_hard + 1,
            id_col=id_col, seed=seed, n_buckets=n_buckets,
        )
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("neg_rank", "neg_id"))
            ).alias("__r")
        )
        .select(
            id_col,
            F.transform(F.col("__r"), lambda s: s["neg_id"]).alias(
                "__rand_all"
            ),
        )
    )
    return (
        pos.join(hard, id_col, "left")
        .join(rand, id_col, "left")
        .select(
            id_col,
            "positive_id",
            F.coalesce(
                "hard_negs", F.array().cast("array<long>")
            ).alias("hard_negs"),
            F.slice(
                F.array_except(
                    F.coalesce(
                        "__rand_all", F.array().cast("array<long>")
                    ),
                    F.concat(
                        F.array(F.col("positive_id")),
                        F.coalesce(
                            "hard_negs", F.array().cast("array<long>")
                        ),
                    ),
                ),
                1,
                k_rand,
            ).alias("rand_negs"),
        )
    )
