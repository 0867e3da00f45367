"""Similarity search over embedding columns (north-star extension,
SURVEY.md §7 Phase 4).

Two tiers, mirroring how ANN works on a real cluster:

- **Brute force** (baseline): query-set × corpus with the query side
  broadcast — the corpus is never shuffled, each executor scans its
  partitions once per batch of queries. Exact, O(|Q|·|C|·d); right when
  |Q| is small or as the reranker behind a candidate generator.
- **Hyperplane LSH buckets** (scale path): 8 deterministic random
  hyperplanes (signs derived from md5, so the SQL oracle reproduces them)
  → 256 buckets; pairs are generated only within a bucket. Sub-quadratic
  candidate generation for all-pairs similarity; the exact cosine reranks
  candidates. At 100 TB the bucket id becomes the shuffle/partition key
  and each bucket is processed independently.

All vector math is JVM-side fold expressions (functions/vectors.py) — no
Python UDF in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.vectors import cosine

N_PLANES = 8
DIMS = 64


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Ranking uses the *rounded* cosine (4 dp) with the neighbor id as
    tie-break, so results are reproducible across engines and runs.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec")
        )
    )
    pairs = corpus.crossJoin(q).filter(F.col(id_col) != F.col(query_id_col))
    scored = pairs.select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("neighbor_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("neighbor_rank") <= k)
        .orderBy(query_id_col, "neighbor_rank")
    )


def hyperplane_buckets(
    vectors: DataFrame,
    spark: SparkSession,
    n_planes: int = N_PLANES,
    dims: int = DIMS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector an LSH bucket: bit p = sign(v · w_p), where
    hyperplane weights w_p[d] ∈ {±1} come from md5(p_d) — deterministic,
    engine-independent, and good enough for cosine LSH (random signs)."""
    planes = (
        spark.range(n_planes)
        .withColumnRenamed("id", "p")
        .crossJoin(spark.range(dims).withColumnRenamed("id", "d"))
        .withColumn(
            "w",
            F.when(
                F.substring(
                    F.md5(
                        F.concat_ws("_", F.col("p"), F.col("d")).cast("binary")
                    ),
                    1,
                    1,
                )
                >= "8",
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        )
    )
    elems = vectors.select(
        id_col, F.posexplode(vec_col).alias("d", "e")
    ).withColumn("e", F.col("e").cast("double"))
    bits = (
        elems.join(F.broadcast(planes), "d")
        .groupBy(id_col, "p")
        .agg(F.sum(F.col("e") * F.col("w")).alias("proj"))
        .withColumn("bit", (F.col("proj") >= 0).cast("long"))
    )
    return bits.groupBy(id_col).agg(
        F.sum(F.col("bit") * F.pow(F.lit(2.0), F.col("p")))
        .cast("long")
        .alias("bucket")
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    max_rank: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "vec_id",
) -> DataFrame:
    """Assign each vector to its ``max_rank`` nearest centroids by cosine
    (rounded to 4 dp, centroid id as tie-break — deterministic across
    engines). Centroids are broadcast; the corpus never shuffles for the
    scoring, only |vectors|×|centroids| scored rows enter the per-vector
    top-k window."""
    c = F.broadcast(
        centroids.select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("__cvec")
        )
    )
    scored = vectors.crossJoin(c).select(
        F.col(id_col).alias(out_id),
        "centroid_id",
        F.round(cosine(F.col(vec_col), F.col("__cvec")), 4).alias("__cos"),
    )
    w = Window.partitionBy(out_id).orderBy(
        F.desc("__cos"), F.asc("centroid_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rank)
        .select(out_id, "centroid_id")
    )


def ivf_topk(
    vectors: DataFrame,
    n_centroids: int = 16,
    n_queries: int = 5,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors.

    Index: every vector is assigned to its nearest centroid (the inverted
    lists). Query: each query probes its ``nprobe`` nearest centroids and
    exact-reranks only those lists — the classic recall/cost dial. Here
    the "trained" centroids are the vectors with id < n_centroids
    (deterministic stand-in for a k-means pass, which would be run offline
    at scale); queries are the vectors with id < n_queries.

    At 100 TB the inverted lists are the partition key: assignments are
    written bucketed by centroid_id, so a query touches nprobe partitions
    instead of the whole corpus.
    """
    centroids = vectors.filter(F.col(id_col) < n_centroids)
    queries = vectors.filter(F.col(id_col) < n_queries)

    lists = ivf_assign(vectors, centroids, 1, id_col, vec_col)
    probes = ivf_assign(
        queries, centroids, nprobe, id_col, vec_col, out_id="query_id"
    )
    cand = (
        probes.join(lists, "centroid_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col)
    )
    qv = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
        )
    )
    scored = (
        cand.join(vectors.select(id_col, vec_col), id_col)
        .join(qv, "query_id")
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col(vec_col), F.col("__qvec")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("ivf_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("ivf_rank") <= k)
        .orderBy("query_id", "ivf_rank")
    )


def lsh_neardup_pairs(
    vectors: DataFrame,
    spark: SparkSession,
    top: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs near-duplicate search, LSH-bucketed then exactly reranked:
    candidates are only generated within a bucket (the sub-quadratic
    step), then exact cosine orders them."""
    buckets = hyperplane_buckets(vectors, spark, id_col=id_col, vec_col=vec_col)
    vb = vectors.join(buckets, id_col)
    a = vb.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("__va"), "bucket"
    )
    b = vb.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("__vb"), "bucket"
    )
    cand = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    return (
        cand.select(
            "bucket",
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_a", "vec_b")
        .limit(top)
    )
