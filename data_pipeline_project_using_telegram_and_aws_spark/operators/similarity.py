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
