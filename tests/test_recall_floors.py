"""ANN quality floors as regression tests (r4 verdict item 4).

tools/recall_probe.py *measures* the recall the approximate paths trade
for speed; nothing failed if quality regressed. These tests lift the
probe's measured numbers into pinned floors on the same testdata
embeddings, so a quality regression in operators/similarity.py turns a
test red:

- IVF recall@5 at sf0.001 measured 0.2375 / 0.3875 / 0.575 / 0.8375 for
  nprobe 1/2/4/8 (random vectors — IVF's worst case, recall ≈ scanned
  fraction + clustering gain). Floors sit ~20-25% under the measured
  values: far above the scanned-fraction collapse a real regression
  (broken assignment, wrong distance) produces, while tolerant of
  centroid-training drift.
- nprobe = k_centroids scans every cell, so recall MUST be exactly 1.0 —
  the sharp invariant that catches any candidate-generation or scoring
  bug independent of training quality.
- recall is monotone in nprobe (more probed cells ⇒ candidate superset ⇒
  any displacement in the top-k swaps in a globally-better vector).
- banded LSH must find EXACT duplicates with recall 1.0: identical
  vectors produce identical band signatures under any plane geometry,
  so a miss means the signature/banding/join pipeline itself broke
  (angle-dependent recall on non-identical pairs stays a measured
  number in the probe — it is geometry policy, not correctness).

int8 quantization recall ≥0.9 is already pinned in test_quantization.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.similarity import (
    brute_force_topk,
    build_ivf_index,
    ivf_topk,
    lsh_banded_neardup_pairs,
)
from data_pipeline_project_using_telegram_and_aws_spark.sources.tables import load_table

K = 5
N_QUERIES = 16
N_CENTROIDS = 16


def _topk_sets(df, qcol="query_id", dcol="vec_id"):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r[qcol], set()).add(r[dcol])
    return out


def _recall(approx: dict, exact: dict) -> float:
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    return hits / total if total else 1.0


def test_ivf_recall_floors_monotone_and_exhaustive_probe_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = _topk_sets(brute_force_topk(emb, queries, k=K))
    cents = build_ivf_index(
        emb, k=N_CENTROIDS, iters=3, cache_key="recall_floor_test"
    )
    rec = {
        nprobe: _recall(
            _topk_sets(
                ivf_topk(
                    emb,
                    n_queries=N_QUERIES,
                    nprobe=nprobe,
                    k=K,
                    centroids=cents,
                )
            ),
            exact,
        )
        for nprobe in (1, 2, 4, 8, N_CENTROIDS)
    }
    # scanning every cell IS brute force — exactness, not a floor
    assert rec[N_CENTROIDS] == 1.0, rec
    # measured-minus-margin floors (module docstring)
    assert rec[2] >= 0.30, rec
    assert rec[4] >= 0.45, rec
    assert rec[8] >= 0.65, rec
    # candidate-superset monotonicity
    assert (
        rec[1] <= rec[2] <= rec[4] <= rec[8] <= rec[N_CENTROIDS]
    ), rec


def test_banded_lsh_finds_exact_duplicates_with_full_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") < 40).unionByName(planted)
    got = lsh_banded_neardup_pairs(
        corpus, n_planes=16, rows_per_band=8, top=None
    )
    pairs = {
        (min(r.vec_a, r.vec_b), max(r.vec_a, r.vec_b)) for r in got.collect()
    }
    for i in range(5):
        assert (i, i + 100000) in pairs, (i, sorted(pairs))


def test_projected_brute_force_recall_floor(spark):
    """Composition floor for `operators/projection.py`: exact top-5 in
    the k=32 PROJECTED space must recover the full-dimension top-5 on
    CLUSTERED vectors — the regime projection is for. (On isotropic
    random vectors all pairwise distances concentrate and the JL
    distortion scrambles rankings — measured 0.16 recall on the random
    testdata embeddings, the JL worst case by design; with real margins
    the projection must preserve neighborhoods.) Deterministic
    hash-derived signs make the measured value stable; a sign/scale
    regression collapses it."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.projection import (
        random_projection,
    )

    # 16 well-separated 64-d cluster centers (deterministic ±5 sign
    # pattern per cluster), 20 members each with ±0.3 jitter
    member = spark.range(320).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: (
                F.when(
                    F.pmod(F.xxhash64(F.pmod(F.col("id"), 16), d), 2)
                    == 0,
                    F.lit(5.0),
                ).otherwise(F.lit(-5.0))
                + F.when(
                    F.pmod(F.xxhash64(F.col("id"), d, F.lit(9)), 2) == 0,
                    F.lit(0.3),
                ).otherwise(F.lit(-0.3))
            ).cast("float"),
        ).alias("embedding"),
    )
    queries = member.limit(N_QUERIES)
    truth = _topk_sets(brute_force_topk(member, queries, k=K))
    # full-dim truth: every neighbor shares the query's cluster
    for q, ns in truth.items():
        assert all(n % 16 == q % 16 for n in ns), (q, ns)
    pvecs = random_projection(member, 32)
    pqueries = random_projection(queries, 32)
    got = _topk_sets(brute_force_topk(pvecs, pqueries, k=K))
    # the pinned property: projection preserves CLUSTER IDENTITY —
    # every projected neighbor still comes from the query's cluster.
    # (Exact top-5 identity is NOT preserved: within-cluster ordering
    # rides on the ±0.3 jitter, which ε-distortion legitimately
    # scrambles — measured 0.53 exact-set recall here. Projection
    # serves coarse structure: routing, clustering, banding.)
    for q, ns in got.items():
        assert all(n % 16 == q % 16 for n in ns), (q, ns)
