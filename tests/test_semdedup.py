"""SemDeDup operator semantics (operators/semdedup.py): clustering +
intra-cluster threshold pairs + transitive closure + min-id exemplar.

The synthetic corpus plants exact-duplicate and near-duplicate vectors
inside clearly separated directions so cluster assignment is
unambiguous regardless of the trained centroids' exact positions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.semdedup import (
    semantic_dedup,
)

DIM = 8


def _vec(axis: int, eps: float = 0.0, flip: int = 1) -> list:
    """Unit-ish vector along ``axis`` with a small off-axis wiggle."""
    v = [0.0] * DIM
    v[axis] = 1.0 * flip
    v[(axis + 1) % DIM] = eps
    return v


@pytest.fixture(scope="module")
def planted(spark):
    # Three families along axes 0/2/4: family 0 has three mutually-near
    # members (a chain through the closure), family 2 has an exact pair,
    # family 4 is a singleton. Orthogonal families can never cross the
    # cosine threshold, so groups are known a priori.
    rows = [
        Row(vec_id=1, embedding=_vec(0)),
        Row(vec_id=2, embedding=_vec(0, 0.05)),
        Row(vec_id=3, embedding=_vec(0, 0.10)),
        Row(vec_id=10, embedding=_vec(2)),
        Row(vec_id=11, embedding=_vec(2)),
        Row(vec_id=20, embedding=_vec(4)),
        Row(vec_id=30, embedding=_vec(6, 0.0, -1)),
    ]
    return spark.createDataFrame(rows)


def test_planted_duplicate_groups(planted):
    out = {
        r.vec_id: (r.dup_group, r.kept)
        for r in semantic_dedup(
            planted, k=4, iters=2, sample_n=None, tau=0.95
        ).collect()
    }
    assert len(out) == 7  # every vector labeled exactly once
    # family 0: closure pulls 1-2-3 into one group, exemplar = min id
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[3] == (1, False)
    # exact pair keeps the lower id
    assert out[10] == (10, True)
    assert out[11] == (10, False)
    # singletons are their own group and always kept
    assert out[20] == (20, True)
    assert out[30] == (30, True)


def test_kept_filter_is_the_deduped_corpus(planted):
    out = semantic_dedup(planted, k=4, iters=2, sample_n=None, tau=0.95)
    kept_ids = {r.vec_id for r in out.filter("kept").collect()}
    assert kept_ids == {1, 10, 20, 30}
    # exactly one exemplar per group
    per_group = (
        out.groupBy("dup_group")
        .agg(F.sum(F.col("kept").cast("int")).alias("n_kept"))
        .collect()
    )
    assert all(r.n_kept == 1 for r in per_group)


def test_tau_one_keeps_everything_but_exact_dups(planted):
    # cosine rounds to 4 dp; only the exact pair (10, 11) reaches 1.0
    out = {
        r.vec_id: r.kept
        for r in semantic_dedup(
            planted, k=4, iters=2, sample_n=None, tau=1.0
        ).collect()
    }
    assert out == {1: True, 2: True, 3: True, 10: True, 11: False,
                   20: True, 30: True}


@pytest.fixture(scope="module")
def axis_centroids(spark):
    rows = [
        Row(centroid_id=0, cvec=[1.0] + [0.0] * (DIM - 1)),
        Row(centroid_id=1, cvec=[0.0, 0.0, 1.0] + [0.0] * (DIM - 3)),
    ]
    return spark.createDataFrame(rows)


def test_incremental_blocks_against_keepers_and_within_batch(
    spark, axis_centroids
):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.semdedup import (
        incremental_semantic_dedup,
    )

    keepers = spark.createDataFrame(
        [Row(vec_id=1, embedding=_vec(0), centroid_id=0)]
    )
    batch = spark.createDataFrame(
        [
            Row(vec_id=10, embedding=_vec(0, 0.05)),  # near keeper 1
            Row(vec_id=20, embedding=_vec(2)),        # new direction
            Row(vec_id=21, embedding=_vec(2, 0.05)),  # intra-batch dup of 20
        ]
    )
    admitted, dropped = incremental_semantic_dedup(
        batch, keepers, axis_centroids, tau=0.95
    )
    assert {r.vec_id for r in admitted.collect()} == {20}
    d = {r.vec_id: (r.blocking_keeper, r.cos_sim) for r in dropped.collect()}
    assert set(d) == {10, 21}
    assert d[10][0] == 1 and d[10][1] is not None and d[10][1] >= 0.95
    # intra-batch drop cites the batch exemplar; no keeper cosine
    assert d[21] == (20, None)


def test_incremental_is_idempotent_across_readmission(spark, axis_centroids):
    """Admit a batch, append the admitted rows to the keepers, re-admit
    the SAME batch: the second pass admits nothing."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.semdedup import (
        incremental_semantic_dedup,
    )

    keepers = spark.createDataFrame(
        [Row(vec_id=1, embedding=_vec(0), centroid_id=0)]
    )
    batch = spark.createDataFrame(
        [
            Row(vec_id=20, embedding=_vec(2)),
            Row(vec_id=30, embedding=_vec(2, 0.4)),  # distinct enough
        ]
    )
    admitted, _ = incremental_semantic_dedup(
        batch, keepers, axis_centroids, tau=0.98
    )
    grown = keepers.unionByName(
        admitted.select(
            "vec_id", "embedding",
            F.col("centroid_id"),
        )
    )
    again, dropped2 = incremental_semantic_dedup(
        batch, grown, axis_centroids, tau=0.98
    )
    assert again.count() == 0
    assert dropped2.count() == batch.count()


class TestKnnJoin:
    def test_knn_matches_bruteforce_within_clusters(self, spark, sf_dir):
        """On the testdata embeddings, every returned neighbor list is
        (a) correctly ranked by cosine, (b) exactly the per-cluster
        brute-force top-k at nprobe=1 — recomputed independently in
        numpy."""
        import numpy as np

        from data_pipeline_project_using_telegram_and_aws_spark.operators.semdedup import (
            knn_join,
        )
        from data_pipeline_project_using_telegram_and_aws_spark.operators.similarity import (
            build_ivf_index,
            ivf_assign,
        )

        vecs = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .limit(300)
            .cache()
        )
        cents = build_ivf_index(vecs, k=4, iters=2, sample_n=64)
        got = knn_join(vecs, knn=3, centroids=cents).collect()

        assign = {
            r["vec_id"]: r["centroid_id"]
            for r in ivf_assign(vecs, cents, 1).collect()
        }
        emb = {r["vec_id"]: np.array(r["embedding"]) for r in vecs.collect()}

        def cos(a, b):
            return float(
                np.dot(emb[a], emb[b])
                / (np.linalg.norm(emb[a]) * np.linalg.norm(emb[b]))
            )

        by_src = {}
        for r in got:
            by_src.setdefault(r["vec_id"], []).append(r)
        for src, rows in by_src.items():
            rows.sort(key=lambda r: r["nn_rank"])
            assert len(rows) <= 3
            # ranking is by cosine desc with id tiebreak
            sims = [r["cos_sim"] for r in rows]
            assert sims == sorted(sims, reverse=True)
            # independent brute force within the cluster; compare the
            # achieved cosines (float32-vs-float64 can flip exact ids
            # on near-ties), ids only when the margin is clear
            mates = [
                v for v, c in assign.items()
                if c == assign[src] and v != src
            ]
            want = sorted(
                mates, key=lambda v: (-cos(src, v), v)
            )[:3]
            got_cos = [round(r["cos_sim"], 4) for r in rows]
            want_cos = [round(cos(src, v), 4) for v in want]
            assert got_cos == want_cos
            for r, v in zip(rows, want):
                if abs(cos(src, r["neighbor_id"]) - cos(src, v)) > 1e-4:
                    raise AssertionError((src, r["neighbor_id"], v))
        vecs.unpersist()

    def test_nprobe_widens_candidates(self, spark, sf_dir):
        """nprobe=2 can only ADD neighbors relative to nprobe=1
        (candidate superset), and the self pair never appears."""
        from data_pipeline_project_using_telegram_and_aws_spark.operators.semdedup import (
            knn_join,
        )
        from data_pipeline_project_using_telegram_and_aws_spark.operators.similarity import (
            build_ivf_index,
        )

        vecs = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .limit(200)
            .cache()
        )
        cents = build_ivf_index(vecs, k=4, iters=2, sample_n=64)
        one = knn_join(vecs, knn=5, centroids=cents, nprobe=1)
        two = knn_join(vecs, knn=5, centroids=cents, nprobe=2)
        # no self neighbors anywhere
        assert one.filter("vec_id = neighbor_id").count() == 0
        # for every source, nprobe=2's top-1 cosine >= nprobe=1's
        # (a wider candidate set can only improve the best neighbor)
        import pyspark.sql.functions as F

        best1 = one.filter("nn_rank = 1").select(
            "vec_id", F.col("cos_sim").alias("c1")
        )
        best2 = two.filter("nn_rank = 1").select(
            "vec_id", F.col("cos_sim").alias("c2")
        )
        joined = best1.join(best2, "vec_id").collect()
        assert joined
        assert all(r["c2"] >= r["c1"] - 1e-9 for r in joined)
        vecs.unpersist()
