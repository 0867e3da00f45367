"""Similarity search: exactness of brute force, recall of the LSH path."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_project_using_telegram_and_aws_spark.operators import similarity as S

_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _vectors(spark, n=40, dims=16, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(dims)]))
    # vec n: a near-copy of vec 0 (tiny perturbation) → its top neighbor
    rows.append((n, [x + 0.001 for x in rows[0][1]]))
    return spark.createDataFrame(rows, _SCHEMA), {r[0]: r[1] for r in rows}


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_brute_force_matches_python_reference(spark):
    df, vecs = _vectors(spark)
    queries = df.filter(F.col("vec_id") == 0)
    got = S.brute_force_topk(df, queries, k=3).collect()
    expected = sorted(
        ((round(_cos(vecs[0], v), 4), i) for i, v in vecs.items() if i != 0),
        key=lambda t: (-t[0], t[1]),
    )[:3]
    assert [(r.vec_id, r.cos_sim) for r in got] == [
        (i, c) for c, i in expected
    ]
    assert got[0].vec_id == 40  # the planted near-copy wins


def test_lsh_bucket_determinism_and_recall(spark):
    df, _ = _vectors(spark, dims=64)
    b1 = {r.vec_id: r.bucket for r in S.hyperplane_buckets(df, spark).collect()}
    b2 = {r.vec_id: r.bucket for r in S.hyperplane_buckets(df, spark).collect()}
    assert b1 == b2                      # md5 planes → fully deterministic
    assert all(0 <= v < 256 for v in b1.values())
    # the planted near-copy of vec 0 must land in vec 0's bucket
    assert b1[40] == b1[0]
    pairs = S.lsh_neardup_pairs(df, spark, top=5).collect()
    assert (pairs[0].vec_a, pairs[0].vec_b) == (0, 40)
    assert pairs[0].cos_sim > 0.999


def test_banded_lsh_matches_python_reference_at_2x_planes(spark):
    """Non-default geometry (32 planes = 2× the ss3 setting, 4 bands):
    the banded candidate set must equal an independent Python
    recomputation from the same md5 weight rule, and the planted
    near-copy must survive banding."""
    df, vecs = _vectors(spark, dims=64)
    n_planes, rpb = 32, 8
    ws = S.plane_weights(n_planes, 64)

    def bits(v):
        return [1 if sum(e * w for e, w in zip(v, ws[p])) >= 0 else 0
                for p in range(n_planes)]

    codes = {i: bits(v) for i, v in vecs.items()}
    expected = set()
    ids = sorted(codes)
    for x in ids:
        for y in ids:
            if x < y and any(
                codes[x][b * rpb:(b + 1) * rpb] == codes[y][b * rpb:(b + 1) * rpb]
                for b in range(n_planes // rpb)
            ):
                expected.add((x, y))
    got = S.lsh_banded_neardup_pairs(
        df, n_planes=n_planes, rows_per_band=rpb, top=None
    ).collect()
    assert {(r.vec_a, r.vec_b) for r in got} == expected
    assert (0, 40) in expected  # near-copy pair survives banding


def test_lloyd_centroids_deterministic_and_sane(spark):
    df, vecs = _vectors(spark, n=40, dims=16)
    c1 = S.train_centroids_lloyd(df, k=4, iters=2).collect()
    c2 = S.train_centroids_lloyd(df, k=4, iters=2).collect()
    as_map = lambda rows: {r.centroid_id: list(r.cvec) for r in rows}
    assert as_map(c1) == as_map(c2)      # fully deterministic
    assert 1 <= len(c1) <= 4
    assert all(len(r.cvec) == 16 for r in c1)
    # every centroid is a mean of member vectors → inside the data's range
    lo = min(min(v) for v in vecs.values())
    hi = max(max(v) for v in vecs.values())
    assert all(lo <= x <= hi for r in c1 for x in r.cvec)


def test_lloyd_sample_is_md5_prefix_and_seeds_unmoved(spark):
    """sample_n trains on the md5-order prefix: a sample covering the
    whole corpus must give identical centroids to unsampled training,
    and the seeds (first k of the same ordering) never move."""
    df, _ = _vectors(spark, n=40, dims=16)  # 41 rows (planted near-copy)
    full = S.train_centroids_lloyd(df, k=4, iters=2).collect()
    allin = S.train_centroids_lloyd(df, k=4, iters=2, sample_n=41).collect()
    as_map = lambda rows: {r.centroid_id: list(r.cvec) for r in rows}
    assert as_map(full) == as_map(allin)  # sample ⊇ corpus → identical
    # a real subsample: seeds are the first k of the SAME md5 ordering,
    # so the centroid ids (seed ids) are unchanged — only means may move
    sub = S.train_centroids_lloyd(df, k=4, iters=2, sample_n=12).collect()
    seed_ids = {r.centroid_id for r in full}
    assert {r.centroid_id for r in sub} <= seed_ids
    assert len(sub) >= 1


def test_build_ivf_index_caches_per_key(spark):
    """The index-build lifecycle: same cache_key returns the SAME
    checkpointed DataFrame (no retraining); different key retrains."""
    df, _ = _vectors(spark, n=40, dims=16)
    a = S.build_ivf_index(df, k=4, iters=1, sample_n=20, cache_key="k1")
    b = S.build_ivf_index(df, k=4, iters=1, sample_n=20, cache_key="k1")
    c = S.build_ivf_index(df, k=4, iters=1, sample_n=20, cache_key="k2")
    assert a is b
    assert c is not a
    as_map = lambda rows: {r.centroid_id: list(r.cvec) for r in rows}
    assert as_map(a.collect()) == as_map(c.collect())  # same data either way


def test_ivf_bucketed_assignments_table(spark, tmp_path):
    """The 100 TB IVF layout: assignments persisted bucketed by
    centroid_id. Parity with the inline ivf_topk, and with literal probe
    ids the lists scan bucket-prunes (SelectedBucketsCount < total) and
    the executed plan has no Exchange on the corpus side."""
    df, _ = _vectors(spark, n=60, dims=16)
    cents = S.train_centroids_lloyd(df, k=4, iters=1)
    S.build_ivf_assignments_table(df, cents, "ivf_lists_t", buckets=4)
    queries = df.filter(df.vec_id < 3)

    inline = S.ivf_topk(df, n_queries=3, nprobe=2, k=5, centroids=cents)
    from_table = S.ivf_topk_from_table(
        spark, "ivf_lists_t", queries, cents, nprobe=2, k=5
    )
    key = lambda rows: {(r.query_id, r.ivf_rank): (r.vec_id, r.cos_sim) for r in rows}
    assert key(from_table.collect()) == key(inline.collect())

    # literal probe ids -> bucket pruning visible in the executed plan
    probe_rows = S.ivf_assign(queries, cents, 2, out_id="query_id").collect()
    probe_ids = sorted({r.centroid_id for r in probe_rows})
    pruned = S.ivf_topk_from_table(
        spark, "ivf_lists_t", queries, cents, nprobe=2, k=5,
        probe_ids=probe_ids,
    )
    assert key(pruned.collect()) == key(inline.collect())
    pruned.collect()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, "lists scan did not bucket-prune"
    assert int(m.group(1)) < int(m.group(2))


def test_bucket_histogram_mass_equals_corpus(spark):
    """ss4's observability view must account for every vector exactly
    once: the histogram's total mass equals the corpus size (pinned here
    because ss4 is no longer a driver correctness row)."""
    from data_pipeline_project_using_telegram_and_aws_spark.plans.similarity_queries import (
        ss4_bucket_histogram,
    )

    hist = ss4_bucket_histogram(spark, "/root/testdata/sf0.001").collect()
    total = sum(r["n_vectors"] for r in hist)
    corpus = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    )
    assert total == corpus
    assert len(hist) > 1  # vectors actually spread across buckets


def test_append_ivf_assignments_grows_index_in_place(spark):
    """Incremental index growth: append a new batch against the frozen
    centroids, then query parity with a full rebuild over the union —
    and the appended table still bucket-joins without an Exchange on
    the lists side."""
    df, _ = _vectors(spark, n=60, dims=16)
    base = df.filter(df.vec_id < 50)
    newb = df.filter(df.vec_id >= 50)
    cents = S.train_centroids_lloyd(base, k=4, iters=1)

    S.build_ivf_assignments_table(base, cents, "ivf_grow_t", buckets=4)
    S.append_ivf_assignments(newb, cents, "ivf_grow_t")

    S.build_ivf_assignments_table(df, cents, "ivf_full_t", buckets=4)
    queries = df.filter(df.vec_id < 3)
    key = lambda rows: {
        (r.query_id, r.ivf_rank): (r.vec_id, r.cos_sim) for r in rows
    }
    grown = S.ivf_topk_from_table(spark, "ivf_grow_t", queries, cents, nprobe=2, k=5)
    full = S.ivf_topk_from_table(spark, "ivf_full_t", queries, cents, nprobe=2, k=5)
    assert key(grown.collect()) == key(full.collect())

    from data_pipeline_project_using_telegram_and_aws_spark.sources.bucketing import (
        exchange_count,
    )

    grown.collect()
    plan = grown._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    # appended files per bucket: co-location holds — the grown table's
    # probe plan has exactly the shape of a fresh full build's (an
    # un-bucketed append would add an Exchange above the lists scan)
    assert exchange_count(grown) == exchange_count(full), plan


def test_ivf_residual_stats_account_for_every_vector(spark):
    df, vecs = _vectors(spark, n=60, dims=16)
    cents = S.train_centroids_lloyd(df, k=4, iters=1)
    S.build_ivf_assignments_table(df, cents, "ivf_resid_t", buckets=4)
    stats = S.ivf_residual_stats(spark, "ivf_resid_t", cents).collect()
    # _vectors(n=60) plants one extra near-copy row -> 61 vectors total
    assert sum(r.list_size for r in stats) == 61
    for r in stats:
        # cosine residual lives in [0, 2]; mean <= max by construction
        assert 0.0 <= r.mean_residual <= r.max_residual <= 2.0
    # a vector far from every centroid should push its list's max up:
    # residuals are not degenerate zeros (random vectors, real spread)
    assert max(r.max_residual for r in stats) > 0.1


def test_blocked_neardup_guard_raises_on_oversized_block(spark):
    """The O(block²) baseline must fail loudly above the cost-model
    bound (r4 verdict item 7) — in-plan, so every caller path is
    guarded, not just ss2."""
    import pytest as _pytest

    from data_pipeline_project_using_telegram_and_aws_spark.operators.similarity import (
        blocked_neardup_pairs,
    )

    vecs = spark.createDataFrame(
        [(i, "hot", [1.0, 0.0]) for i in range(6)]
        + [(100, "cold", [0.0, 1.0]), (101, "cold", [0.0, 1.0])],
        ["vec_id", "label", "embedding"],
    )
    # under the bound: all pairs come back
    ok = blocked_neardup_pairs(vecs, max_block_rows=10).collect()
    assert len(ok) == 15 + 1  # C(6,2) hot + C(2,2) cold
    # over the bound: loud failure naming the block and the dial
    with _pytest.raises(Exception, match="max_block_rows"):
        blocked_neardup_pairs(vecs, max_block_rows=5).collect()


def test_blocked_neardup_salt_invariant(spark):
    """The r13 hot-block salt (guide §2.5: deterministic xxhash salt on
    the a-side, b-side replicated, join on (block, salt)) must be a
    pure parallelism dial: every unordered in-block pair appears
    EXACTLY once with the identical cosine for salt 1 (the unsalted
    shape), the default, and a salt above the block size."""
    import random

    from data_pipeline_project_using_telegram_and_aws_spark.operators.similarity import (
        blocked_neardup_pairs,
    )

    rng = random.Random(7)
    rows = [
        (i, f"b{i % 3}", [rng.uniform(-1, 1) for _ in range(8)])
        for i in range(30)
    ]
    vecs = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])

    def canon(salt):
        return sorted(
            (r.label, r.vec_a, r.vec_b, r.cos_sim)
            for r in blocked_neardup_pairs(vecs, salt=salt).collect()
        )

    base = canon(1)
    # every pair exactly once: C(10,2) per block × 3 blocks
    assert len(base) == 3 * 45
    assert len(set(base)) == len(base)
    assert canon(4) == base
    assert canon(64) == base  # salt far above block size: still exact


# ---------------------------------------------------------------------------
# two-level (coarse-quantized) assignment — the r13 scale path


def test_hierarchical_assign_exact_when_all_cells_probed(spark):
    """Contract: probes >= coarse_k probes every cell, so the
    two-level result must equal flat ivf_assign EXACTLY."""
    df, _ = _vectors(spark, n=60, dims=16)
    cents = S.train_centroids_lloyd(df, k=16, iters=2)
    flat = {(r.vec_id, r.centroid_id) for r in S.ivf_assign(
        df, cents, 1
    ).collect()}
    got = {(r.vec_id, r.centroid_id) for r in S.hierarchical_ivf_assign(
        df, cents, probes=4, coarse_k=4
    ).collect()}
    assert got == flat and len(got) == 61


def test_hierarchical_assign_small_k_falls_back_to_flat(spark):
    """k < 4*probes: two levels cannot pay — the flat path runs and
    the results are definitionally exact."""
    df, _ = _vectors(spark, n=30, dims=16)
    cents = S.train_centroids_lloyd(df, k=8, iters=2)
    flat = {(r.vec_id, r.centroid_id) for r in S.ivf_assign(
        df, cents, 1
    ).collect()}
    got = {(r.vec_id, r.centroid_id) for r in S.hierarchical_ivf_assign(
        df, cents, probes=4
    ).collect()}
    assert got == flat


def test_hierarchical_assign_probed_recall_and_determinism(spark):
    """Under real pruning (probes < coarse_k): one row per vector,
    deterministic across runs, and the probed assignment agrees with
    flat for the large majority of vectors (boundary perturbation
    only); every disagreement is still a valid centroid id."""
    df, _ = _vectors(spark, n=200, dims=16, seed=11)
    cents = S.train_centroids_lloyd(df, k=25, iters=2)
    flat = {r.vec_id: r.centroid_id
            for r in S.ivf_assign(df, cents, 1).collect()}
    a1 = {r.vec_id: r.centroid_id for r in S.hierarchical_ivf_assign(
        df, cents, probes=2, coarse_k=5
    ).collect()}
    a2 = {r.vec_id: r.centroid_id for r in S.hierarchical_ivf_assign(
        df, cents, probes=2, coarse_k=5
    ).collect()}
    assert a1 == a2                         # deterministic end to end
    assert set(a1) == set(flat)             # one row per vector
    valid = {r.centroid_id for r in cents.collect()}
    assert set(a1.values()) <= valid
    agree = sum(1 for v in a1 if a1[v] == flat[v])
    assert agree >= 0.7 * len(flat), f"{agree}/{len(flat)}"


def test_semantic_dedup_coarse_probes_dial(spark):
    """semantic_dedup(coarse_probes=) runs the two-level path and
    keeps the output invariants: one row per vector, every dup_group
    names its own minimum member, kept marks exactly the exemplar."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.semdedup import (
        semantic_dedup,
    )

    df, _ = _vectors(spark, n=120, dims=16, seed=3)
    out = semantic_dedup(
        df, k=16, iters=2, tau=0.9, coarse_probes=2
    ).collect()
    assert len(out) == 121
    groups = {}
    for r in out:
        groups.setdefault(r.dup_group, []).append((r.vec_id, r.kept))
    for g, members in groups.items():
        ids = sorted(i for i, _ in members)
        assert g == ids[0]
        assert [k for i, k in members if i == g] == [True]
        assert all(not k for i, k in members if i != g)
    # the planted near-copy (vec 120 ~ vec 0) must collapse with vec 0
    by_id = {r.vec_id: r.dup_group for r in out}
    assert by_id[120] == by_id[0] == 0


def test_hierarchical_training_deterministic_schema_and_fallback(spark):
    df, _ = _vectors(spark, n=120, dims=16, seed=5)
    c1 = {r.centroid_id: r.cvec for r in S.train_centroids_hierarchical(
        df, k=16, iters=2, coarse_k=4
    ).collect()}
    c2 = {r.centroid_id: r.cvec for r in S.train_centroids_hierarchical(
        df, k=16, iters=2, coarse_k=4
    ).collect()}
    assert c1 == c2                           # deterministic end to end
    assert 0 < len(c1) <= 16
    assert all(len(v) == 16 for v in c1.values())
    assert set(c1) <= set(range(121))         # ids are sample members
    # coarse_k >= k: degenerates to the flat trainer exactly
    flat = {r.centroid_id: r.cvec for r in S.train_centroids_lloyd(
        df, k=8, iters=2
    ).collect()}
    degen = {r.centroid_id: r.cvec for r in S.train_centroids_hierarchical(
        df, k=8, iters=2, coarse_k=8
    ).collect()}
    assert degen == flat


def test_hierarchical_training_quantization_near_flat(spark):
    """Two-level training's boundary trade must not wreck the
    quantization: mean best-cosine to the hierarchical centroids
    stays within 0.05 of the flat trainer's on random data."""
    df, _ = _vectors(spark, n=200, dims=16, seed=13)

    def mean_best(cents):
        a = S.ivf_assign(df, cents, 1, keep_score=True)
        return a.agg(F.avg("cos")).collect()[0][0]

    flat = mean_best(S.train_centroids_lloyd(df, k=16, iters=2))
    hier = mean_best(S.train_centroids_hierarchical(
        df, k=16, iters=2, coarse_k=4
    ))
    assert hier >= flat - 0.05, (hier, flat)


def test_semantic_dedup_full_two_level_composition(spark):
    """The complete r13 scale path: hierarchical TRAINING +
    hierarchical ASSIGNMENT under semantic_dedup — invariants hold
    and the planted near-copy still collapses with its original."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.semdedup import (
        semantic_dedup,
    )

    df, _ = _vectors(spark, n=150, dims=16, seed=21)
    cents = S.train_centroids_hierarchical(df, k=25, iters=2, coarse_k=5)
    out = semantic_dedup(
        df, centroids=cents, tau=0.9, coarse_probes=3
    ).collect()
    assert len(out) == 151
    by_id = {r.vec_id: r for r in out}
    assert by_id[150].dup_group == by_id[0].dup_group == 0
    assert by_id[0].kept and not by_id[150].kept


def test_semantic_dedup_scale_dispatch(spark, monkeypatch):
    """r14 (VERDICT r13 item 5): coarse_probes=None is SCALE-DISPATCHED —
    flat below scale_rules.ivf_two_level_min_k centroids, two-level at or
    above it. Pins: (a) at the registered sd1-class geometry (k=16 <<
    min_k) the auto path is byte-identical to forced-flat
    (coarse_probes=0); (b) with the threshold lowered under k, the auto
    path routes two-level (observed via hierarchical_ivf_assign being
    invoked) and — because ivf_coarse_probes() >= coarse_k at this k —
    stays EXACT, so rows still match flat."""
    from data_pipeline_project_using_telegram_and_aws_spark.functions import (
        scale_rules,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators import (
        semdedup as SD,
    )

    df, _ = _vectors(spark, n=120, dims=16, seed=3)

    def rows(**kw):
        return sorted(
            map(tuple, SD.semantic_dedup(df, k=16, iters=2, tau=0.9, **kw)
                .collect())
        )

    flat = rows(coarse_probes=0)
    assert rows(coarse_probes=None) == flat  # k=16 < min_k -> flat

    calls = []
    real_hier = SD.hierarchical_ivf_assign

    def spy(*a, **kw):
        calls.append(kw.get("probes"))
        return real_hier(*a, **kw)

    monkeypatch.setattr(SD, "hierarchical_ivf_assign", spy)
    monkeypatch.setattr(scale_rules, "ivf_two_level_min_k", lambda probes=None: 4)
    auto = rows(coarse_probes=None)
    assert calls and calls[0] == scale_rules.ivf_coarse_probes()
    # probes (4) >= coarse_k (isqrt(16)=4): the exactness contract holds,
    # so the dispatched two-level result equals flat
    assert auto == flat


def test_build_ivf_index_two_level(spark):
    """r14: build_ivf_index(two_level=True) sizes k by the n^(2/3) rule
    (when k=None), trains hierarchically, and stamps the control-plane
    k; the output schema matches the flat builder's."""
    from data_pipeline_project_using_telegram_and_aws_spark.functions.scale_rules import (
        ivf_n_centroids_two_level,
    )

    df, _ = _vectors(spark, n=120, dims=16, seed=5)
    cents = S.build_ivf_index(
        df, k=None, iters=1, sample_n=64, two_level=True
    )
    want_k = ivf_n_centroids_two_level(121)
    assert cents._spark_graft_k == want_k
    rows = cents.collect()
    assert 0 < len(rows) <= want_k
    assert set(cents.columns) == {"centroid_id", "cvec"}
    assert all(len(r.cvec) == 16 for r in rows)
    # cache keys distinguish two_level builds
    a = S.build_ivf_index(df, k=8, iters=1, sample_n=64,
                          cache_key="tl-test")
    b = S.build_ivf_index(df, k=8, iters=1, sample_n=64,
                          cache_key="tl-test", two_level=True)
    assert a is not b
