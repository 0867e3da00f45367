"""Probe-backed sizing rules (functions/scale_rules.py) and their wiring
into the operators' ``None`` defaults."""

from __future__ import annotations

import math

from data_pipeline_project_using_telegram_and_aws_spark.functions.scale_rules import (
    ivf_n_centroids,
    ivf_sample_n,
    packing_n_shards,
    skew_n_salts,
)


def test_ivf_rule_is_sqrt_shaped_and_clamped():
    assert ivf_n_centroids(32_000, nprobe=2) == round(math.sqrt(64_000))
    # one corpus quadrupling doubles k (sqrt growth)
    assert ivf_n_centroids(4 * 10**6) == 2 * ivf_n_centroids(10**6)
    assert ivf_n_centroids(1) == 4                     # lo clamp
    assert ivf_n_centroids(10**18) == 1 << 18          # hi clamp
    assert ivf_sample_n(253) == 16 * 253
    assert ivf_sample_n(4) == 256                      # lo clamp


def test_packing_rule_keeps_docs_per_shard_constant():
    t = 262_144
    assert packing_n_shards(10 * t) == 10
    assert packing_n_shards(10 * t + 1) == 11          # ceil
    assert packing_n_shards(100) == 8                  # lo clamp
    # 100 TB regime: 10^10 docs -> ~38k shards, inside the clamp
    assert 30_000 < packing_n_shards(10**10) < 50_000


def test_skew_rule_matches_cost_model():
    assert skew_n_salts(8_000_000) == 8
    assert skew_n_salts(10) == 2                       # lo clamp
    assert skew_n_salts(10**12) == 1024                # hi clamp


def test_pack_sequences_derives_shards_from_rule(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(100)], ["doc_id", "text"]
    )
    # derivation is opt-in since round 5 (the default stays a fixed 64 so
    # default-arg callers keep the layout their persisted artifacts used)
    packed = pack_sequences(docs, budget=12, n_shards="auto")
    shards = {r.shard for r in packed.select("shard").distinct().collect()}
    # rule's lo clamp at this corpus size
    assert shards <= set(range(8)) and len(shards) > 1


def test_build_ivf_index_derives_k_from_rule(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.similarity import (
        build_ivf_index,
    )

    vecs = spark.range(64).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 7), d -> cast(pmod(xxhash64(id * 8 + d), 100)"
        " / 50.0 - 1.0 AS float)) AS embedding",
    )
    cents = build_ivf_index(vecs, k=None, iters=1, cache_key=None)
    # rule: round(sqrt(2 * 64)) = 11 centroids requested; a centroid that
    # loses every member can drop out, so allow <=
    n = cents.count()
    assert 1 < n <= 11


def test_collected_group_max_rows():
    from data_pipeline_project_using_telegram_and_aws_spark.functions.scale_rules import (
        collected_group_max_rows,
    )

    # 64 MB / 16 B funnel struct ≈ 4.2M events
    assert collected_group_max_rows(16) == (64 * 1024 * 1024) // 16
    # wider rows → tighter bound; floor applies
    assert collected_group_max_rows(256) < collected_group_max_rows(16)
    assert collected_group_max_rows(1 << 30) == 1024  # lo floor
