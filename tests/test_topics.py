"""Topic-balance pins: shares sum to one, a planted dominant cluster
surfaces at the head, balanced sampling caps it exactly, determinism,
and the text → tfidf → topics composition."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.topics import (
    assign_topics,
    topic_balance_report,
    topic_balanced_sample,
)

DIMS = 6


def _clustered(spark):
    """300 vectors near axis 0 (the dominating 'topic'), 50 near axis 1,
    50 near axis 2."""
    rows = []
    for i in range(400):
        v = [0.0] * DIMS
        axis = 0 if i < 300 else (1 if i < 350 else 2)
        v[axis] = 1.0
        v[3 + i % 3] = 0.05 * (i % 7)
        rows.append(Row(vec_id=i, embedding=v))
    return spark.createDataFrame(rows)


def test_report_surfaces_dominance(spark):
    vecs = _clustered(spark)
    assigned = assign_topics(vecs, k=3, sample_n=128)
    rep = topic_balance_report(assigned).collect()
    assert abs(sum(r["share"] for r in rep) - 1.0) < 1e-6
    assert rep[0]["n_docs"] >= 250          # the dominating cell leads
    assert sum(r["n_docs"] for r in rep) == 400


def test_balanced_sample_caps_the_head(spark):
    vecs = _clustered(spark)
    sampled = topic_balanced_sample(vecs, per_topic=40, k=3, sample_n=128)
    by_topic = {
        r["topic_id"]: r["n"]
        for r in sampled.groupBy("topic_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert all(n <= 40 for n in by_topic.values())
    assert max(by_topic.values()) == 40     # the dominant cell hits the cap
    # deterministic across layouts
    a = {r["vec_id"] for r in sampled.collect()}
    b = {
        r["vec_id"]
        for r in topic_balanced_sample(
            vecs.repartition(9), per_topic=40, k=3, sample_n=128
        ).collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        topic_balanced_sample(vecs, per_topic=0, k=3)


def test_text_to_topics_composition(spark):
    """documents → hashed TF-IDF → topics: two obvious content groups
    land in different clusters."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.text_vectors import (
        hashed_tfidf_vectors,
    )

    rows = [
        (i, "spark shuffle executor join plan stage task") for i in range(20)
    ] + [
        (i + 100, "violets gulls harbor tavern lighthouse rain") for i in range(20)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    emb = hashed_tfidf_vectors(docs, dim=64).withColumnRenamed(
        "doc_id", "vec_id"
    )
    assigned = {r["vec_id"]: r["topic_id"] for r in assign_topics(
        emb, k=2, sample_n=32
    ).collect()}
    spark_topics = {assigned[i] for i in range(20)}
    prose_topics = {assigned[i + 100] for i in range(20)}
    assert len(spark_topics) == 1 and len(prose_topics) == 1
    assert spark_topics != prose_topics


def test_topic_drift_between_versions(spark):
    """Version-over-version mixture drift: freeze centroids on v1,
    report both versions against THE SAME cells — the share delta is
    the content-drift signal (frozen reference, the drift-monitor
    doctrine)."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.similarity import (
        build_ivf_index,
    )

    v1 = _clustered(spark)  # 300/50/50 across three axes
    cents = build_ivf_index(v1, k=3, iters=2, sample_n=128)
    # v2: the tail topic explodes to 300 while the head shrinks
    rows = []
    for i in range(400):
        v = [0.0] * DIMS
        axis = 2 if i < 300 else (1 if i < 350 else 0)
        v[axis] = 1.0
        rows.append(Row(vec_id=i, embedding=v))
    v2 = spark.createDataFrame(rows)

    def shares(vecs):
        rep = topic_balance_report(
            assign_topics(vecs, centroids=cents)
        ).collect()
        return {r["topic_id"]: r["share"] for r in rep}

    s1, s2 = shares(v1), shares(v2)
    # same cells, comparable shares: the dominant cell flipped
    head1 = max(s1, key=s1.get)
    head2 = max(s2, key=s2.get)
    assert head1 != head2
    assert s1[head1] >= 0.7 and s2[head2] >= 0.7
    assert s2.get(head1, 0.0) < 0.2


def test_prototypicality_prune_modes(spark):
    """Planted geometry: a tight cluster core plus one off-axis outlier
    per cluster. keep_hard retains the outlier first; keep_easy retains
    the core; per-cell quotas are exact ceilings; both modes are
    deterministic and layout-stable."""
    import pytest as _pytest
    from data_pipeline_project_using_telegram_and_aws_spark.operators.topics import (
        prototypicality_prune,
    )

    rows = []
    vid = 0
    for cluster, base in ((0, [10.0, 0.0, 0.0]), (1, [0.0, 10.0, 0.0])):
        for i in range(9):  # tight core: tiny jitter along axis
            vec = [
                base[0] + (0.01 * i if base[0] else 0.0),
                base[1] + (0.01 * i if base[1] else 0.0),
                0.001 * i,
            ]
            rows.append((vid, vec))
            vid += 1
        off = [base[0], base[1], 8.0]  # same cell, far off-axis
        rows.append((vid, off))
        vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    outliers = {9, 19}

    hard = prototypicality_prune(df, keep_frac=0.2, mode="keep_hard", k=2)
    hard_rows = hard.collect()
    assert outliers <= {r["vec_id"] for r in hard_rows}
    # ceil(0.2 * 10) = 2 per cell
    from collections import Counter

    assert Counter(r["topic_id"] for r in hard_rows) == Counter(
        {t: 2 for t in {r["topic_id"] for r in hard_rows}}
    )

    easy = prototypicality_prune(df, keep_frac=0.5, mode="keep_easy", k=2)
    assert outliers.isdisjoint({r["vec_id"] for r in easy.collect()})

    # determinism across layouts
    again = prototypicality_prune(
        df.repartition(13), keep_frac=0.2, mode="keep_hard", k=2
    )
    assert sorted(map(str, hard_rows)) == sorted(map(str, again.collect()))

    with _pytest.raises(ValueError, match="keep_frac"):
        prototypicality_prune(df, keep_frac=0.0)
    with _pytest.raises(ValueError, match="mode"):
        prototypicality_prune(df, keep_frac=0.5, mode="middle")
