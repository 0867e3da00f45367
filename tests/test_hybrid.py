"""Hybrid retrieval (operators/hybrid.py): RRF and normalized-score
fusion against hand computations and a Python reference model, the
single-exchange fusion plan pin, and MMR rerank against an independent
pure-Python greedy oracle."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st

from data_pipeline_project_using_telegram_and_aws_spark.operators.hybrid import (
    RRF_K,
    mmr_rerank,
    normalized_score_fuse,
    rrf_fuse,
)


def _ranked(spark, rows):
    return spark.createDataFrame(rows, ["query_id", "doc_id", "rank"])


def _lists(spark):
    # lexical list: docs 1,2,3; semantic list: docs 2,3,4
    lex = _ranked(spark, [(10, 1, 1), (10, 2, 2), (10, 3, 3)])
    sem = _ranked(spark, [(10, 2, 1), (10, 3, 2), (10, 4, 3)])
    return lex, sem


def test_rrf_matches_hand_computation(spark):
    lex, sem = _lists(spark)
    got = {
        r.doc_id: (r.rrf, r.n_lists, r.rank)
        for r in rrf_fuse([lex, sem], top=None).collect()
    }
    k = RRF_K
    want = {
        1: 1 / (k + 1),
        2: 1 / (k + 2) + 1 / (k + 1),
        3: 1 / (k + 3) + 1 / (k + 2),
        4: 1 / (k + 3),
    }
    for d, w in want.items():
        assert got[d][0] == pytest.approx(round(w, 6), abs=1e-9)
    assert got[2][1] == 2 and got[1][1] == 1
    # doc 2 appears top-2 in both lists -> fused winner
    assert [d for d, v in sorted(got.items(), key=lambda kv: kv[1][2])] == [
        2, 3, 1, 4,
    ]


def test_rrf_top_and_weights(spark):
    lex, sem = _lists(spark)
    # weight the lexical list to zero: fused order becomes the semantic
    # list's order, and docs only in lex survive with score 0
    rows = rrf_fuse([lex, sem], top=2, weights=[0.0, 1.0]).collect()
    assert [(r.doc_id, r.rank) for r in rows] == [(2, 1), (3, 2)]
    with pytest.raises(ValueError, match="weights"):
        rrf_fuse([lex, sem], weights=[1.0])
    with pytest.raises(ValueError, match="no input"):
        rrf_fuse([])


def test_rrf_single_exchange_plan(spark):
    lex, sem = _lists(spark)
    plan = (
        rrf_fuse([lex, sem], top=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "Python" not in plan
    # union -> repartition(query) -> (query, doc) agg -> rank window:
    # the explicit repartition clusters on a subset of the agg keys and
    # on the window key, so fusion rides exactly one hash exchange (the
    # second Exchange is the presentation orderBy's rangepartitioning)
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange") == 2


@settings(max_examples=30, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 2),  # query
            st.integers(0, 1),  # list index
            st.lists(
                st.integers(0, 9), min_size=1, max_size=6, unique=True
            ),  # docs in rank order
        ),
        min_size=1,
        max_size=6,
    )
)
def test_rrf_python_model(spark, data):
    """Random rank lists vs an independent dict-model of RRF."""
    rows = {0: [], 1: []}
    model: dict[tuple[int, int], list[float]] = {}
    seen: set[tuple[int, int]] = set()
    for q, li, docs in data:
        for r, d in enumerate(docs, start=1):
            if (q, li, d) in seen:  # one rank per (query, list, doc)
                continue
            seen.add((q, li, d))
            rows[li].append((q, d, r))
            model.setdefault((q, d), []).append(1 / (RRF_K + r))
    # empty frames can't ride createDataFrame without a schema — give
    # an empty list a placeholder row and model it like any other
    n_placeholders = sum(1 for li in (0, 1) if not rows[li])
    if n_placeholders:
        model[(99, 99)] = [1 / (RRF_K + 1)] * n_placeholders
    lists = [
        _ranked(spark, rows[li] or [(99, 99, 1)]) for li in (0, 1)
    ]
    got = {
        (r.query_id, r.doc_id): (r.rrf, r.n_lists)
        for r in rrf_fuse(lists, top=None).collect()
    }
    want = {
        qd: (round(sum(c), 6), len(c)) for qd, c in model.items()
    }
    assert set(got) == set(want)
    for qd in want:
        assert got[qd][0] == pytest.approx(want[qd][0], abs=1e-9)
        assert got[qd][1] == want[qd][1]


def _scored(spark, rows):
    return spark.createDataFrame(rows, ["query_id", "doc_id", "score"])


def test_normalized_score_fuse_hand(spark):
    # lexical BM25-ish scores vs cosine scores on different scales
    lex = _scored(spark, [(10, 1, 8.0), (10, 2, 4.0), (10, 3, 0.0)])
    sem = _scored(spark, [(10, 2, 0.9), (10, 3, 0.5)])
    got = {
        r.doc_id: r.fused_score
        for r in normalized_score_fuse([lex, sem], top=None).collect()
    }
    # lex min-max: 1 -> 1.0, 2 -> 0.5, 3 -> 0.0
    # sem min-max: 2 -> 1.0, 3 -> 0.0
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(1.5)
    assert got[3] == pytest.approx(0.0)


def test_normalized_score_fuse_degenerate_slice_credits_presence(spark):
    # all-equal scores in a slice normalize to 1.0 (presence), not 0/0
    lex = _scored(spark, [(10, 1, 3.0), (10, 2, 3.0)])
    sem = _scored(spark, [(10, 2, 0.7)])
    got = {
        r.doc_id: (r.fused_score, r.rank)
        for r in normalized_score_fuse([lex, sem], top=None).collect()
    }
    assert got[1][0] == pytest.approx(1.0)
    assert got[2][0] == pytest.approx(2.0)
    assert got[2][1] == 1 and got[1][1] == 2


def test_normalized_score_fuse_score_cols_and_weights(spark):
    lex = spark.createDataFrame(
        [(10, 1, 2.0), (10, 2, 1.0)], ["query_id", "doc_id", "bm25"]
    )
    sem = spark.createDataFrame(
        [(10, 1, 0.1), (10, 2, 0.9)], ["query_id", "doc_id", "cos_sim"]
    )
    rows = normalized_score_fuse(
        [lex, sem],
        score_cols=["bm25", "cos_sim"],
        weights=[0.25, 1.0],
        top=1,
    ).collect()
    # doc 1: 0.25*1 + 1*0 = 0.25; doc 2: 0.25*0 + 1*1 = 1.0
    assert [(r.doc_id, r.fused_score) for r in rows] == [(2, 1.0)]
    with pytest.raises(ValueError, match="score_cols"):
        normalized_score_fuse([lex, sem], score_cols=["bm25"])


# ---------------------------------------------------------------- MMR


def _mmr_python(rows, select_k, lam):
    """Independent greedy MMR: rows = [(doc_id, score, vec)]."""
    rows = sorted(rows, key=lambda r: (-r[1], r[0]))
    def unit(v):
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]
    units = [unit(r[2]) for r in rows]
    scores = [r[1] for r in rows]
    lo, hi = min(scores), max(scores)
    rel = [1.0 if hi == lo else (s - lo) / (hi - lo) for s in scores]
    picked, out = [], []
    for _ in range(min(select_k, len(rows))):
        best, best_obj = None, None
        for i in range(len(rows)):
            if i in picked:
                continue
            if picked:
                ms = max(
                    sum(a * b for a, b in zip(units[i], units[j]))
                    for j in picked
                )
                obj = lam * rel[i] - (1 - lam) * ms
            else:
                obj = lam * rel[i]
            if best_obj is None or round(obj, 9) > round(best_obj, 9):
                best, best_obj = i, obj
        picked.append(best)
        out.append((rows[best][0], round(best_obj, 6)))
    return out


def _cands(spark, rows):
    return spark.createDataFrame(
        rows, ["query_id", "doc_id", "score", "embedding"]
    )


def test_mmr_prefers_diversity_over_redundancy(spark):
    # docs 1 and 2 are near-identical vectors with the top scores;
    # doc 3 is orthogonal with a lower score — MMR at λ=0.5 must pick
    # {1, 3}, where pure relevance would pick {1, 2}
    rows = [
        (10, 1, 1.00, [1.0, 0.0]),
        (10, 2, 0.99, [1.0, 0.01]),
        (10, 3, 0.50, [0.0, 1.0]),
    ]
    got = [
        (r.doc_id, r.rank)
        for r in mmr_rerank(_cands(spark, rows), select_k=2).collect()
    ]
    assert got == [(1, 1), (3, 2)]


def test_mmr_matches_python_reference(spark):
    rows = [
        (10, 1, 0.9, [1.0, 0.0, 0.0]),
        (10, 2, 0.8, [0.9, 0.1, 0.0]),
        (10, 3, 0.7, [0.0, 1.0, 0.0]),
        (10, 4, 0.6, [0.0, 0.9, 0.1]),
        (10, 5, 0.5, [0.0, 0.0, 1.0]),
        (20, 7, 0.4, [1.0, 1.0, 0.0]),
        (20, 8, 0.4, [1.0, 1.0, 0.0]),
    ]
    for lam in (0.3, 0.5, 0.8):
        got = {
            q: []
            for q in (10, 20)
        }
        for r in mmr_rerank(
            _cands(spark, rows), select_k=3, lambda_=lam
        ).collect():
            got[r.query_id].append((r.doc_id, r.mmr))
        for q in (10, 20):
            want = _mmr_python(
                [(d, s, v) for (qq, d, s, v) in rows if qq == q], 3, lam
            )
            assert [d for d, _ in got[q]] == [d for d, _ in want], lam
            for (gd, gm), (wd, wm) in zip(got[q], want):
                assert gm == pytest.approx(wm, abs=1e-6)


@settings(max_examples=15, deadline=None)
@given(
    vecs=st.lists(
        st.tuples(
            st.floats(0, 1).map(lambda x: round(x, 3)),
            st.lists(
                st.floats(-1, 1).map(lambda x: round(x, 3)),
                min_size=3,
                max_size=3,
            ),
        ),
        min_size=1,
        max_size=8,
    ),
    lam=st.sampled_from([0.0, 0.4, 1.0]),
)
def test_mmr_python_model_fuzz(spark, vecs, lam):
    rows = [(1, i, s, v) for i, (s, v) in enumerate(vecs)]
    got = [
        (r.doc_id, r.mmr)
        for r in mmr_rerank(
            _cands(spark, rows), select_k=4, lambda_=lam
        ).collect()
    ]
    want = _mmr_python([(i, s, v) for (_, i, s, v) in rows], 4, lam)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gm), (wd, wm) in zip(got, want):
        assert gm == pytest.approx(wm, abs=1e-6)


def test_mmr_guard_names_the_query(spark):
    rows = [(10, i, 1.0 - i * 0.1, [1.0, 0.0]) for i in range(5)]
    with pytest.raises(Exception, match="mmr_rerank: query 10 has 5"):
        mmr_rerank(
            _cands(spark, rows), select_k=2, max_candidates_per_query=4
        ).collect()


def test_mmr_lambda_validated(spark):
    with pytest.raises(ValueError, match="lambda_"):
        mmr_rerank(_cands(spark, [(1, 1, 1.0, [1.0])]), 1, lambda_=1.5)


def test_end_to_end_bm25_plus_ann_fusion(spark):
    """The composition the module exists for: BM25 ranks + cosine ranks
    fused by RRF — a doc strong in BOTH lists beats each list's own #1."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.retrieval import (
        bm25_scores,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.similarity import (
        brute_force_topk,
    )
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle tuning guide"),
            (2, "spark join strategies"),
            (3, "cooking pasta at home"),
        ],
        ["doc_id", "text"],
    )
    emb = spark.createDataFrame(
        [
            (1, [0.9, 0.1]),
            (2, [0.7, 0.3]),
            (3, [0.0, 1.0]),
            (100, [1.0, 0.0]),  # the query vector rides the corpus frame
        ],
        ["vec_id", "embedding"],
    )
    queries = spark.createDataFrame(
        [(100, "spark join")], ["query_id", "query_text"]
    )
    lex = bm25_scores(docs, queries, top=3)
    sem = brute_force_topk(
        emb.filter("vec_id != 100"),
        emb.filter("vec_id = 100"),
        k=3,
        id_col="vec_id",
    ).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.col("neighbor_rank").alias("rank"),
    )
    fused = rrf_fuse([lex, sem], top=2).collect()
    assert [r.doc_id for r in fused] == [1, 2]  # both-list docs win
    assert all(r.n_lists == 2 for r in fused)


def test_mmr_null_embedding_and_score_are_abstentions(spark):
    rows = spark.createDataFrame(
        [
            (10, 1, 1.0, [1.0, 0.0]),
            (10, 2, None, [0.0, 1.0]),   # NULL score: dropped
            (10, 3, 0.5, None),          # NULL embedding: dropped
            (10, 4, 0.4, [0.0, 1.0]),
        ],
        "query_id long, doc_id long, score double, embedding array<double>",
    )
    got = [r.doc_id for r in mmr_rerank(rows, select_k=3).collect()]
    assert got == [1, 4]  # only the fully-specified candidates compete


def test_mmr_zero_vector_participates(spark):
    rows = spark.createDataFrame(
        [
            (10, 1, 1.0, [1.0, 0.0]),
            (10, 2, 0.9, [0.0, 0.0]),  # zero vector: similarity 0
        ],
        "query_id long, doc_id long, score double, embedding array<double>",
    )
    got = [r.doc_id for r in mmr_rerank(rows, select_k=2).collect()]
    assert got == [1, 2]


def test_mmr_plan_guard_shares_the_group_exchange(spark):
    rows = [(10, i, 1.0 - i * 0.1, [1.0, 0.0]) for i in range(4)]
    plan = (
        mmr_rerank(_cands(spark, rows), select_k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("+- Window") == 1  # the bounded-operand guard
    # guard window + groupBy-applyInPandas cluster on the same key:
    # ONE hash exchange; the second Exchange is the presentation sort
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange") == 2


@settings(max_examples=20, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 1),  # query
            st.integers(0, 1),  # list index
            st.integers(0, 5),  # doc
            st.floats(-2, 2).map(lambda x: round(x, 3)),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: (t[0], t[1], t[2]),
    )
)
def test_normalized_score_fuse_python_model(spark, data):
    """Random scored lists vs an independent min-max + CombSUM model."""
    rows = {0: [], 1: []}
    for q, li, d, s in data:
        rows[li].append((q, d, s))
    # placeholder rows keep empty frames constructible; model them too
    for li in (0, 1):
        if not rows[li]:
            rows[li].append((9, 9, 1.0))
    lists = [_scored(spark, rows[li]) for li in (0, 1)]
    got = {
        (r.query_id, r.doc_id): (r.fused_score, r.n_lists)
        for r in normalized_score_fuse(lists, top=None).collect()
    }
    model: dict[tuple[int, int], list[float]] = {}
    for li in (0, 1):
        by_q: dict[int, list] = {}
        for q, d, s in rows[li]:
            by_q.setdefault(q, []).append((d, s))
        for q, pairs in by_q.items():
            scores = [s for _, s in pairs]
            lo, hi = min(scores), max(scores)
            for d, s in pairs:
                norm = 1.0 if hi == lo else (s - lo) / (hi - lo)
                model.setdefault((q, d), []).append(norm)
    want = {qd: (round(sum(v), 6), len(v)) for qd, v in model.items()}
    assert set(got) == set(want)
    for qd in want:
        assert got[qd][0] == pytest.approx(want[qd][0], abs=1e-6), qd
        assert got[qd][1] == want[qd][1]


def test_hybrid_search_from_tables_matches_hand_wiring(spark):
    """The one-call serving composition equals hand-wiring the two
    persisted heads into rrf_fuse."""
    import pyspark.sql.functions as F

    from data_pipeline_project_using_telegram_and_aws_spark.operators.hybrid import (
        hybrid_search_from_tables,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.retrieval import (
        bm25_scores,
        corpus_term_stats,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.similarity import (
        ivf_topk_from_table,
        train_centroids_lloyd,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.similarity import (
        build_ivf_assignments_table,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle tuning guide", [0.9, 0.1]),
            (2, "spark join strategies", [0.7, 0.3]),
            (3, "cooking pasta at home", [0.0, 1.0]),
            (4, "spark shuffle deep dive", [0.8, 0.2]),
        ],
        ["doc_id", "text", "embedding"],
    )
    stats = corpus_term_stats(docs)
    emb = docs.select(F.col("doc_id").alias("vec_id"), "embedding")
    cents = train_centroids_lloyd(emb, k=2, iters=3)
    table = "hybrid_serving_test_idx"
    build_ivf_assignments_table(emb, cents, table, buckets=2)
    try:
        queries = spark.createDataFrame(
            [(100, "spark shuffle", [1.0, 0.0])],
            ["query_id", "query_text", "embedding"],
        )
        got = hybrid_search_from_tables(
            spark, queries, stats, table, cents, top=3
        ).collect()
        lex = bm25_scores(
            None,
            queries.select("query_id", "query_text"),
            top=3,
            stats=stats,
        )
        sem = ivf_topk_from_table(
            spark,
            table,
            queries.select(F.col("query_id").alias("vec_id"), "embedding"),
            cents,
            nprobe=2,
            k=3,
        ).select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.col("ivf_rank").alias("rank"),
        )
        want = rrf_fuse([lex, sem], top=3).collect()
        assert [(r.doc_id, r.rrf, r.rank) for r in got] == [
            (r.doc_id, r.rrf, r.rank) for r in want
        ]
        assert len(got) == 3
        # the both-list docs (spark+shuffle lexically, near [1,0]
        # geometrically) outrank the single-list one
        assert got[0].n_lists == 2
    finally:
        spark.sql(f"drop table if exists {table}")


def test_full_retrieval_story_serving_to_mmr(spark):
    """Persisted hybrid search → attach embeddings → MMR diversity
    rerank of the fused head: the module's whole pipeline in one pinned
    composition. Two near-identical spark-shuffle docs win the fusion;
    MMR keeps one of them and promotes the diverse join doc."""
    import pyspark.sql.functions as F

    from data_pipeline_project_using_telegram_and_aws_spark.operators.hybrid import (
        hybrid_search_from_tables,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.retrieval import (
        corpus_term_stats,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.similarity import (
        build_ivf_assignments_table,
        train_centroids_lloyd,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle tuning guide", [0.9, 0.1]),
            (4, "spark shuffle deep dive", [0.89, 0.11]),
            (2, "spark join strategies", [0.1, 0.9]),
            (3, "cooking pasta at home", [0.0, 1.0]),
        ],
        ["doc_id", "text", "embedding"],
    )
    emb = docs.select(F.col("doc_id").alias("vec_id"), "embedding")
    cents = train_centroids_lloyd(emb, k=2, iters=3)
    table = "hybrid_story_test_idx"
    build_ivf_assignments_table(emb, cents, table, buckets=2)
    try:
        queries = spark.createDataFrame(
            [(100, "spark shuffle", [0.8, 0.2])],
            ["query_id", "query_text", "embedding"],
        )
        fused = hybrid_search_from_tables(
            spark, queries, corpus_term_stats(docs), table, cents,
            top=3, nprobe=2,
        )
        fused_order = [r.doc_id for r in fused.collect()]
        assert set(fused_order) >= {1, 4}  # both twins reach the head
        cands = fused.join(
            docs.select("doc_id", "embedding"), "doc_id"
        ).select("query_id", "doc_id", F.col("rrf").alias("score"),
                 "embedding")
        picked = [
            r.doc_id
            for r in mmr_rerank(cands, select_k=2, lambda_=0.3).collect()
        ]
        assert len(picked) == 2
        # first pick = the fusion winner (pure-relevance argmax) ...
        assert picked[0] == fused_order[0]
        # ... and MMR never keeps BOTH near-twin shuffle docs
        assert not {1, 4} <= set(picked)
    finally:
        spark.sql(f"drop table if exists {table}")


def test_serving_eval_recipe_recall_floor(spark):
    """The full persisted-serving evaluation loop in one composition:
    build BOTH serving layouts (BM25 term stats + bucketed IVF index)
    over a 32-doc topical corpus, serve a 4-query set through
    hybrid_search_from_tables, score against planted qrels with
    retrieval_metrics, and pin a recall floor. This is the loop a
    retrieval deployment actually runs; until now it existed only
    piecewise."""
    import pyspark.sql.functions as F

    from data_pipeline_project_using_telegram_and_aws_spark.operators.hybrid import (
        hybrid_search_from_tables,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.retrieval import (
        corpus_term_stats,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.retrieval_metrics import (
        retrieval_metrics,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.similarity import (
        build_ivf_assignments_table,
        train_centroids_lloyd,
    )

    topics = [
        ("spark shuffle partition tuning", [1.0, 0.0, 0.0, 0.0]),
        ("cooking pasta sauce recipe", [0.0, 1.0, 0.0, 0.0]),
        ("guitar chord practice lesson", [0.0, 0.0, 1.0, 0.0]),
        ("marathon training schedule plan", [0.0, 0.0, 0.0, 1.0]),
    ]
    fillers = ["alpha", "bravo", "charlie", "delta",
               "echo", "foxtrot", "golf", "hotel"]
    doc_rows = []
    for t, (words, axis) in enumerate(topics):
        for i in range(8):
            vec = [
                v * (0.9 + 0.01 * i) + (0.02 * ((t + i) % 3))
                for v in axis
            ]
            doc_rows.append(
                (
                    t * 100 + i,
                    f"{words} {fillers[i]} notes",
                    vec,
                )
            )
    docs = spark.createDataFrame(
        doc_rows, ["doc_id", "text", "embedding"]
    )
    stats = corpus_term_stats(docs)
    emb = docs.select(F.col("doc_id").alias("vec_id"), "embedding")
    cents = train_centroids_lloyd(emb, k=4, iters=5)
    table = "serving_eval_recipe_idx"
    build_ivf_assignments_table(emb, cents, table, buckets=4)
    try:
        queries = spark.createDataFrame(
            [
                (1000 + t, words, axis)
                for t, (words, axis) in enumerate(topics)
            ],
            ["query_id", "query_text", "embedding"],
        )
        results = hybrid_search_from_tables(
            spark, queries, stats, table, cents, top=10, nprobe=2
        )
        qrels = spark.createDataFrame(
            [
                (1000 + t, t * 100 + i)
                for t in range(len(topics))
                for i in range(8)
            ],
            ["query_id", "doc_id"],
        )
        m = {
            r["query_id"]: r
            for r in retrieval_metrics(results, qrels, k=10).collect()
        }
        # every query is scored, none silently absent
        assert set(m) == {1000, 1001, 1002, 1003}
        # the pinned floor: each topic recovers >= 6 of its 8 docs in
        # the fused top-10, and the top hit is always on-topic
        for qid, r in m.items():
            assert r["recall"] >= 0.75, (qid, r)
            assert r["hit"] == 1.0, (qid, r)
            assert r["mrr"] == 1.0, (qid, r)  # rank-1 doc is relevant
        mean_recall = sum(r["recall"] for r in m.values()) / len(m)
        assert mean_recall >= 0.85
    finally:
        spark.sql(f"drop table if exists {table}")
