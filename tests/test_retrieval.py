"""BM25 retrieval (operators/retrieval.py): hand-computed scores, ranking
behavior, the stats index, and the broadcast plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.retrieval import (
    B,
    K1,
    bm25_scores,
    corpus_term_stats,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark query engine"),
            (2, "spark spark shuffle"),
            (3, "unrelated words entirely"),
        ],
        ["doc_id", "text"],
    )


def _queries(spark):
    return spark.createDataFrame(
        [(10, "spark engine")], ["query_id", "query_text"]
    )


def _bm25(tf, dl, df, n_docs, avgdl):
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))


def test_bm25_matches_hand_computation(spark):
    got = {
        r.doc_id: r.bm25
        for r in bm25_scores(_corpus(spark), _queries(spark), top=None).collect()
    }
    # corpus: N=3, avgdl=3; df(spark)=2, df(engine)=1
    want1 = _bm25(1, 3, 2, 3, 3.0) + _bm25(1, 3, 1, 3, 3.0)
    want2 = _bm25(2, 3, 2, 3, 3.0)
    assert got[1] == pytest.approx(round(want1, 4))
    assert got[2] == pytest.approx(round(want2, 4))
    assert 3 not in got  # no shared term, no row


def test_bm25_ranks_term_coverage_over_repetition(spark):
    # doc 1 matches both query terms; doc 2 repeats one term — tf
    # saturation (k1) must rank coverage first
    rows = bm25_scores(_corpus(spark), _queries(spark), top=2).collect()
    assert [(r.doc_id, r.rank) for r in rows] == [(1, 1), (2, 2)]


def test_corpus_term_stats_index(spark):
    stats = {
        (r.doc_id, r.term): r for r in corpus_term_stats(_corpus(spark)).collect()
    }
    r = stats[(2, "spark")]
    assert r.tf == 2 and r.dl == 3 and r.df == 2
    assert r.n_docs == 3 and r.avgdl == pytest.approx(3.0)
    assert len({k[0] for k in stats}) == 3


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_inline_scoring_plan_has_no_corpus_sized_join(spark):
    """The r4 verdict's scale defect: the inline path used to broadcast
    the FULL-vocabulary df table and equi-join corpus-sized dl. Pinned
    fixed: with auto-broadcast disabled, every join in the scoring plan
    is an explicit broadcast of query-derived (bounded) or one-row
    relations — a SortMergeJoin appearing here means something
    corpus/vocabulary-sized is being joined again."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(bm25_scores(_corpus(spark), _queries(spark)))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # qset restriction + qterms scoring join + the one-row constants
    # cross join — anything beyond these three is a new unbounded
    # broadcast sneaking in (the vocabulary-df regression)
    assert plan.count("BroadcastExchange") == 3


def test_stats_serving_path_is_one_broadcast_join(spark, tmp_path):
    """Persisted-index serving shape: scan + ONE broadcast join (the
    query terms) + bounded aggregation; nothing else joins at all."""
    corpus_term_stats(_corpus(spark)).write.parquet(str(tmp_path / "stats"))
    stats = spark.read.parquet(str(tmp_path / "stats"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(bm25_scores(None, _queries(spark), stats=stats))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 1
    assert plan.count("BroadcastExchange") == 1


def test_stats_path_matches_inline_scores(spark):
    corpus, queries = _corpus(spark), _queries(spark)
    inline = {
        (r.query_id, r.doc_id): r.bm25
        for r in bm25_scores(corpus, queries, top=None).collect()
    }
    served = {
        (r.query_id, r.doc_id): r.bm25
        for r in bm25_scores(
            None, queries, top=None, stats=corpus_term_stats(corpus)
        ).collect()
    }
    assert inline == served and len(inline) > 0


def test_query_terms_deduplicated(spark):
    # "spark spark" as a query must score like "spark" (bag-of-words set)
    q1 = spark.createDataFrame([(10, "spark")], ["query_id", "query_text"])
    q2 = spark.createDataFrame([(10, "spark spark")], ["query_id", "query_text"])
    corpus = _corpus(spark)
    a = {r.doc_id: r.bm25 for r in bm25_scores(corpus, q1, top=None).collect()}
    b = {r.doc_id: r.bm25 for r in bm25_scores(corpus, q2, top=None).collect()}
    assert a == b


def test_rowlocal_and_explode_paths_agree(spark, monkeypatch):
    """The small-query row-local tf path and the explode+join path are
    the same operator: forcing the dispatch both ways on one fixture
    must give identical (doc, score) sets."""
    from data_pipeline_project_using_telegram_and_aws_spark.functions import scale_rules

    fast = bm25_scores(_corpus(spark), _queries(spark), top=None).collect()
    monkeypatch.setattr(scale_rules, "bm25_rowlocal_max_terms", lambda: 0)
    slow = bm25_scores(_corpus(spark), _queries(spark), top=None).collect()
    assert {(r.doc_id, r.bm25) for r in fast} == {
        (r.doc_id, r.bm25) for r in slow
    }


def test_bm25f_matches_independent_implementation(spark):
    """Simple BM25F vs a dict-based Python reference on a
    three-field corpus (body/title/anchor) — scores equal to the
    4-dp rounding, ranking included, and the field saturation
    property holds (anchor-term spam cannot outrank a genuine body
    match the weights favor)."""
    import math

    from data_pipeline_project_using_telegram_and_aws_spark.operators.retrieval import (
        bm25f_scores,
    )

    docs = [
        # (id, body, title, anchor)
        (1, "spark engine for large data processing jobs",
         "spark engine", "spark"),
        (2, "a cooking blog about pasta and sauces",
         "pasta sauces", "spark spark spark spark spark spark"),
        (3, "distributed query engine internals and planning",
         "query planning", ""),
        (4, "", None, "engine"),
    ]
    fields = {"body": 1.0, "title": 2.0, "anchor": 0.5}
    K1, B = 1.2, 0.75

    def py_bm25f(query):
        qts = sorted(set(query.split()))
        # field lengths + averages over docs with any tokens
        dls = {
            d: {
                "body": len(b.split()),
                "title": len((t or "").split()),
                "anchor": len((a or "").split()),
            }
            for d, b, t, a in docs
        }
        pop = [d for d in dls if sum(dls[d].values()) > 0]
        avg = {
            f: sum(dls[d][f] for d in pop) / len(pop)
            for f in fields
        }
        txt = {d: {"body": b, "title": t or "", "anchor": a or ""}
               for d, b, t, a in docs}
        out = {}
        for d in pop:
            s = 0.0
            for t in qts:
                tfc = 0.0
                for f, w in fields.items():
                    tf = txt[d][f].split().count(t)
                    if tf == 0:
                        continue
                    bf = (1 - B) + B * dls[d][f] / avg[f]
                    tfc += w * tf / bf
                if tfc == 0.0:
                    continue
                df = sum(
                    1 for d2 in pop
                    if any(t in txt[d2][f].split() for f in fields)
                )
                idf = math.log(
                    1.0 + (len(pop) - df + 0.5) / (df + 0.5)
                )
                s += idf * tfc / (K1 + tfc)
            if s > 0:
                out[d] = round(s, 4)
        return out

    queries = spark.createDataFrame(
        [(1, "spark engine"), (2, "pasta")],
        "query_id int, query_text string",
    )
    got = {
        (r.query_id, r.doc_id): r.bm25f
        for r in bm25f_scores(
            spark.createDataFrame(
                docs, "doc_id int, body string, title string, anchor string"
            ),
            queries,
            fields,
            top=None,
        ).collect()
    }
    for qid, qtext in [(1, "spark engine"), (2, "pasta")]:
        want = py_bm25f(qtext)
        mine = {d: s for (q, d), s in got.items() if q == qid}
        assert mine == want, (qid, mine, want)
    # saturation property: doc 1 (real body+title match) beats doc 2
    # (anchor-spam only) on "spark"
    ranked = {
        r.doc_id: r.rank
        for r in bm25f_scores(
            spark.createDataFrame(
                docs, "doc_id int, body string, title string, anchor string"
            ),
            spark.createDataFrame(
                [(9, "spark")], "query_id int, query_text string"
            ),
            fields,
            top=5,
        ).collect()
    }
    assert ranked[1] < ranked[2]


def test_rowlocal_tf_expr_escaping_and_terms_hint(spark):
    """r14: _rowlocal_tf builds its per-term struct array as one parsed
    SQL expression — terms containing quotes/backslashes must survive
    the string-literal escaping, and bm25_scores(terms=) must match the
    probe-collect dispatch exactly."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.retrieval import (
        _rowlocal_tf,
        bm25_scores,
    )

    docs = spark.createDataFrame(
        [
            (1, "it's a test it's"),
            (2, "a\\b plain a\\b a\\b"),
            (3, "plain test"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.term): (r.tf, r.dl)
        for r in _rowlocal_tf(
            docs, ["it's", "a\\b", "plain", "absent"], "doc_id", "text"
        ).collect()
    }
    assert got == {
        (1, "it's"): (2, 4),
        (2, "a\\b"): (3, 4),
        (2, "plain"): (1, 4),
        (3, "plain"): (1, 2),
    }

    qdf = spark.createDataFrame(
        [(0, "plain test"), (1, "it's plain")],
        ["query_id", "query_text"],
    )
    via_probe = sorted(
        map(tuple, bm25_scores(docs, qdf, top=5).collect())
    )
    via_hint = sorted(
        map(
            tuple,
            bm25_scores(
                docs, qdf, top=5, terms=["plain", "test", "it's"]
            ).collect(),
        )
    )
    assert via_probe == via_hint and len(via_probe) > 0
