"""DSIR importance resampling (operators/dsir.py) against a fully
independent pure-Python model: zlib.crc32 bucketing (parity with
Spark's crc32 probed here), Counter profiles, Laplace log-ratios,
per-doc scores, and hashlib-md5 Gumbel selection keys."""

from __future__ import annotations

import math
import re
import zlib
from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st

from data_pipeline_project_using_telegram_and_aws_spark.operators.dsir import (
    dsir_importance,
    dsir_log_ratios,
    dsir_select,
    hashed_ngram_profile,
    python_gumbel_key,
)

B = 64  # small bucket space so tiny fixtures collide realistically


# ------------------------------------------------- independent model
def _py_grams(text):
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_bucket(gram, salt="dsir"):
    return zlib.crc32((salt + gram).encode()) % B


def _py_profile(texts):
    c = Counter()
    for t in texts:
        for g in _py_grams(t):
            c[_py_bucket(g)] += 1
    return c


def _py_ratios(tc, rc, a=1.0):
    tt, rt = sum(tc.values()), sum(rc.values())
    return {
        b: math.log((tc.get(b, 0) + a) / (tt + a * B))
        - math.log((rc.get(b, 0) + a) / (rt + a * B))
        for b in range(B)
    }


def _py_score(text, ratios):
    return sum(ratios[_py_bucket(g)] for g in _py_grams(text))


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


TARGET = [
    "spark shuffle exchange partition",
    "catalyst optimizer pushes the filter",
    "broadcast join beats shuffle join",
]
RAW = [
    (1, "spark shuffle partition tuning"),
    (2, "broadcast join strategies in spark"),
    (3, "pasta recipes with garlic butter"),
    (4, "garlic butter melts over pasta"),
    (5, "the catalyst optimizer and the shuffle"),
    (6, ""),
]


def test_crc32_bucketing_matches_zlib(spark):
    prof = {
        r.bucket: r.cnt
        for r in hashed_ngram_profile(
            _docs(spark, RAW), n_buckets=B
        ).collect()
    }
    want = _py_profile([t for _, t in RAW])
    assert prof == dict(want)


def test_profile_counts_multiplicity(spark):
    prof = {
        r.bucket: r.cnt
        for r in hashed_ngram_profile(
            _docs(spark, [(1, "a a a")]), n_buckets=B
        ).collect()
    }
    # grams: a×3 + "a a"×2 — multiset counts, not support ("a" and
    # "a a" may share a bucket at B=64; compare bucket-collision-aware)
    want = Counter()
    want[_py_bucket("a")] += 3
    want[_py_bucket("a a")] += 2
    assert prof == dict(want)
    assert sum(prof.values()) == 5


def test_log_ratios_match_python_model(spark):
    t = hashed_ngram_profile(
        _docs(spark, list(enumerate(TARGET))), n_buckets=B
    )
    r = hashed_ngram_profile(_docs(spark, RAW), n_buckets=B)
    got = {
        row.bucket: row.log_ratio
        for row in dsir_log_ratios(t, r, n_buckets=B).collect()
    }
    want = _py_ratios(_py_profile(TARGET), _py_profile([x for _, x in RAW]))
    assert set(got) == set(range(B))  # densified: every bucket present
    for b in range(B):
        assert got[b] == pytest.approx(want[b], abs=1e-9)
    with pytest.raises(ValueError, match="smoothing"):
        dsir_log_ratios(t, r, n_buckets=B, smoothing=0.0)


def test_importance_separates_target_like_docs(spark):
    t = hashed_ngram_profile(
        _docs(spark, list(enumerate(TARGET))), n_buckets=B
    )
    r = hashed_ngram_profile(_docs(spark, RAW), n_buckets=B)
    ratios = dsir_log_ratios(t, r, n_buckets=B)
    scored = dsir_importance(
        _docs(spark, RAW), ratios, n_buckets=B
    )
    got = {row.doc_id: row.dsir_logw for row in scored.collect()}
    want = _py_ratios(_py_profile(TARGET), _py_profile([x for _, x in RAW]))
    for d, text in RAW:
        assert got[d] == pytest.approx(
            _py_score(text, want), abs=1e-5
        ), d
    # every spark-themed doc outscores every pasta doc
    assert min(got[1], got[2], got[5]) > max(got[3], got[4])
    # empty doc scores exactly 0 and SURVIVES the left join
    assert got[6] == 0.0
    # schema: input columns preserved, score appended
    assert scored.columns == ["doc_id", "text", "dsir_logw"]


def test_select_matches_python_gumbel_topk(spark):
    scored = spark.createDataFrame(
        [(i, float(i % 5)) for i in range(40)] + [(99, None)],
        ["doc_id", "dsir_logw"],
    )
    got = [
        r.doc_id for r in dsir_select(scored, n=10).collect()
    ]
    keys = sorted(
        ((python_gumbel_key(float(i % 5), i), -i) for i in range(40)),
        reverse=True,
    )
    want = [-k[1] for k in keys[:10]]
    assert sorted(got) == sorted(want)
    with pytest.raises(ValueError, match="n must be"):
        dsir_select(scored, n=0)


def test_select_is_rerun_and_layout_stable(spark):
    scored = spark.createDataFrame(
        [(i, float(i) / 7.0) for i in range(30)], ["doc_id", "dsir_logw"]
    )
    a = sorted(r.doc_id for r in dsir_select(scored, n=8).collect())
    b = sorted(
        r.doc_id
        for r in dsir_select(scored.repartition(7), n=8).collect()
    )
    assert a == b
    c = sorted(
        r.doc_id
        for r in dsir_select(scored, n=8, salt="other").collect()
    )
    assert a != c  # independent die under a different salt


def test_select_overwhelming_weights_win(spark):
    # log-weight gap of 1000 nats dwarfs any Gumbel draw (max |G| here
    # is ~28 at the 1e-12 clamp): the heavy docs are always the sample
    scored = spark.createDataFrame(
        [(i, 1000.0 if i < 5 else 0.0) for i in range(50)],
        ["doc_id", "dsir_logw"],
    )
    got = sorted(r.doc_id for r in dsir_select(scored, n=5).collect())
    assert got == [0, 1, 2, 3, 4]


def test_select_plan_is_top_n_not_global_sort(spark):
    scored = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], ["doc_id", "dsir_logw"]
    )
    plan = (
        dsir_select(scored, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


@settings(max_examples=20, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "x1"]),
            min_size=0,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    tgt=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "zeta"]),
            min_size=1,
            max_size=4,
        ).map(" ".join),
        min_size=1,
        max_size=4,
    ),
)
def test_importance_python_model_fuzz(spark, texts, tgt):
    raw_rows = [(i, t) for i, t in enumerate(texts)]
    t_prof = hashed_ngram_profile(
        _docs(spark, list(enumerate(tgt))), n_buckets=B
    )
    r_prof = hashed_ngram_profile(_docs(spark, raw_rows), n_buckets=B)
    ratios = dsir_log_ratios(t_prof, r_prof, n_buckets=B)
    got = {
        r.doc_id: r.dsir_logw
        for r in dsir_importance(
            _docs(spark, raw_rows), ratios, n_buckets=B
        ).collect()
    }
    want_ratios = _py_ratios(_py_profile(tgt), _py_profile(texts))
    for i, t in raw_rows:
        assert got[i] == pytest.approx(
            _py_score(t, want_ratios), abs=1e-5
        )


def test_dsir_selection_shifts_sample_toward_target(spark):
    """The paper's headline property on a separable fixture: a corpus
    half spark-themed / half cooking-themed, a spark-themed target —
    DSIR-selected documents are overwhelmingly the target-like half,
    while the same-size uniform hash sample stays mixed."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
        deterministic_take_per_group,
    )
    import pyspark.sql.functions as F

    a_words = ["spark", "shuffle", "catalyst", "exchange", "broadcast"]
    b_words = ["pasta", "garlic", "butter", "oven", "basil"]
    rows = []
    for i in range(30):
        rows.append((i, " ".join(a_words[(i + j) % 5] for j in range(6))))
    for i in range(30, 60):
        rows.append((i, " ".join(b_words[(i + j) % 5] for j in range(6))))
    corpus = _docs(spark, rows)
    target = _docs(
        spark, [(100 + i, " ".join(a_words)) for i in range(3)]
    )
    ratios = dsir_log_ratios(
        hashed_ngram_profile(target, n_buckets=B),
        hashed_ngram_profile(corpus, n_buckets=B),
        n_buckets=B,
    )
    scored = dsir_importance(corpus, ratios, n_buckets=B)
    picked = [r.doc_id for r in dsir_select(scored, n=20).collect()]
    n_target_like = sum(1 for d in picked if d < 30)
    assert len(picked) == 20
    assert n_target_like >= 18  # log-weight gap dwarfs Gumbel noise
    # the uniform hash sample of the same size stays mixed
    uniform = [
        r.doc_id
        for r in deterministic_take_per_group(
            corpus.withColumn("g", F.lit(1)), "g", 20
        ).collect()
    ]
    n_uniform_target_like = sum(1 for d in uniform if d < 30)
    assert 4 <= n_uniform_target_like <= 16
    assert n_target_like > n_uniform_target_like


def test_select_per_group_budgets(spark):
    scored = spark.createDataFrame(
        [(i, float(i % 7), "a" if i < 25 else "b") for i in range(40)],
        ["doc_id", "dsir_logw", "src"],
    )
    got = dsir_select(scored, n=5, group_col="src").collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.src, []).append(r.doc_id)
    assert {s: len(v) for s, v in by_src.items()} == {"a": 5, "b": 5}
    # per-group draw = the group's own Gumbel top-n (same key)
    for src, lo, hi in (("a", 0, 25), ("b", 25, 40)):
        keys = sorted(
            ((python_gumbel_key(float(i % 7), i), -i) for i in range(lo, hi)),
            reverse=True,
        )
        assert sorted(by_src[src]) == sorted(-k[1] for k in keys[:5])
    # layout-stability holds for the grouped form too
    again = {
        (r.src, r.doc_id)
        for r in dsir_select(
            scored.repartition(9), n=5, group_col="src"
        ).collect()
    }
    assert again == {(r.src, r.doc_id) for r in got}


def test_per_gram_normalization_removes_length_bias(spark):
    # doc 20 = ONE strongly target-flavored gram repeated twice; doc 21
    # = the same flavor but 5x longer. Sum form scores the long doc
    # higher (more evidence); per_gram scores them equal (same flavor).
    t = hashed_ngram_profile(
        _docs(spark, [(0, "alpha alpha")]), n_buckets=B
    )
    r = hashed_ngram_profile(
        _docs(spark, [(0, "alpha beta gamma delta")]), n_buckets=B
    )
    ratios = dsir_log_ratios(t, r, n_buckets=B)
    corpus = _docs(
        spark, [(20, "alpha alpha"), (21, "alpha " * 10), (22, "")]
    )
    summed = {
        row.doc_id: row.dsir_logw
        for row in dsir_importance(corpus, ratios, n_buckets=B).collect()
    }
    per_gram = {
        row.doc_id: row.dsir_logw
        for row in dsir_importance(
            corpus, ratios, n_buckets=B, normalize="per_gram"
        ).collect()
    }
    assert summed[21] > summed[20]  # length is evidence in sum form
    # per-gram: each doc's mean log ratio, independently recomputed
    want_ratios = _py_ratios(
        _py_profile(["alpha alpha"]),
        _py_profile(["alpha beta gamma delta"]),
    )
    for d, text in [(20, "alpha alpha"), (21, ("alpha " * 10).strip())]:
        grams = _py_grams(text)
        want = sum(want_ratios[_py_bucket(g)] for g in grams) / len(grams)
        assert per_gram[d] == pytest.approx(want, abs=1e-5)
    assert per_gram[22] == 0.0  # gramless still scores 0
    with pytest.raises(ValueError, match="normalize"):
        dsir_importance(corpus, ratios, n_buckets=B, normalize="bogus")


def test_rowlocal_and_join_paths_agree_and_rowlocal_is_shuffle_free(
    spark,
):
    t = hashed_ngram_profile(
        _docs(spark, list(enumerate(TARGET))), n_buckets=B
    )
    r = hashed_ngram_profile(_docs(spark, RAW), n_buckets=B)
    ratios = dsir_log_ratios(t, r, n_buckets=B)
    corpus = _docs(spark, RAW)
    for norm_mode in ("none", "per_gram"):
        a = {
            row.doc_id: row.dsir_logw
            for row in dsir_importance(
                corpus, ratios, n_buckets=B, normalize=norm_mode,
                method="rowlocal",
            ).collect()
        }
        b = {
            row.doc_id: row.dsir_logw
            for row in dsir_importance(
                corpus, ratios, n_buckets=B, normalize=norm_mode,
                method="join",
            ).collect()
        }
        for d in a:
            assert a[d] == pytest.approx(b[d], abs=2e-6), (d, norm_mode)
    # the rowlocal plan is a pure projection: no shuffle, no join
    plan = (
        dsir_importance(corpus, ratios, n_buckets=B, method="rowlocal")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Python" not in plan
    # the literal-size guard admits paper-scale bucket counts and
    # rejects spaces too big to embed
    from data_pipeline_project_using_telegram_and_aws_spark.functions.scale_rules import (
        dsir_rowlocal_max_buckets,
    )

    assert dsir_rowlocal_max_buckets() >= 10_000
    with pytest.raises(ValueError, match="rowlocal literal bound"):
        dsir_importance(
            corpus,
            ratios,
            n_buckets=dsir_rowlocal_max_buckets() + 1,
            method="rowlocal",
        )
    with pytest.raises(ValueError, match="method"):
        dsir_importance(corpus, ratios, n_buckets=B, method="bogus")
    with pytest.raises(ValueError, match="densified"):
        dsir_importance(
            corpus, ratios.limit(B - 1), n_buckets=B, method="rowlocal"
        )
