"""Sliced-AUC pins: perfect/anti/chance separations, exact tie
handling against a hand-computed Mann-Whitney value, degenerate
single-class groups, and agreement with an independent O(n²)
pair-counting AUC on random data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.evaluation import (
    auc_by_group,
)


def test_perfect_anti_and_degenerate(spark):
    rows = (
        # group a: scores separate perfectly
        [("a", 1, 0.9), ("a", 1, 0.8), ("a", 0, 0.2), ("a", 0, 0.1)]
        # group b: anti-predictor
        + [("b", 0, 0.9), ("b", 0, 0.8), ("b", 1, 0.2), ("b", 1, 0.1)]
        # group c: positives only
        + [("c", 1, 0.5), ("c", 1, 0.6)]
    )
    df = spark.createDataFrame(rows, ["g", "y", "s"])
    got = {r["g"]: r for r in auc_by_group(df, "y", "s", "g").collect()}
    assert got["a"]["auc"] == 1.0
    assert got["b"]["auc"] == 0.0
    assert got["c"]["auc"] is None
    assert got["c"]["n_pos"] == 2 and got["c"]["n_neg"] == 0


def test_tie_handling_exact(spark):
    # one positive tied with one negative at 0.5, one negative below:
    # avg ranks: 0.3 → 1; the two 0.5s → 2.5 each
    # AUC = (2.5 - 1) / (1 * 2) = 0.75
    df = spark.createDataFrame(
        [("g", 1, 0.5), ("g", 0, 0.5), ("g", 0, 0.3)], ["g", "y", "s"]
    )
    got = auc_by_group(df, "y", "s", "g").collect()[0]
    assert got["auc"] == 0.75


def test_matches_pair_counting_on_random_data(spark):
    import random

    rng = random.Random(11)
    rows = [
        ("g", rng.randint(0, 1), round(rng.random(), 2)) for _ in range(300)
    ]
    df = spark.createDataFrame(rows, ["g", "y", "s"])
    got = auc_by_group(df, "y", "s", "g").collect()[0]["auc"]
    pos = [s for _, y, s in rows if y == 1]
    neg = [s for _, y, s in rows if y == 0]
    wins = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    )
    want = round(wins / (len(pos) * len(neg)), 6)
    assert got == pytest.approx(want, abs=1e-6)


def test_slices_the_trained_classifier(spark):
    """End use: slice AUC of the hashed-BoW quality classifier on a
    prose-vs-junk corpus (its own training regime) — near-perfect on
    every slice that has both classes, with slice sizes exposed."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.quality_classifier import (
        score_documents,
        train_quality_classifier,
    )

    prose = (
        "the harbor was quiet that evening and the sailors told long "
        "stories about storms gulls and distant lighthouses while the "
        "rain tapped gently on the tavern roof"
    ).split()
    rows = []
    for i in range(400):
        if i % 2 == 0:
            text = " ".join(prose[(i + j) % len(prose)] for j in range(20))
            label = 1.0
        else:
            text = " ".join(f"zz{(i * 7 + j) % 97}q" for j in range(20))
            label = 0.0
        rows.append((i, text, label, str(i % 3)))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "label", "grp"])
    model = train_quality_classifier(docs, n_features=1 << 12)
    scored = docs.join(score_documents(model, docs), "doc_id")
    rep = {
        r["grp"]: r
        for r in auc_by_group(
            scored, "label", "quality_prob", "grp"
        ).collect()
    }
    assert set(rep) == {"0", "1", "2"}
    for r in rep.values():
        assert r["auc"] > 0.95
        assert r["n_pos"] > 0 and r["n_neg"] > 0


def test_calibration_report(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.evaluation import (
        calibration_report,
    )

    # perfectly calibrated synthetic scores: in bin [0.b, 0.b+0.1),
    # fraction positive == the score
    rows = []
    for b in range(10):
        p = b / 10 + 0.05
        for i in range(100):
            rows.append(("g", 1 if i < p * 100 else 0, round(p, 2)))
    df = spark.createDataFrame(rows, ["g", "y", "s"])
    rep = {r["bin"]: r for r in calibration_report(df, "y", "s").collect()}
    assert len(rep) == 10
    for b, r in rep.items():
        assert r["n"] == 100
        assert abs(r["gap"]) <= 0.01
        assert r["bin_lo"] == b / 10
    # a systematically overconfident model shows positive gaps up top
    over = spark.createDataFrame(
        [("g", 0, 0.95)] * 80 + [("g", 1, 0.95)] * 20, ["g", "y", "s"]
    )
    r = calibration_report(over, "y", "s").collect()[-1]
    assert r["gap"] > 0.7

    import pytest as _pytest

    bad = spark.createDataFrame([("g", 1, 1.5)], ["g", "y", "s"])
    with _pytest.raises(Exception, match="0, 1"):
        calibration_report(bad, "y", "s").collect()


def test_tokenizer_fairness_report(spark):
    """A BPE trained only on lang-A text charges lang B more pieces per
    character — the report surfaces the asymmetry."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.bpe import (
        bpe_encode,
        train_bpe,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.evaluation import (
        tokenizer_fairness_report,
    )

    a_words = "the cat sat on the mat and the dog ran"
    b_words = "zq wx vk jy qz xw kv yj zx qw"
    rows = [(i, a_words, "a") for i in range(20)] + [
        (i + 100, b_words, "b") for i in range(20)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    merges = train_bpe(
        docs.filter("lang = 'a'"), n_merges=30, min_pair_freq=1
    )
    rep = {
        r["lang"]: r
        for r in tokenizer_fairness_report(
            docs, bpe_encode(docs, merges)
        ).collect()
    }
    assert rep["a"]["pieces_per_char"] < rep["b"]["pieces_per_char"]
    assert rep["a"]["relative_cost"] < 1.0 < rep["b"]["relative_cost"]
    assert rep["a"]["n_docs"] == rep["b"]["n_docs"] == 20


def test_agreement_report_kappa(spark):
    """Cohen's κ against the textbook hand computation: confusion
    matrix [[20,5],[10,15]] → po=0.7, pe=0.5, κ=0.4; per-slice
    computation, NULL-label exclusion, the both-raters-constant
    degenerate (κ NULL, not 1.0), and the in-plan alphabet guard."""
    import pytest

    from data_pipeline_project_using_telegram_and_aws_spark.operators.evaluation import (
        agreement_report,
    )

    rows = (
        [("s1", "yes", "yes")] * 20
        + [("s1", "yes", "no")] * 5
        + [("s1", "no", "yes")] * 10
        + [("s1", "no", "no")] * 15
        + [("s2", "x", "x")] * 7          # constant raters
        + [("s1", None, "yes")] * 3       # abstentions excluded
        + [("s1", "yes", None)] * 2
    )
    df = spark.createDataFrame(rows, "slice string, a string, b string")
    rep = {
        r["slice"]: r
        for r in agreement_report(df, "a", "b", by="slice").collect()
    }
    s1 = rep["s1"]
    assert s1["n"] == 50  # NULL-label rows excluded
    assert s1["observed_agreement"] == pytest.approx(0.7)
    assert s1["expected_agreement"] == pytest.approx(0.5)
    assert s1["kappa"] == pytest.approx(0.4)
    s2 = rep["s2"]
    assert s2["observed_agreement"] == 1.0
    assert s2["kappa"] is None  # 0/0, not perfect agreement

    # global mode: one row, no slice column
    g = agreement_report(df, "a", "b").collect()
    assert len(g) == 1 and g[0]["n"] == 57

    # alphabet guard: 3 distinct labels with max_labels=1 -> >1 cell
    with pytest.raises(Exception, match="distinct label pairs"):
        agreement_report(df, "a", "b", by="slice", max_labels=1).collect()


def test_distinct_ngram_report_matches_counter_model(spark):
    from collections import Counter

    from data_pipeline_project_using_telegram_and_aws_spark.operators.evaluation import (
        distinct_ngram_report,
    )

    rows = [
        ("gen", "the cat sat"),
        ("gen", "the cat sat"),        # generator repeating itself
        ("gen", "the cat sat again"),
        ("ref", "a fresh sentence here"),
        ("ref", "another fresh one entirely"),
        ("tiny", "x"),                  # no bigrams/trigrams
    ]
    df = spark.createDataFrame(rows, ["src", "text"])
    got = {
        (r.src, r.n): (r.n_grams, r.n_distinct, r.distinct_ratio)
        for r in distinct_ngram_report(df, ns=(1, 2), by=["src"]).collect()
    }

    def model(texts, n):
        c = Counter()
        for t in texts:
            toks = t.split()
            for i in range(len(toks) - n + 1):
                c[" ".join(toks[i : i + n])] += 1
        total = sum(c.values())
        return (total, len(c), round(len(c) / total, 6) if total else None)

    by_src = {}
    for s, t in rows:
        by_src.setdefault(s, []).append(t)
    for s, texts in by_src.items():
        for n in (1, 2):
            assert got[(s, n)] == model(texts, n), (s, n)
    # the repeating slice is measurably less diverse than the fresh one
    assert got[("gen", 2)][2] < got[("ref", 2)][2] == 1.0
    # gramless slice visible with NULL ratio, not absent
    assert got[("tiny", 2)] == (0, 0, None)
    # unsliced mode: one row per n over the whole corpus
    whole = {
        r.n: r.n_grams
        for r in distinct_ngram_report(df, ns=(1, 2)).collect()
    }
    assert whole[1] == sum(len(t.split()) for _, t in rows)


def test_distinct_ngram_report_approx_dial(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.evaluation import (
        distinct_ngram_report,
    )

    df = spark.createDataFrame(
        [(0, f"w{i} w{i+1} w{i+2}") for i in range(200)], ["g", "text"]
    ).drop("g")
    ex = {r.n: r.n_distinct for r in distinct_ngram_report(df, ns=(1,)).collect()}
    ap = {
        r.n: r.n_distinct
        for r in distinct_ngram_report(df, ns=(1,), exact=False).collect()
    }
    assert ex[1] == 202  # w0..w201 exactly
    assert abs(ap[1] - ex[1]) / ex[1] < 0.1  # HLL within its rsd regime
