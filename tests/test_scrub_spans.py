"""Span-level (surgical) decontamination: tokens covered by any
n-gram shared with the eval suite are removed, everything else is
kept byte-identically — pinned against a plain Python reference on
deterministic fixtures AND hypothesis-generated low-alphabet corpora
(forced collisions, overlap merging, full-document coverage)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from data_pipeline_project_using_telegram_and_aws_spark.operators.decontamination import (
    scrub_contaminated_spans,
)

N = 3


def _model(train: dict, eval_texts: list, n: int) -> dict:
    grams = set()
    for t in eval_texts:
        tok = t.split(" ")
        for i in range(len(tok) - n + 1):
            grams.add(" ".join(tok[i : i + n]))
    out = {}
    for did, t in train.items():
        tok = t.split(" ")
        covered = [False] * len(tok)
        for i in range(len(tok) - n + 1):
            if " ".join(tok[i : i + n]) in grams:
                for j in range(i, i + n):
                    covered[j] = True
        kept = [w for w, c in zip(tok, covered) if not c]
        out[did] = (" ".join(kept), len(tok), sum(covered))
    return out


def _run(spark, train: dict, eval_texts: list, n: int = N, **kw) -> dict:
    tdf = spark.createDataFrame(
        sorted(train.items()), ["doc_id", "text"]
    )
    edf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(eval_texts)],
        ["doc_id", "text"],
    )
    return {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_scrubbed_tokens"])
        for r in scrub_contaminated_spans(tdf, edf, n=n, **kw).collect()
    }


def test_fixture_shapes(spark):
    train = {
        # quotes the eval item mid-document: the quote goes, edges stay
        0: "intro words here alpha beta gamma delta closing words here",
        # fully the eval item: scrubs to empty
        1: "alpha beta gamma delta",
        # clean: byte-identical, double space preserved
        2: "totally  unrelated content with no overlap present",
        # shorter than n tokens: cannot collide
        3: "al be",
    }
    ev = ["alpha beta gamma delta"]
    got = _run(spark, train, ev)
    want = _model(train, ev, N)
    assert got == want
    assert got[0][0] == "intro words here closing words here"
    assert got[1] == ("", 4, 4)
    assert got[2] == (train[2], 8, 0)  # the double space is a token
    assert got[3] == ("al be", 2, 0)


def test_overlapping_hits_merge(spark):
    # "a b c d e": eval grams cover (a b c) and (c d e) -> whole doc
    train = {0: "a b c d e"}
    ev = ["a b c", "c d e"]
    got = _run(spark, train, ev)
    assert got == _model(train, ev, N)
    assert got[0] == ("", 5, 5)


_words = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
).map(" ".join)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(
    st.dictionaries(st.integers(0, 6), _words, min_size=1, max_size=5),
    st.lists(_words, min_size=1, max_size=3),
)
def test_scrub_matches_python_model(spark, train, eval_texts):
    assert _run(spark, train, eval_texts) == _model(train, eval_texts, N)


def test_hit_guard_names_the_document(spark):
    train = {7: " ".join(["x"] * 40)}
    ev = ["x x x"]
    with pytest.raises(Exception, match="document 7 has"):
        _run(spark, train, ev, max_hits_per_doc=3)


def test_persisted_gram_table_scrubs_identically(spark):
    """The incremental layout: scrubbing against the persisted eval
    gram table equals scrubbing against the eval docs themselves."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.decontamination import (
        build_eval_gram_table,
    )

    train = {
        0: "intro words here alpha beta gamma delta closing words here",
        1: "clean document entirely",
    }
    ev = ["alpha beta gamma delta"]
    tdf = spark.createDataFrame(sorted(train.items()), ["doc_id", "text"])
    edf = spark.createDataFrame(
        [(100, ev[0])], ["doc_id", "text"]
    )
    build_eval_gram_table(edf, "eval_grams_scrub_test", n=N)
    try:
        via_table = {
            r["doc_id"]: (r["text"], r["n_scrubbed_tokens"])
            for r in scrub_contaminated_spans(
                tdf,
                None,
                n=N,
                eval_grams=spark.table("eval_grams_scrub_test"),
            ).collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS eval_grams_scrub_test")
    via_docs = {
        r["doc_id"]: (r["text"], r["n_scrubbed_tokens"])
        for r in scrub_contaminated_spans(tdf, edf, n=N).collect()
    }
    assert via_table == via_docs
    assert via_table[0][1] == 4 and via_table[1][1] == 0


def test_neither_eval_side_raises(spark):
    tdf = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="eval_docs or eval_grams"):
        scrub_contaminated_spans(tdf, None)


def test_counter_column_clash_raises(spark):
    tdf = spark.createDataFrame(
        [(0, "x", 1)], ["doc_id", "text", "n_tokens"]
    )
    edf = spark.createDataFrame([(1, "y")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="n_tokens"):
        scrub_contaminated_spans(tdf, edf)


def test_decontaminate_corpus_policies(spark):
    """The one-call wrapper: drop partitions the ids with a worst-pair
    reason; scrub keeps every id with only the text changed; both
    ledgers name only affected docs."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.decontamination import (
        decontaminate_corpus,
    )

    train = {
        0: "intro words here alpha beta gamma delta closing words here",
        1: "alpha beta gamma delta",
        2: "totally unrelated content with no overlap present",
    }
    tdf = spark.createDataFrame(sorted(train.items()), ["doc_id", "text"])
    edf = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], ["doc_id", "text"]
    )

    kept, ledger = decontaminate_corpus(tdf, edf, policy="drop", n=N)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    led = {r["doc_id"]: (r["stage"], r["reason"]) for r in ledger.collect()}
    assert kept_ids == {2}
    assert set(led) == {0, 1}
    assert led[1][0] == "contamination"
    assert "eval_doc 100" in led[1][1] and "contamination 1.0" in led[1][1]
    assert kept.columns == tdf.columns

    kept2, ledger2 = decontaminate_corpus(tdf, edf, policy="scrub", n=N)
    rows = {r["doc_id"]: r["text"] for r in kept2.collect()}
    led2 = {r["doc_id"]: r["reason"] for r in ledger2.collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0] == "intro words here closing words here"
    assert rows[1] == "" and rows[2] == train[2]
    assert set(led2) == {0, 1}
    assert led2[0] == "scrubbed 4 of 10 tokens"
    assert kept2.columns == tdf.columns

    with pytest.raises(ValueError, match="unknown policy"):
        decontaminate_corpus(tdf, edf, policy="quarantine")
