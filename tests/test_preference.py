"""Preference-pair and best-of-n records: deterministic tie handling,
margin filtering, NULL-score exclusion, and the <2-responses guard."""

from __future__ import annotations

import pytest

from data_pipeline_project_using_telegram_and_aws_spark.operators.preference import (
    best_of_n,
    build_preference_pairs,
)

ROWS = [
    # prompt, response, score, response_id
    ("p1", "great", 0.9, 1),
    ("p1", "bad", 0.1, 2),
    ("p1", "meh", 0.5, 3),
    ("p2", "a", 0.5, 4),     # all-equal scores: no signal
    ("p2", "b", 0.5, 5),
    ("p3", "solo", 0.8, 6),  # single response: no pair
    ("p4", "x", None, 7),    # unscored alone: no pair
    ("p4", "y", 0.3, 8),
    ("p5", "t1", 0.7, 9),    # tied winners: id breaks the tie
    ("p5", "t2", 0.7, 10),
    ("p5", "low", 0.2, 11),
]
SCHEMA = "prompt_id string, response string, score double, response_id long"


def test_preference_pairs(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    pairs = {
        r["prompt_id"]: r
        for r in build_preference_pairs(df).collect()
    }
    assert set(pairs) == {"p1", "p5"}  # p2 margin 0, p3 solo, p4 1 score
    p1 = pairs["p1"]
    assert (p1["chosen"], p1["rejected"]) == ("great", "bad")
    assert p1["margin"] == pytest.approx(0.8)
    assert p1["n_responses"] == 3
    p5 = pairs["p5"]
    assert p5["chosen"] == "t2"  # deterministic: higher id wins the tie
    assert p5["rejected"] == "low"

    # margin filter: p1's 0.8 margin survives 0.5, p5's 0.5 does not
    strict = {
        r["prompt_id"]
        for r in build_preference_pairs(df, min_margin=0.5).collect()
    }
    assert strict == {"p1"}


def test_best_of_n(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    top2 = best_of_n(df, k=2)
    got = {
        (r["prompt_id"], r["response_rank"]): r["response"]
        for r in top2.collect()
    }
    assert got[("p1", 1)] == "great" and got[("p1", 2)] == "meh"
    # tie at 0.7: asc id ranks first deterministically
    assert got[("p5", 1)] == "t1" and got[("p5", 2)] == "t2"
    assert got[("p4", 1)] == "y"  # the NULL-scored response never wins
    assert ("p4", 2) not in got
    with pytest.raises(ValueError, match="k must be >= 1"):
        best_of_n(df, k=0)


from hypothesis import HealthCheck, given, settings, strategies as st

_resp = st.lists(
    st.tuples(
        st.sampled_from(["p0", "p1"]),
        st.one_of(st.none(), st.sampled_from([0.1, 0.5, 0.5, 0.9])),
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(_resp, st.sampled_from([0.0, 0.3]))
def test_preference_pairs_model(spark, resp, margin):
    """Model check: chosen/rejected equal the Python (score, id)
    max/min over scored responses; prompts with <2 scored responses or
    margin <= min_margin never emit; ties resolve identically."""
    rows = [
        (p, f"r{i}", s, i) for i, (p, s) in enumerate(resp)
    ]
    df = spark.createDataFrame(
        rows,
        "prompt_id string, response string, score double, response_id long",
    )
    got = {
        r["prompt_id"]: (r["chosen_id"], r["rejected_id"], r["margin"])
        for r in build_preference_pairs(df, min_margin=margin).collect()
    }
    want = {}
    for p in {p for p, _ in resp}:
        scored = [
            (s, i) for i, (pp, s) in enumerate(resp)
            if pp == p and s is not None
        ]
        if len(scored) < 2:
            continue
        best, worst = max(scored), min(scored)
        m = best[0] - worst[0]
        if m > margin:
            want[p] = (best[1], worst[1], round(m, 6))
    assert got == want, (resp, margin)
