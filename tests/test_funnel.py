"""Funnel analysis: greedy-earliest chain semantics on hand fixtures
(order enforcement, same-timestamp progress, whole-funnel window),
parity with an independent Python recompute on the real events table,
report arithmetic, and the no-join/no-window plan shape."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.funnel import (
    funnel,
    funnel_report,
)
from data_pipeline_project_using_telegram_and_aws_spark.sources.tables import load_table


def _ts(s):
    return datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


STEPS = ["view", "click", "purchase"]


def test_funnel_semantics(spark):
    rows = [
        # u1 converts fully, in order
        (1, "view", _ts("2024-01-01 10:00:00")),
        (1, "click", _ts("2024-01-01 10:05:00")),
        (1, "purchase", _ts("2024-01-01 10:30:00")),
        # u2: click BEFORE view — the early click must not count
        (2, "click", _ts("2024-01-01 09:00:00")),
        (2, "view", _ts("2024-01-01 10:00:00")),
        # u3: view then same-timestamp click (>= counts), no purchase
        (3, "view", _ts("2024-01-01 10:00:00")),
        (3, "click", _ts("2024-01-01 10:00:00")),
        # u4: never does step 1 → no row at all
        (4, "purchase", _ts("2024-01-01 10:00:00")),
        # noise types are ignored
        (1, "error", _ts("2024-01-01 10:01:00")),
    ]
    out = {
        r["user_id"]: (r["steps_completed"], r["step_ts"])
        for r in funnel(_events(spark, rows), STEPS).collect()
    }
    assert out[1][0] == 3
    assert out[2][0] == 1  # the pre-view click never matches
    assert out[3][0] == 2  # same-ts progress
    assert 4 not in out
    assert out[1][1] == [
        _ts("2024-01-01 10:00:00"),
        _ts("2024-01-01 10:05:00"),
        _ts("2024-01-01 10:30:00"),
    ]


def test_funnel_window_bounds_whole_funnel(spark):
    rows = [
        (1, "view", _ts("2024-01-01 10:00:00")),
        (1, "click", _ts("2024-01-01 10:10:00")),
        (1, "purchase", _ts("2024-01-01 12:00:00")),  # outside 1 h
    ]
    out = funnel(
        _events(spark, rows), STEPS, within_seconds=3600
    ).collect()[0]
    assert out["steps_completed"] == 2
    unbounded = funnel(_events(spark, rows), STEPS).collect()[0]
    assert unbounded["steps_completed"] == 3


def test_funnel_matches_python_on_real_events(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "event_type", "ts"
    )
    got = {
        r["user_id"]: r["steps_completed"]
        for r in funnel(ev, STEPS).collect()
    }
    rows = [
        (r["user_id"], r["event_type"], r["ts"]) for r in ev.collect()
    ]
    by_user: dict = {}
    for u, t, ts in rows:
        if t in STEPS:
            by_user.setdefault(u, []).append((ts, STEPS.index(t)))
    for u, es in by_user.items():
        want = 0
        for ts, step in sorted(es):
            if step == want:
                want += 1
        if want > 0:
            assert got.get(u) == want, (u, got.get(u), want)
        else:
            assert u not in got


def test_funnel_report_and_validation(spark):
    rows = [
        (1, "view", _ts("2024-01-01 10:00:00")),
        (1, "click", _ts("2024-01-01 10:05:00")),
        (1, "purchase", _ts("2024-01-01 10:06:00")),
        (2, "view", _ts("2024-01-01 10:00:00")),
        (2, "click", _ts("2024-01-01 10:05:00")),
        (3, "view", _ts("2024-01-01 10:00:00")),
        (4, "view", _ts("2024-01-01 10:00:00")),
    ]
    rep = {
        r["step"]: r for r in funnel_report(_events(spark, rows), STEPS).collect()
    }
    assert rep[1]["n_users"] == 4 and rep[1]["conversion_from_start"] == 1.0
    assert rep[2]["n_users"] == 2 and rep[2]["conversion_from_prev"] == 0.5
    assert rep[3]["n_users"] == 1 and rep[3]["conversion_from_prev"] == 0.5
    assert rep[3]["conversion_from_start"] == 0.25
    # plan: one aggregation, no joins, no window functions, no Python
    plan = (
        funnel(_events(spark, rows), STEPS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Window" not in plan
    assert "Python" not in plan
    with pytest.raises(ValueError, match="at least 2"):
        funnel(_events(spark, rows), ["view"])
    with pytest.raises(ValueError, match="distinct"):
        funnel(_events(spark, rows), ["view", "view"])
