"""Recrawl change-rate estimation + revisit scheduling
(`operators/recrawl.py`) — pinned against hand-computed Cho &
Garcia-Molina estimator values, an independent scalar implementation
over randomized histories, and scheduling-policy cases (budget,
floor, prior for single-fetch urls, deterministic tie order)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from data_pipeline_project_using_telegram_and_aws_spark.operators.recrawl import (
    estimate_change_rates,
    schedule_revisits,
)

OBS_DDL = "url string, fetch_time double, digest string"


def _scalar_rate(history):
    """Independent estimator: history = [(t, digest)] sorted by t."""
    history = sorted(history)
    n = len(history) - 1
    if n < 1:
        return None
    x = sum(
        1 for (t0, d0), (t1, d1) in zip(history, history[1:])
        if d0 != d1
    )
    mean_iv = (history[-1][0] - history[0][0]) / n
    if mean_iv <= 0:
        return None
    return -math.log((n - x + 0.5) / (n + 0.5)) / mean_iv


def test_hand_computed_estimator_case(spark):
    # 5 fetches every 10 s, digests change in 2 of 4 intervals:
    # rate = -ln((4-2+0.5)/(4+0.5)) / 10 = ln(1.8)/10
    rows = [
        ("u", 0.0, "a"), ("u", 10.0, "a"), ("u", 20.0, "b"),
        ("u", 30.0, "b"), ("u", 40.0, "c"),
    ]
    r = estimate_change_rates(
        spark.createDataFrame(rows, OBS_DDL)
    ).collect()[0]
    assert (r.n_fetches, r.n_intervals, r.n_changes) == (5, 4, 2)
    assert r.mean_interval_s == 10.0
    assert r.change_rate == pytest.approx(math.log(1.8) / 10, abs=1e-9)
    assert r.last_fetch_time == 40.0 and r.last_digest == "c"


def test_zero_and_all_changes_edges(spark):
    stable = [("s", 10.0 * i, "same") for i in range(6)]
    churn = [("c", 10.0 * i, f"d{i}") for i in range(6)]
    single = [("one", 5.0, "x")]
    out = {
        r.url: r
        for r in estimate_change_rates(
            spark.createDataFrame(stable + churn + single, OBS_DDL)
        ).collect()
    }
    assert out["s"].change_rate == 0.0  # X=0 -> no evidence of change
    # X=n stays finite: -ln(0.5/5.5)/10
    assert out["c"].change_rate == pytest.approx(
        math.log(11.0) / 10, abs=1e-9
    )
    assert out["one"].change_rate is None  # no intervals
    assert out["one"].n_fetches == 1


def test_estimator_matches_scalar_over_random_histories(spark):
    rng = np.random.default_rng(17)
    rows, want = [], {}
    for i in range(20):
        url = f"u{i}"
        times = np.cumsum(rng.uniform(1, 100, size=rng.integers(2, 9)))
        digests = [str(rng.integers(0, 3)) for _ in times]
        hist = list(zip(map(float, times), digests))
        rows += [(url, t, d) for t, d in hist]
        want[url] = _scalar_rate(hist)
    got = {
        r.url: r.change_rate
        for r in estimate_change_rates(
            spark.createDataFrame(rows, OBS_DDL)
        ).collect()
    }
    for url, w in want.items():
        assert got[url] == pytest.approx(w, abs=1e-9), url


def test_schedule_orders_by_staleness_with_budget_and_floor(spark):
    # fast-changing page fetched recently vs slow page fetched long
    # ago: staleness = 1 - exp(-rate*age) decides, not rate alone
    rows = (
        [("fast", 10.0 * i, f"d{i}") for i in range(5)]       # churns
        + [("slow", 200.0 * i, "d" + str(i // 4)) for i in range(5)]
        + [("dead", 10.0 * i, "same") for i in range(5)]      # rate 0
        + [("fresh", 100.0, "x")]                             # 1 fetch
    )
    rates = estimate_change_rates(spark.createDataFrame(rows, OBS_DDL))
    sched = schedule_revisits(rates, now_s=1000.0).collect()
    order = [r.url for r in sched]
    # no prior: single-fetch url excluded; dead page staleness 0 last
    assert "fresh" not in order and order[-1] == "dead"
    by_url = {r.url: r for r in sched}
    for r in sched:
        assert r.staleness_p == pytest.approx(
            1 - math.exp(-r.change_rate * r.age_s), abs=1e-6
        )
    assert by_url["fast"].age_s == 1000.0 - 40.0
    # budget caps, floor filters
    top1 = schedule_revisits(rates, now_s=1000.0, budget=1).collect()
    assert [r.url for r in top1] == [order[0]]
    floored = schedule_revisits(
        rates, now_s=1000.0, min_staleness=0.5
    ).collect()
    assert all(r.staleness_p >= 0.5 for r in floored)
    # prior_rate opts single-fetch urls in, aged from their fetch
    with_prior = {
        r.url: r
        for r in schedule_revisits(
            rates, now_s=1000.0, prior_rate=0.01
        ).collect()
    }
    assert "fresh" in with_prior
    assert with_prior["fresh"].staleness_p == pytest.approx(
        1 - math.exp(-0.01 * 900.0), abs=1e-6
    )


def test_schedule_tie_order_is_deterministic(spark):
    rows = [(u, 10.0 * i, f"d{i}") for u in ("b", "a") for i in range(3)]
    rates = estimate_change_rates(spark.createDataFrame(rows, OBS_DDL))
    out = [r.url for r in schedule_revisits(rates, now_s=100.0).collect()]
    assert out == ["a", "b"]  # identical staleness -> url ascending
