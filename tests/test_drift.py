"""Drift pins: PSI ≈ 0 on identical distributions, symmetric growth
with shift size, out-of-range mass lands in edge bins (not dropped),
null accounting, and a recomputation check against pure Python."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.drift import (
    histogram,
    psi_report,
)


def _uniform(spark, n, lo, hi, seed):
    return spark.range(n).select(
        (
            lo
            + (hi - lo)
            * (F.pmod(F.xxhash64("id", F.lit(seed)), 10_000) / 10_000.0)
        ).alias("x")
    )


def test_identical_distributions_score_zero(spark):
    base = _uniform(spark, 4000, 0.0, 1.0, seed=1)
    rep = psi_report(base, _uniform(spark, 4000, 0.0, 1.0, seed=2), "x")
    assert rep["psi"] < 0.02


def test_shift_grows_psi(spark):
    base = _uniform(spark, 4000, 0.0, 1.0, seed=1)
    small = psi_report(base, _uniform(spark, 4000, 0.1, 1.1, seed=3), "x")
    big = psi_report(base, _uniform(spark, 4000, 0.5, 1.5, seed=4), "x")
    assert small["psi"] > 0.05
    assert big["psi"] > small["psi"]
    assert big["psi"] > 0.25  # the canonical "investigate" band


def test_out_of_range_clamps_to_edge_bins(spark):
    base = _uniform(spark, 2000, 0.0, 1.0, seed=1)
    h = histogram(_uniform(spark, 1000, 5.0, 6.0, seed=5), "x", 10, 0.0, 1.0)
    got = {r["bin"]: r["n"] for r in h.collect()}
    assert got == {9: 1000}  # everything in the top edge bin
    rep = psi_report(base, _uniform(spark, 2000, 5.0, 6.0, seed=5), "x")
    assert rep["psi"] > 1.0  # total mass relocation = extreme drift


def test_nulls_reported_not_scored(spark):
    base = _uniform(spark, 1000, 0.0, 1.0, seed=1)
    cur = _uniform(spark, 1000, 0.0, 1.0, seed=2).withColumn(
        "x", F.when(F.rand(7) < 0.0, None).otherwise(F.col("x"))
    )
    cur = cur.unionByName(
        cur.sparkSession.createDataFrame([(None,)], "x double")
    )
    rep = psi_report(base, cur, "x")
    assert rep["current_nulls"] == 1 and rep["baseline_nulls"] == 0
    # two independent 1k-row draws sit inside the canonical stable band
    assert rep["psi"] < 0.1


def test_matches_python_recomputation(spark):
    base = _uniform(spark, 1500, 0.0, 1.0, seed=1)
    cur = _uniform(spark, 1500, 0.2, 1.2, seed=2)
    rep = psi_report(base, cur, "x", bins=10)
    bx = [r["x"] for r in base.collect()]
    cx = [r["x"] for r in cur.collect()]
    lo, hi = min(bx), max(bx)
    width = (hi - lo) / 10

    def hist(vals):
        h = [0] * 10
        for v in vals:
            h[min(max(int((v - lo) // width), 0), 9)] += 1
        return h

    hb, hc = hist(bx), hist(cx)
    tb, tc = sum(hb), sum(hc)
    want = sum(
        (b / tb - c / tc) * math.log((b / tb + 1e-6) / (c / tc + 1e-6))
        for b, c in zip(hb, hc)
    )
    assert abs(rep["psi"] - want) < 0.01
    with pytest.raises(ValueError):
        psi_report(
            spark.createDataFrame([(1.0,)], "x double"), cur, "x"
        )


def _cats(spark, spec: dict[str, int], with_null: int = 0):
    rows = [(c,) for c, n in spec.items() for _ in range(n)]
    rows += [(None,)] * with_null
    return spark.createDataFrame(rows, "cat string")


def test_categorical_identical_distributions_near_zero(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.drift import (
        categorical_drift_report,
    )

    a = _cats(spark, {"en": 800, "de": 150, "fr": 50})
    rep = categorical_drift_report(a, a, "cat")
    assert rep["js_divergence"] == 0.0
    assert rep["total_variation"] == 0.0
    assert rep["new_categories"] == [] and rep["vanished_categories"] == []


def test_categorical_matches_python_and_detects_new_category(spark):
    """JSD/TV against a pure-Python recomputation, with a category the
    baseline never saw — its mass MUST contribute (the full-outer
    contract) and be named in new_categories."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.drift import (
        categorical_drift_report,
    )

    base_spec = {"en": 700, "de": 300}
    cur_spec = {"en": 500, "de": 200, "zz": 300}  # new mode: 30% zz
    rep = categorical_drift_report(
        _cats(spark, base_spec), _cats(spark, cur_spec), "cat"
    )
    p = {c: n / 1000 for c, n in base_spec.items()}
    q = {c: n / 1000 for c, n in cur_spec.items()}
    cats = set(p) | set(q)
    jsd = tv = 0.0
    for c in cats:
        pc, qc = p.get(c, 0.0), q.get(c, 0.0)
        m = (pc + qc) / 2
        if pc:
            jsd += 0.5 * pc * math.log(pc / m)
        if qc:
            jsd += 0.5 * qc * math.log(qc / m)
        tv += abs(pc - qc) / 2
    assert rep["js_divergence"] == pytest.approx(round(jsd, 6))
    assert rep["total_variation"] == pytest.approx(round(tv, 6))
    assert rep["new_categories"] == ["zz"]
    assert rep["vanished_categories"] == []
    assert rep["top_movers"][0]["cat"] == "zz"


def test_categorical_nulls_and_vanished(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.drift import (
        categorical_drift_report,
    )

    base = _cats(spark, {"en": 900, "legacy": 100})
    cur = _cats(spark, {"en": 900}, with_null=100)
    rep = categorical_drift_report(base, cur, "cat")
    assert rep["vanished_categories"] == ["legacy"]
    assert rep["new_categories"] == ["<null>"]  # null-rate change IS drift
    assert rep["js_divergence"] > 0.05
    with pytest.raises(ValueError, match="empty"):
        categorical_drift_report(base, cur.limit(0), "cat")


# ------------------------------------------- KS from quantile ledgers


def _py_ks(xs, ys):
    pts = sorted(set(xs) | set(ys))
    n, m = len(xs), len(ys)
    return max(
        abs(
            sum(1 for v in xs if v <= p) / n
            - sum(1 for v in ys if v <= p) / m
        )
        for p in pts
    )


def _ledger(spark, rows, by=None):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.quantile_sketch import (
        quantile_ledger,
    )

    cols = (by or []) + ["doc_id", "x"]
    df = spark.createDataFrame(rows, cols)
    return quantile_ledger(df, "x", "doc_id", by=by, k=64)


def test_ks_exact_when_samples_cover_groups(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.drift import (
        ks_from_quantile_ledgers,
    )

    xs = [1.0, 2.0, 2.0, 3.0, 10.0]
    ys = [2.0, 3.0, 4.0, 4.0]
    a = _ledger(spark, [(i, v) for i, v in enumerate(xs)])
    b = _ledger(spark, [(i, v) for i, v in enumerate(ys)])
    row = ks_from_quantile_ledgers(a, b).collect()[0]
    # k=64 >= n: ledger samples ARE the data -> KS is exact, ties incl.
    assert row.ks == pytest.approx(round(_py_ks(xs, ys), 6))
    assert (row.n_a, row.n_b) == (5, 4)
    assert row.d_crit_95 == pytest.approx(
        round(1.358 * math.sqrt(9 / 20), 6)
    )


def test_ks_identical_zero_and_shift_drifts(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.drift import (
        ks_from_quantile_ledgers,
    )

    base = [(i, float(i % 40)) for i in range(60)]
    same = ks_from_quantile_ledgers(
        _ledger(spark, base), _ledger(spark, base)
    ).collect()[0]
    assert same.ks == 0.0 and same.drifted is False
    shifted = [(i, float(i % 40) + 100.0) for i in range(60)]
    far = ks_from_quantile_ledgers(
        _ledger(spark, base), _ledger(spark, shifted)
    ).collect()[0]
    assert far.ks == 1.0 and far.drifted is True


def test_ks_by_group_and_one_sided_groups(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.drift import (
        ks_from_quantile_ledgers,
    )

    a = _ledger(
        spark,
        [("g1", i, float(i)) for i in range(8)]
        + [("only_a", i, 1.0) for i in range(3)],
        by=["grp"],
    )
    b = _ledger(
        spark,
        [("g1", i, float(i) + 0.5) for i in range(8)],
        by=["grp"],
    )
    rows = {
        r.grp: r for r in ks_from_quantile_ledgers(a, b, by=["grp"]).collect()
    }
    want = _py_ks(
        [float(i) for i in range(8)], [float(i) + 0.5 for i in range(8)]
    )
    assert rows["g1"].ks == pytest.approx(round(want, 6))
    assert rows["only_a"].ks is None  # no comparison, not "no drift"
    assert rows["only_a"].drifted is None


def test_ks_python_model_fuzz(spark):
    from hypothesis import given, settings, strategies as st

    from data_pipeline_project_using_telegram_and_aws_spark.operators.drift import (
        ks_from_quantile_ledgers,
    )

    vals = st.lists(
        st.integers(0, 6).map(float), min_size=1, max_size=20
    )

    @settings(max_examples=15, deadline=None)
    @given(xs=vals, ys=vals)
    def run(xs, ys):
        # k=64 >= n on both sides: the ledger samples ARE the data, so
        # the operator must equal the exact two-sample KS (ties heavy
        # by construction — integers 0..6)
        a = _ledger(spark, [(i, v) for i, v in enumerate(xs)])
        b = _ledger(spark, [(i, v) for i, v in enumerate(ys)])
        row = ks_from_quantile_ledgers(a, b).collect()[0]
        assert row.ks == pytest.approx(round(_py_ks(xs, ys), 6))
        assert (row.n_a, row.n_b) == (len(xs), len(ys))

    run()
