"""Count-min frequency ledger: one-sided estimates within the εN
bound, exact lossless merge (per-day sketches summed == single-pass
sketch), weighted mass, heavy hitters with guaranteed recall on a
planted Zipf fixture, and the broadcast-only query plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.frequency import (
    cms_ledger,
    estimate_counts,
    heavy_hitters,
    merge_cms_ledger,
)


def _zipfish(spark, n=20_000, hot=("the", "of", "and"), days=2):
    """Deterministic corpus: 3 planted hot items carrying ~10/5/3% of
    the mass, the rest a long tail of rare items, spread over days."""
    base = spark.range(n).select(
        F.col("id"),
        (F.col("id") % days).cast("string").alias("day"),
        F.when(F.col("id") % 10 == 0, F.lit(hot[0]))
        .when(F.col("id") % 20 == 1, F.lit(hot[1]))
        .when(F.col("id") % 33 == 2, F.lit(hot[2]))
        .otherwise(F.concat(F.lit("rare_"), F.col("id")))
        .alias("item"),
    )
    return base


def test_estimates_one_sided_within_bound(spark):
    df = _zipfish(spark)
    sk = cms_ledger(df, "item", depth=4, width=2048)
    truth = {
        r["item"]: r["c"]
        for r in df.groupBy("item").agg(F.count("*").alias("c")).collect()
        if not r["item"].startswith("rare_") or r["c"] > 0
    }
    n_total = sum(truth.values())
    eps_n = (2.718281828 / 2048) * n_total  # εN overcount budget
    some_rare = [k for k in truth if k.startswith("rare_")][:20]
    query = spark.createDataFrame(
        [(k,) for k in ["the", "of", "and", *some_rare]], "item string"
    )
    est = {
        r["item"]: r["est"] for r in estimate_counts(sk, query).collect()
    }
    for item, e in est.items():
        assert e >= truth[item]  # NEVER undercounts
        assert e <= truth[item] + 4 * eps_n  # generous δ slack


def test_merge_is_exact_counter_addition(spark):
    df = _zipfish(spark, days=3)
    per_day = cms_ledger(df, "item", by=["day"], depth=4, width=512)
    merged = merge_cms_ledger(per_day)
    direct = cms_ledger(df, "item", depth=4, width=512)
    m = {(r["r"], r["bucket"]): r["cnt"] for r in merged.collect()}
    d = {(r["r"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert m == d  # bit-exact, not approximately equal


def test_weighted_mass(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 1)], "item string, w long"
    )
    sk = cms_ledger(df, "item", weight_col="w", depth=3, width=64)
    items = spark.createDataFrame([("a",), ("b",)], "item string")
    est = {
        r["item"]: r["est"]
        for r in estimate_counts(sk, items, depth=3, width=64).collect()
    }
    assert est["a"] >= 15 and est["b"] >= 1


def test_heavy_hitters_guaranteed_recall(spark):
    df = _zipfish(spark, days=4)
    n = df.count()
    truth = {
        r["item"]: r["c"]
        for r in df.groupBy("item").agg(F.count("*").alias("c")).collect()
    }
    phi = 0.04
    true_heavy = {k for k, c in truth.items() if c >= phi * n}
    assert true_heavy  # fixture actually plants heavy items
    got = {
        r["item"]: (r["est"], r["share_est"])
        for r in heavy_hitters(df, "item", "day", phi=phi).collect()
    }
    # recall is GUARANTEED: every true heavy hitter is found
    assert true_heavy <= set(got)
    # precision: anything reported is at least near-heavy (CMS
    # overcount ≤ εN with width 2048 → tiny at this fixture size)
    for item, (est, share) in got.items():
        assert truth[item] >= 0.5 * phi * n
        assert est >= truth[item]
        assert abs(share - est / n) < 1e-9


def test_query_plan_broadcasts_sketch_only(spark):
    df = _zipfish(spark)
    sk = cms_ledger(df, "item", depth=4, width=256)
    q = estimate_counts(
        sk, spark.createDataFrame([("the",)], "item string")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    with pytest.raises(ValueError, match="depth"):
        cms_ledger(df, "item", depth=0)
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, "item", "day", phi=0.0)
