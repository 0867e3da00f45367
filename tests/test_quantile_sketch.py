"""Bottom-k quantile ledger: exact mergeability (the sketch of the
union IS the merge of the sketches, bit-for-bit), accuracy within the
sampling bound, exactness below k, layout invariance, null handling,
and the no-rescan merge contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.quantile_sketch import (
    ledger_quantiles,
    merge_quantile_ledger,
    quantile_ledger,
)


def _values(spark, n, lo=0.0, hi=100.0, group="a", id_start=0):
    return spark.range(id_start, id_start + n).select(
        F.col("id").alias("doc_id"),
        F.lit(group).alias("src"),
        (
            lo
            + (hi - lo) * (F.pmod(F.xxhash64("id"), 100_000) / 100_000.0)
        ).alias("x"),
    )


def test_merge_equals_global_build_exactly(spark):
    """The load-bearing property: per-day ledgers merged == the
    single-pass ledger over everything, sample arrays bit-identical."""
    day1 = _values(spark, 3000, group="a", id_start=0)
    day2 = _values(spark, 2000, group="a", id_start=10_000)
    full = day1.unionByName(day2)
    k = 256
    merged = merge_quantile_ledger(
        quantile_ledger(day1, "x", "doc_id", by=["src"], k=k).unionByName(
            quantile_ledger(day2, "x", "doc_id", by=["src"], k=k)
        ),
        by=["src"],
        k=k,
    ).collect()[0]
    direct = quantile_ledger(full, "x", "doc_id", by=["src"], k=k).collect()[0]
    assert merged["sample"] == direct["sample"]
    assert merged["n_rows"] == direct["n_rows"] == 5000
    assert merged["lo"] == direct["lo"]
    assert merged["hi"] == direct["hi"]


def test_quantile_accuracy_within_sampling_bound(spark):
    """Median/p90 estimates from a k=1024 sample of 50k uniform values
    sit within a few sampling standard errors of the exact quantiles."""
    df = _values(spark, 50_000)
    led = quantile_ledger(df, "x", "doc_id", k=1024)
    est = ledger_quantiles(led, [0.5, 0.9]).collect()[0]
    exact = df.agg(
        F.expr("percentile(x, 0.5)").alias("m"),
        F.expr("percentile(x, 0.9)").alias("p90"),
    ).collect()[0]
    # RSE of the quantile position ≈ sqrt(q(1-q)/k); 5 SE over the
    # 0-100 range ≈ 7.8 for the median, 4.7 for p90
    assert abs(est["q_0_5"] - exact["m"]) < 8.0
    assert abs(est["q_0_9"] - exact["p90"]) < 5.0


def test_small_group_is_exact(spark):
    """Groups with <= k rows carry the whole group: every quantile is
    the exact empirical quantile, and q=0/q=1 are exact always."""
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7])],
        "doc_id long, x double",
    )
    est = ledger_quantiles(
        quantile_ledger(df, "x", "doc_id", k=64), [0.0, 0.5, 1.0]
    ).collect()[0]
    assert est["q_0_0"] == 1.0
    assert est["q_0_5"] == 5.0
    assert est["q_1_0"] == 9.0
    assert est["n_rows"] == 5


def test_layout_invariance_and_idempotent_merge(spark):
    """Same ledger from any partition layout; re-merging a merged
    ledger (replay) changes nothing."""
    df = _values(spark, 4000)
    a = quantile_ledger(df.repartition(1), "x", "doc_id", k=128).collect()[0]
    b = quantile_ledger(df.repartition(17), "x", "doc_id", k=128).collect()[0]
    assert a["sample"] == b["sample"]
    led = quantile_ledger(df, "x", "doc_id", k=128)
    once = merge_quantile_ledger(led, k=128)
    twice = merge_quantile_ledger(once.unionByName(once), k=128).collect()[0]
    assert twice["sample"] == once.collect()[0]["sample"]


def test_nulls_counted_not_sampled(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, None), (3, 4.0), (4, None)],
        "doc_id long, x double",
    )
    row = quantile_ledger(df, "x", "doc_id", k=8).collect()[0]
    assert row["n_rows"] == 2 and row["n_null"] == 2
    assert sorted(s["v"] for s in row["sample"]) == [2.0, 4.0]
    assert (row["lo"], row["hi"]) == (2.0, 4.0)


def test_per_group_rows_and_validation(spark):
    df = _values(spark, 100, group="a").unionByName(
        _values(spark, 50, group="b", id_start=1000)
    )
    rows = {
        r["src"]: r
        for r in quantile_ledger(df, "x", "doc_id", by=["src"], k=16).collect()
    }
    assert rows["a"]["n_rows"] == 100 and rows["b"]["n_rows"] == 50
    assert len(rows["a"]["sample"]) == 16
    with pytest.raises(ValueError, match="k must be"):
        quantile_ledger(df, "x", "doc_id", k=0)
    with pytest.raises(ValueError, match="outside"):
        ledger_quantiles(quantile_ledger(df, "x", "doc_id", k=4), [1.5])


def test_salted_build_rank_stage_is_parallel(spark):
    """Plan hygiene for the scale fix: the rank window must sit on a
    salt-hash exchange (S-way parallel), never on a SinglePartition
    exchange — the shape that funneled the whole corpus through one
    task for global ledgers. (The one SinglePartition exchange that
    remains feeds the FINAL aggregation with pre-aggregated partials —
    one row per upstream partition, the standard global-agg tail.)"""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 1.0).alias("x")
    )
    plan = (
        quantile_ledger(df, "x", "doc_id", k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    win_at = plan.index("Window [row_number()")
    below_window = plan[win_at:]
    first_exchange = below_window[
        below_window.index("Exchange") :
    ].splitlines()[0]
    assert "hashpartitioning(__salt" in first_exchange, first_exchange
    assert "SinglePartition" not in first_exchange
