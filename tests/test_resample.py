"""Resample pins: gaps appear with the right fills, per-group spans
stay independent, the stray-bucket guard fires, stride works, and the
observed flag audits imputation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.resample import (
    resample,
)


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        # user A: days 10, 13, 14 observed (gap 11-12)
        ("a", 10, 5, 1.0),
        ("a", 13, 2, 4.0),
        ("a", 14, 7, 2.0),
        # user B: a single day — span of one, nothing imputed
        ("b", 20, 1, 9.0),
    ]
    return spark.createDataFrame(rows, ["user", "day", "n", "level"])


def test_fills_and_observed_flag(series):
    out = resample(
        series, "day", by=["user"], zero_fill=["n"], ffill=["level"]
    )
    rows = {
        (r["user"], r["day"]): r
        for r in out.collect()
    }
    assert set(rows) == {("a", d) for d in range(10, 15)} | {("b", 20)}
    assert rows[("a", 11)]["n"] == 0 and not rows[("a", 11)]["__observed"]
    assert rows[("a", 11)]["level"] == 1.0        # forward-filled
    assert rows[("a", 12)]["level"] == 1.0
    assert rows[("a", 13)]["level"] == 4.0        # observation resumes
    assert rows[("a", 10)]["__observed"] and rows[("b", 20)]["__observed"]
    # group spans are independent: no (a, 20) or (b, 10)
    assert ("a", 20) not in rows and ("b", 10) not in rows


def test_global_series_and_stride(spark):
    df = spark.createDataFrame(
        [(0, 3), (4, 1), (8, 2)], ["hour2", "n"]
    )
    out = resample(df, "hour2", step=2, zero_fill=["n"]).collect()
    got = {r["hour2"]: r["n"] for r in out}
    assert got == {0: 3, 2: 0, 4: 1, 6: 0, 8: 2}


def test_stray_bucket_guard(spark):
    df = spark.createDataFrame(
        [(0, 1), (10_000_000, 1)], ["day", "n"]
    )
    with pytest.raises(Exception, match="max_buckets_per_group"):
        resample(df, "day", zero_fill=["n"]).collect()


def test_daily_count_densification(spark, sf_dir):
    """The q1 use case: daily counts over events — every day in the
    span appears, observed days keep their exact counts."""
    from data_pipeline_project_using_telegram_and_aws_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    dense = resample(daily, "day", zero_fill=["n"])
    lo, hi = daily.agg(F.min("day"), F.max("day")).collect()[0]
    assert dense.count() == hi - lo + 1
    sparse = {r["day"]: r["n"] for r in daily.collect()}
    for r in dense.collect():
        assert r["n"] == sparse.get(r["day"], 0)
