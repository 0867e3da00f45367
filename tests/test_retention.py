"""Retention pins: typed cutoff comparison (int vs string dates),
dry-run safety, directory-level deletion, and loud failure on missing
or unpartitioned paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.sources.retention import (
    expire_partitions,
    list_partitions,
)


@pytest.fixture()
def day_table(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(400).select(
        F.concat(
            F.lit("2026-01-"),
            F.lpad((F.col("id") % 4 + 1).cast("string"), 2, "0"),
        ).alias("day"),
        F.col("id").alias("v"),
    )
    df.write.partitionBy("day").parquet(path)
    return path


def test_expire_by_date_string(spark, day_table):
    assert list_partitions(day_table, "day") == [
        "2026-01-01", "2026-01-02", "2026-01-03", "2026-01-04",
    ]
    report = expire_partitions(day_table, "day", "2026-01-03")
    assert [r["value"] for r in report] == ["2026-01-01", "2026-01-02"]
    assert all(r["deleted"] and r["n_files"] > 0 for r in report)
    assert list_partitions(day_table, "day") == ["2026-01-03", "2026-01-04"]
    # surviving data still reads cleanly
    assert spark.read.parquet(day_table).count() == 200


def test_dry_run_touches_nothing(spark, day_table):
    report = expire_partitions(
        day_table, "day", "2026-01-04", dry_run=True
    )
    assert len(report) == 3 and not any(r["deleted"] for r in report)
    assert len(list_partitions(day_table, "day")) == 4


def test_integer_partitions_compare_numerically(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(30).select(
        (F.col("id") % 3 * 50).alias("hour"), F.col("id").alias("v")
    ).write.partitionBy("hour").parquet(path)
    # values 0, 50, 100: a STRING compare would sort "100" < "50" and
    # wrongly expire it at cutoff "50"
    report = expire_partitions(path, "hour", 50)
    assert [r["value"] for r in report] == ["0"]
    assert sorted(list_partitions(path, "hour"), key=int) == ["50", "100"]


def test_loud_failures(tmp_path):
    with pytest.raises(FileNotFoundError):
        list_partitions(str(tmp_path / "nope"), "day")
    (tmp_path / "flat").mkdir()
    with pytest.raises(ValueError, match="no day="):
        list_partitions(str(tmp_path / "flat"), "day")
