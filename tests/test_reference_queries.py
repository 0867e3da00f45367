"""Reference query analogs (SURVEY §2.4/§2.6) — shape and invariant tests.

Value-level correctness is covered by the DuckDB oracle gate
(tools/check_oracle.py, and the driver's CORRECTNESS run); these tests pin
schemas, ordering, and dialect-shim semantics fast at sf0.001.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.functions.datetime_shims import (
    presto_dow,
    presto_week,
    translate_mysql_datetime_pattern,
)
from data_pipeline_project_using_telegram_and_aws_spark.plans import reference_queries as rq


def test_q0_limit(spark, sf_dir):
    df = rq.q0_full_scan_limit(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 10
    assert [r.event_id for r in rows] == sorted(r.event_id for r in rows)


def test_q1_schema_and_order(spark, sf_dir):
    df = rq.q1_daily_message_count(spark, sf_dir)
    assert df.columns == ["context_date", "message_amount"]
    dates = [r.context_date for r in df.collect()]
    assert dates == sorted(dates, reverse=True)
    assert all(isinstance(d, datetime.date) for d in dates)


def test_q1_counts_sum_to_total(spark, sf_dir):
    total = rq.q1_daily_message_count(spark, sf_dir).agg(
        F.sum("message_amount")
    ).collect()[0][0]
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == n_events


def test_q4_dow_is_iso(spark):
    # 2024-01-01 was a Monday; 2024-01-07 a Sunday (ISO 1 and 7).
    df = spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("2024-01-07 10:00:00",)], ["s"]
    ).select(
        presto_dow(F.to_timestamp("s")).alias("dow"),
        presto_week(F.to_timestamp("s")).alias("week"),
    )
    rows = df.collect()
    assert [r.dow for r in rows] == [1, 7]
    assert [r.week for r in rows] == [1, 1]  # both in ISO week 1 of 2024


def test_mysql_pattern_translation():
    assert (
        translate_mysql_datetime_pattern("%Y-%m-%d %H:%i:%s")
        == "yyyy-MM-dd HH:mm:ss"
    )
    assert translate_mysql_datetime_pattern("%d/%m/%Y") == "dd/MM/yyyy"


def test_reference_date_format_matches_presto(spark):
    # the exact pattern the reference uses at ipynb:935
    from data_pipeline_project_using_telegram_and_aws_spark.functions.datetime_shims import (
        presto_date_format,
    )

    row = (
        spark.range(1)
        .select(
            presto_date_format(
                F.to_timestamp(F.lit("2024-03-05 07:08:09")),
                "%Y-%m-%d %H:%i:%s",
            ).alias("s")
        )
        .collect()[0]
    )
    assert row.s == "2024-03-05 07:08:09"
