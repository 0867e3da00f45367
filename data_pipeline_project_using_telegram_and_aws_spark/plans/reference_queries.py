"""The five reference analytical queries (SURVEY.md §2.4/§2.6), translated
to the driver's ``events`` table as the ``telegram`` analog per BASELINE.md:

- ``message_id`` → ``event_id``; ``user_id`` → ``user_id``;
  ``text`` → ``props``; event time ``date`` (epoch) → ``ts`` (timestamp);
  partition ``context_date`` → ``CAST(ts AS DATE)``.

Reference citations (ipynb = the reference notebook JSON):
- q0: ``SELECT * FROM telegram LIMIT 10`` (ipynb:770, cell 50). The bare
  LIMIT returns arbitrary rows, so for oracle determinism we pin
  ``ORDER BY event_id`` — same operator surface (scan+limit, O3) plus
  top-k (TakeOrderedAndProject).
- q1: count by day (ipynb:817-824, cell 55).
- q2: count by user and day (ipynb:851-863, cell 58).
- q3: avg message length by user and day (ipynb:890-902, cell 61); the
  reference's ``CAST(AVG(..) AS INT)`` rounds in Presto but truncates in
  Spark, so both sides use explicit ROUND→cast (SURVEY §7 risk 1).
- q4: count by hour/weekday/weeknum via an epoch→timestamp CTE chain
  (ipynb:929-958, cell 64); dow uses the Presto ISO numbering shim.

All plans are single-pass partial+final hash aggregates over a parquet scan
— at 100 TB these shuffle only the (tiny) group-key space, and the scan
prunes to the grouping/projection columns (check ReadSchema in explain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.datetime_shims import from_unixtime_ts, presto_dow, presto_week
from ..sources.tables import load_table


def q0_full_scan_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.orderBy("event_id").limit(10)


def q1_daily_message_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("context_date"))
        .agg(F.count(F.lit(1)).alias("message_amount"))
        .orderBy(F.desc("context_date"))
    )


def q2_user_daily_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.to_date("ts").alias("context_date"))
        .agg(F.count(F.lit(1)).alias("message_amount"))
        .orderBy(F.desc("context_date"), F.asc("user_id"))
    )


def q3_user_daily_avg_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.to_date("ts").alias("context_date"))
        .agg(
            F.round(F.avg(F.length("props")))
            .cast("long")
            .alias("average_message_length")
        )
        .orderBy(F.desc("context_date"), F.asc("user_id"))
    )


def q4_hour_weekday_weeknum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mirrors the reference's two stacked CTEs: epoch → timestamp, then
    # scalar extraction, then group/count. ``ts`` round-trips through epoch
    # seconds to exercise the F5/F7 conversion chain.
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "parsed_date", from_unixtime_ts(F.unix_timestamp("ts"))
    )
    extracted = (
        parsed.withColumn("parsed_date_hour", F.hour("parsed_date").cast("long"))
        .withColumn("parsed_date_weekday", presto_dow(F.col("parsed_date")))
        .withColumn("parsed_date_weeknum", presto_week(F.col("parsed_date")))
    )
    return (
        extracted.groupBy(
            "parsed_date_hour", "parsed_date_weekday", "parsed_date_weeknum"
        )
        .agg(F.count(F.lit(1)).alias("message_amount"))
        .orderBy("parsed_date_weeknum", "parsed_date_weekday", "parsed_date_hour")
    )


QUERIES = {
    "q0_full_scan_limit": q0_full_scan_limit,
    "q1_daily_message_count": q1_daily_message_count,
    "q2_user_daily_count": q2_user_daily_count,
    "q3_user_daily_avg_len": q3_user_daily_avg_len,
    "q4_hour_weekday_weeknum": q4_hour_weekday_weeknum,
}

ORACLE = {
    "q0_full_scan_limit": """
        SELECT * FROM events ORDER BY event_id LIMIT 10
    """,
    "q1_daily_message_count": """
        SELECT CAST(ts AS DATE) AS context_date,
               COUNT(1) AS message_amount
        FROM events
        GROUP BY 1
        ORDER BY context_date DESC
    """,
    "q2_user_daily_count": """
        SELECT user_id,
               CAST(ts AS DATE) AS context_date,
               COUNT(1) AS message_amount
        FROM events
        GROUP BY 1, 2
        ORDER BY context_date DESC, user_id ASC
    """,
    "q3_user_daily_avg_len": """
        SELECT user_id,
               CAST(ts AS DATE) AS context_date,
               CAST(ROUND(AVG(LENGTH(props))) AS BIGINT) AS average_message_length
        FROM events
        GROUP BY 1, 2
        ORDER BY context_date DESC, user_id ASC
    """,
    "q4_hour_weekday_weeknum": """
        WITH parsed_date_cte AS (
            SELECT *,
                   make_timestamp(CAST(FLOOR(epoch(ts)) AS BIGINT) * 1000000)
                       AS parsed_date
            FROM events
        ),
        extracted AS (
            SELECT *,
                   CAST(hour(parsed_date) AS BIGINT) AS parsed_date_hour,
                   CAST(isodow(parsed_date) AS BIGINT) AS parsed_date_weekday,
                   CAST(weekofyear(parsed_date) AS BIGINT) AS parsed_date_weeknum
            FROM parsed_date_cte
        )
        SELECT parsed_date_hour, parsed_date_weekday, parsed_date_weeknum,
               COUNT(1) AS message_amount
        FROM extracted
        GROUP BY 1, 2, 3
        ORDER BY parsed_date_weeknum, parsed_date_weekday, parsed_date_hour
    """,
}
