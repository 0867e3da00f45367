"""End-to-end pipeline test (SURVEY §5 plan item 2).

Synthetic raw Telegram updates (FIXTURES.md schema R) → streaming ingest
(filter + raw zone) → daily batch ETL (flatten + compact) → catalog
registration → the five reference queries with hand-computed goldens.
"""

from __future__ import annotations

import datetime as dt
import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.plans.telegram_queries import (
    run_telegram_query,
)
from data_pipeline_project_using_telegram_and_aws_spark.schemas import ENRICHED_COLUMNS
from data_pipeline_project_using_telegram_and_aws_spark.sources.lake import TelegramLake
from data_pipeline_project_using_telegram_and_aws_spark.streaming.etl_job import run_daily_etl
from data_pipeline_project_using_telegram_and_aws_spark.streaming.ingest import (
    start_ingest_stream,
)

CHAT_ID = -4000

# epoch seconds: 2024-01-01 (Mon, ISO week 1) and 2024-01-07 (Sun, week 1)
T_MON_10 = 1704103200  # 2024-01-01 10:00:00 UTC
T_MON_23 = 1704150000  # 2024-01-01 23:00:00 UTC
T_SUN_05 = 1704606621  # 2024-01-07 05:50:21 UTC


def _update(uid, mid, user, date, text=..., chat_id=CHAT_ID, bot=False):
    msg = {
        "message_id": mid,
        "from": {"id": user[0], "is_bot": bot, "first_name": user[1]},
        "chat": {"id": chat_id, "type": "group"},
        "date": date,
    }
    if text is not ...:
        msg["text"] = text
    return {"update_id": uid, "message": msg}


UPDATES = [
    _update(1, 10, (1, "ada"), T_MON_10, "hello"),          # len 5
    _update(2, 11, (1, "ada"), T_MON_10, "worlds!"),        # len 7 → avg 6
    _update(3, 12, (2, "bob"), T_MON_23),                   # sticker → NULL text
    _update(4, 13, (2, "bob"), T_SUN_05, "hi"),             # len 2
    _update(5, 14, (9, "eve"), T_SUN_05, "spy", chat_id=-9999),  # foreign chat → dropped
]


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lake"))
    landing = os.path.join(root, "landing")
    os.makedirs(landing)
    for u in UPDATES:
        with open(os.path.join(landing, f"u{u['update_id']}.json"), "w") as f:
            json.dump(u, f)

    lk = TelegramLake(root, chat_id=CHAT_ID)
    q = start_ingest_stream(
        spark, lk, landing, os.path.join(root, "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    today = lk.today()  # pipeline clock (UTC-3, reference ipynb:310)
    n = run_daily_etl(spark, lk, context_date=today)
    assert n == 4  # foreign-chat update dropped at ingest (P1)
    lk.register_table(spark, "telegram")
    return lk


def test_raw_zone_partitioned_by_arrival_date(spark, lake):
    # ST3: context_date is processing time on the UTC-3 pipeline clock —
    # all rows land in today's partition regardless of event time
    # (which spans 2024-01-01..07)
    today = lake.today()
    parts = {
        os.path.basename(p)
        for p in glob.glob(f"{lake.raw_path}/context_date=*")
    }
    assert parts == {f"context_date={today}"}


def test_enriched_schema_matches_ddl(spark, lake):
    df = lake.read_enriched(spark)
    assert set(df.columns) == set(ENRICHED_COLUMNS) | {"context_date"}
    types = dict(df.dtypes)
    assert types["message_id"] == "bigint"
    assert types["user_is_bot"] == "boolean"
    assert types["text"] == "string"
    assert types["date"] == "bigint"
    assert types["context_date"] == "date"


def test_compaction_one_file_per_partition(spark, lake):
    files = glob.glob(f"{lake.enriched_path}/context_date=*/*.parquet")
    assert len(files) == 1  # X4 invariant at reference scale


def test_etl_rerun_is_idempotent(spark, lake):
    run_daily_etl(spark, lake, context_date=lake.today())
    assert lake.read_enriched(spark).count() == 4  # ST4: no duplication
    files = glob.glob(f"{lake.enriched_path}/context_date=*/*.parquet")
    assert len(files) == 1


def test_select_limit(spark, lake):
    assert len(run_telegram_query(spark, "select_limit").collect()) == 4


def test_daily_count(spark, lake):
    rows = run_telegram_query(spark, "daily_count").collect()
    assert [(r.context_date, r.message_amount) for r in rows] == [
        (lake.today(), 4)
    ]


def test_user_daily_count(spark, lake):
    rows = run_telegram_query(spark, "user_daily_count").collect()
    got = {(r.user_id, r.user_first_name): r.message_amount for r in rows}
    assert got == {(1, "ada"): 2, (2, "bob"): 2}


def test_user_daily_avg_len_skips_nulls(spark, lake):
    rows = run_telegram_query(spark, "user_daily_avg_len").collect()
    got = {r.user_id: r.average_message_length for r in rows}
    # ada: (5+7)/2 = 6; bob: AVG skips the NULL sticker row → 2, not 1
    assert got == {1: 6, 2: 2}


def test_hour_weekday_weeknum(spark, lake):
    rows = run_telegram_query(spark, "hour_weekday_weeknum").collect()
    got = {
        (r.parsed_date_hour, r.parsed_date_weekday, r.parsed_date_weeknum):
        r.message_amount
        for r in rows
    }
    # Mon 2024-01-01 10:00 ×2, Mon 23:00 ×1 (ISO dow 1), Sun 05:xx ×1 (dow 7)
    assert got == {(10, 1, 1): 2, (23, 1, 1): 1, (5, 7, 1): 1}
    # ordering: weeknum then weekday (reference ORDER BY)
    keys = [(r.parsed_date_weeknum, r.parsed_date_weekday) for r in rows]
    assert keys == sorted(keys)


def test_arrival_date_is_utc_minus_3(spark):
    """Reference fidelity (ipynb:310): the partition clock is UTC-3, so a
    message arriving 01:00 UTC belongs to the PREVIOUS day's partition."""
    from data_pipeline_project_using_telegram_and_aws_spark.sources.lake import arrival_date

    df = spark.createDataFrame(
        [("2024-01-02 01:00:00",), ("2024-01-02 03:00:00",),
         ("2024-01-02 02:59:59",)],
        ["ts_utc"],
    ).select(
        arrival_date(F.col("ts_utc").cast("timestamp")).alias("d")
    )
    got = [str(r.d) for r in df.collect()]
    assert got == ["2024-01-01", "2024-01-02", "2024-01-01"]


def test_persistent_catalog_table_survives_sessions(spark, lake):
    """S9 complete: CREATE TABLE ... USING PARQUET LOCATION + MSCK. The
    catalog table (unlike a temp view) is visible from a NEW session."""
    lake.register_persistent_table(spark, "telegram_ext")
    assert spark.table("telegram_ext").count() == 4

    fresh = spark.newSession()
    try:
        # temp views are session-scoped and must NOT leak...
        assert "telegram" not in [
            t.name for t in fresh.catalog.listTables()
            if t.tableType == "TEMPORARY"
        ]
        # ...but the catalog table is there, partitions recovered
        rows = fresh.sql(
            "SELECT context_date, COUNT(1) AS n FROM telegram_ext GROUP BY 1"
        ).collect()
        assert [(r.context_date, r.n) for r in rows] == [(lake.today(), 4)]
    finally:
        spark.sql("DROP TABLE IF EXISTS telegram_ext")


def test_etl_empty_rerun_reports_zero_and_keeps_good_data_by_default(
    spark, tmp_path, caplog
):
    """Re-running a day whose raw input vanished must not report the
    PREVIOUS run's rows as this run's output — but a transient empty
    upstream export must not silently destroy a good load either
    (round-5 ADVICE): the default keeps the existing partition and
    warns loudly; deletion is the opt-in strict-idempotency mode."""
    import logging
    import shutil

    lk = TelegramLake(str(tmp_path), chat_id=CHAT_ID)
    today = lk.today()
    part = f"{lk.raw_path}/context_date={today}"
    os.makedirs(part)
    with open(os.path.join(part, "b.json"), "w") as f:
        for u in UPDATES[:2]:
            f.write(json.dumps(u) + "\n")
    assert run_daily_etl(spark, lk, context_date=today) == 2

    shutil.rmtree(part)
    with caplog.at_level(logging.WARNING):
        assert run_daily_etl(spark, lk, context_date=today) == 0
    # the good 2-row partition survives, and the divergence is loud
    assert glob.glob(f"{lk.enriched_path}/context_date={today}") != []
    assert any("keeping it" in r.message for r in caplog.records)


def test_etl_empty_rerun_clears_stale_partition_when_opted_in(spark, tmp_path):
    """overwrite_on_empty=True restores strict input-mirroring: the
    empty re-run deletes the target partition (dynamic partition
    overwrite alone would leave the old files to be footer-counted as
    fresh output)."""
    import shutil

    lk = TelegramLake(str(tmp_path), chat_id=CHAT_ID)
    today = lk.today()
    part = f"{lk.raw_path}/context_date={today}"
    os.makedirs(part)
    with open(os.path.join(part, "b.json"), "w") as f:
        for u in UPDATES[:2]:
            f.write(json.dumps(u) + "\n")
    assert run_daily_etl(spark, lk, context_date=today) == 2

    shutil.rmtree(part)
    assert (
        run_daily_etl(spark, lk, context_date=today, overwrite_on_empty=True)
        == 0
    )
    assert glob.glob(f"{lk.enriched_path}/context_date={today}") == []


def test_enriched_schema_evolution_reads_union_with_merge(spark, tmp_path):
    """The day the pipeline grows a column, earlier partitions lack the
    field; merge_schema=True returns the union schema with NULLs for
    pre-evolution days while the default read stays cheap for
    schema-stable zones."""
    from data_pipeline_project_using_telegram_and_aws_spark.sources.lake import (
        TelegramLake,
    )

    lk = TelegramLake(str(tmp_path))
    old = spark.createDataFrame(
        [(1, "hi", "2024-01-01")], ["message_id", "text", "context_date"]
    ).withColumn("context_date", F.to_date("context_date"))
    new = spark.createDataFrame(
        [(2, "yo", "reply", "2024-01-02")],
        ["message_id", "text", "reply_kind", "context_date"],
    ).withColumn("context_date", F.to_date("context_date"))
    (
        old.write.mode("overwrite").partitionBy("context_date")
        .parquet(lk.enriched_path)
    )
    (
        new.write.mode("append").partitionBy("context_date")
        .parquet(lk.enriched_path)
    )

    merged = lk.read_enriched(spark, merge_schema=True)
    assert "reply_kind" in merged.columns
    rows = {r.message_id: r for r in merged.collect()}
    assert rows[1].reply_kind is None and rows[2].reply_kind == "reply"
    assert len(rows) == 2
