"""Incremental view maintenance over the upsert changefeed: after any
batch sequence (inserts, updates, deletes, GROUP-MOVING updates) the
maintained view equals a from-scratch recompute over read_current;
refresh is cursor-idempotent; zero-count groups leave the view; the
base table is never read by the refresh plan."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from data_pipeline_project_using_telegram_and_aws_spark.streaming.ivm import (
    read_view,
    refresh_grouped_view,
)
from data_pipeline_project_using_telegram_and_aws_spark.streaming.upsert import (
    read_current,
    upsert_batch,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("region", T.StringType()),
        T.StructField("balance", T.DoubleType()),
        T.StructField("deleted", T.BooleanType()),
    ]
)
VALUE_SCHEMA = "seq long, region string, balance double"


def _recompute(spark, table):
    return {
        (r["region"],): (r["n"], round(r["s"], 6))
        for r in read_current(spark, table)
        .groupBy("region")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("balance").alias("s"))
        .collect()
    }


def _view(spark, path):
    return {
        (r["region"],): (r["n_rows"], round(r["sum_balance"], 6))
        for r in read_view(spark, path).collect()
    }


def test_ivm_matches_recompute_through_moves_and_deletes(spark, tmp_path):
    table = str(tmp_path / "t")
    feed = str(tmp_path / "feed")
    view = str(tmp_path / "view")

    def up(rows, bid):
        upsert_batch(
            spark.createDataFrame(rows, SCHEMA), table, ["user_id"],
            "seq", n_buckets=4, delete_col="deleted",
            changefeed_path=feed, batch_id=bid,
        )

    # batch 0: inserts across two regions
    up(
        [
            (1, 1, "eu", 10.0, False),
            (2, 1, "us", 20.0, False),
            (3, 1, "us", 5.0, False),
        ],
        0,
    )
    assert refresh_grouped_view(
        spark, feed, view, ["region"], ["balance"], VALUE_SCHEMA
    ) == 1
    assert _view(spark, view) == _recompute(spark, table)

    # batch 1: value update, a GROUP MOVE (user 3 us→eu), an insert
    up(
        [
            (2, 2, "us", 25.0, False),
            (3, 2, "eu", 5.0, False),
            (4, 2, "apac", 7.0, False),
        ],
        1,
    )
    # batch 2: delete the only apac row (group must vanish)
    up([(4, 3, None, None, True)], 2)
    assert refresh_grouped_view(
        spark, feed, view, ["region"], ["balance"], VALUE_SCHEMA
    ) == 2
    got = _view(spark, view)
    assert got == _recompute(spark, table)
    assert ("apac",) not in got
    assert got[("eu",)] == (2, 15.0)
    assert got[("us",)] == (1, 25.0)

    # idempotent: nothing new → no-op, view unchanged
    assert refresh_grouped_view(
        spark, feed, view, ["region"], ["balance"], VALUE_SCHEMA
    ) == 0
    assert _view(spark, view) == got
