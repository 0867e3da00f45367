"""Streaming-join tests: watermarked interval stream-stream join (match
inside the bound, no match outside it) and stream-static broadcast
enrichment."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.streaming.joins import (
    enrich_with_dim,
    interval_join,
)


def _write_batch(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain(stream_df, out_dir, checkpoint):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_interval_join_matches_only_within_bound(spark, tmp_path):
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    _write_batch(
        imp_dir,
        "b1.json",
        [
            {"ad_id": 1, "l_ts": "2024-01-01 00:00:00"},
            {"ad_id": 2, "l_ts": "2024-01-01 00:00:00"},
            {"ad_id": 3, "l_ts": "2024-01-01 00:00:00"},
        ],
    )
    _write_batch(
        clk_dir,
        "b1.json",
        [
            # inside the 15-minute bound -> matches
            {"ad_id": 1, "r_ts": "2024-01-01 00:10:00"},
            # outside the bound -> no match
            {"ad_id": 2, "r_ts": "2024-01-01 00:20:00"},
            # before the impression -> no match
            {"ad_id": 3, "r_ts": "2023-12-31 23:55:00"},
        ],
    )
    imps = spark.readStream.schema("ad_id long, l_ts timestamp").json(imp_dir)
    clks = spark.readStream.schema("ad_id long, r_ts timestamp").json(clk_dir)
    joined = interval_join(imps, clks, "ad_id", "15 minutes")
    out = str(tmp_path / "out")
    _drain(joined, out, str(tmp_path / "ckpt"))
    rows = spark.read.parquet(out).collect()
    assert [(r.ad_id) for r in rows] == [1]
    assert set(spark.read.parquet(out).columns) == {"ad_id", "l_ts", "r_ts"}


def test_enrich_with_dim_broadcasts_and_keeps_unmatched(spark, tmp_path):
    ev_dir = str(tmp_path / "ev")
    _write_batch(
        ev_dir,
        "b1.json",
        [
            {"nation_key": 0, "v": 10},
            {"nation_key": 999, "v": 20},  # no dim row -> NULL name
        ],
    )
    dim = spark.createDataFrame(
        [(0, "ALGERIA")], "nation_key long, n_name string"
    )
    stream = spark.readStream.schema("nation_key long, v long").json(ev_dir)
    enriched = enrich_with_dim(stream, dim, "nation_key")
    out = str(tmp_path / "out")
    _drain(enriched, out, str(tmp_path / "ckpt"))
    got = {r.nation_key: r.n_name for r in spark.read.parquet(out).collect()}
    assert got == {0: "ALGERIA", 999: None}


def test_interval_join_rejects_colliding_timestamp_names(spark):
    """The predicate is built from raw column names — colliding names
    would silently compare a column to itself, so the operator refuses."""
    import pytest

    from data_pipeline_project_using_telegram_and_aws_spark.streaming.joins import interval_join

    a = spark.createDataFrame([], "k long, ts timestamp")
    b = spark.createDataFrame([], "k long, ts timestamp")
    with pytest.raises(ValueError, match="must differ"):
        interval_join(a, b, "k", left_ts="ts", right_ts="ts")
    c = spark.createDataFrame([], "k long, l_ts timestamp, r_ts timestamp")
    d = spark.createDataFrame([], "k long, r_ts timestamp")
    with pytest.raises(ValueError, match="side-unique"):
        interval_join(c, d, "k", left_ts="l_ts", right_ts="r_ts")
