"""Snapshot algebra pins: keep-latest with deterministic tie-breaks and
tombstones, diff labels exactly the changed keys, NULL-vs-string
disambiguation, and layout stability."""

from __future__ import annotations

import json

import pytest

from data_pipeline_project_using_telegram_and_aws_spark.operators.snapshots import (
    latest_snapshot,
    snapshot_diff,
)


def test_latest_snapshot_and_tombstones(spark):
    log = spark.createDataFrame(
        [
            (1, 1, "v1", False),
            (1, 3, "v3", False),
            (1, 2, "v2", False),
            (2, 1, "x1", False),
            (2, 2, None, True),    # delete wins over the older upsert
            (3, 1, None, True),
            (3, 2, "resurrected", False),  # upsert AFTER delete wins
        ],
        ["k", "seq", "v", "deleted"],
    )
    snap = {
        r["k"]: r["v"]
        for r in latest_snapshot(
            log, ["k"], "seq", delete_col="deleted"
        ).collect()
    }
    assert snap == {1: "v3", 3: "resurrected"}
    # without tombstone handling, key 2's delete row itself wins
    raw = {
        r["k"]: r["seq"]
        for r in latest_snapshot(log, ["k"], "seq").collect()
    }
    assert raw == {1: 3, 2: 2, 3: 2}
    with pytest.raises(ValueError):
        latest_snapshot(log, [], "seq")


def test_snapshot_diff_labels(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        ["k", "s", "n"],
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "NULL", 40), (5, "e", 50)],
        ["k", "s", "n"],
    )
    diff = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(diff) == {2, 3, 4, 5}          # key 1 unchanged: no row
    assert diff[2]["change"] == "changed"
    assert diff[3]["change"] == "removed"
    assert diff[5]["change"] == "added"
    # NULL and the string "NULL" are different values, not a no-op
    assert diff[4]["change"] == "changed"
    # audit payloads round-trip
    assert json.loads(diff[2]["old_values"]) == {"s": "b", "n": 20}
    assert json.loads(diff[2]["new_values"]) == {"s": "B", "n": 20}
    assert diff[5]["old_values"] is None


def test_diff_ignores_column_order_but_not_schema(spark):
    old = spark.createDataFrame([(1, "a", 10)], ["k", "s", "n"])
    new = spark.createDataFrame([(1, 10, "a")], ["k", "n", "s"])
    assert snapshot_diff(old, new, ["k"]).count() == 0
    other = spark.createDataFrame([(1, "a")], ["k", "different"])
    with pytest.raises(ValueError, match="disagree"):
        snapshot_diff(old, other, ["k"])


def test_day_over_day_composition(spark):
    """The intended workflow: two log prefixes → two snapshots → the
    diff is exactly the keys whose winner changed."""
    rows = [
        (1, 1, "a"), (2, 1, "b"), (1, 2, "a2"), (3, 2, "c"),
    ]
    log = spark.createDataFrame(rows, ["k", "seq", "v"])
    day1 = latest_snapshot(log.filter("seq <= 1"), ["k"], "seq")
    day2 = latest_snapshot(log, ["k"], "seq")
    diff = {r["k"]: r["change"] for r in snapshot_diff(day1, day2, ["k"]).collect()}
    assert diff == {1: "changed", 3: "added"}
