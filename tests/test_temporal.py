"""Unit tests for the temporal operators (as-of join, binned range join,
time_bucket) — semantics pinned on tiny hand-computed inputs, including
the tie/boundary/no-match edge cases the big oracle queries can miss."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators import asof as A


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-05 00:00:00"), "e1"),
         (1, _ts("2024-01-01 00:00:00"), "e2"),
         (2, _ts("2024-01-03 00:00:00"), "e3")],
        "k long, t timestamp, ev string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-02 00:00:00"), 100),
         (1, _ts("2024-01-04 00:00:00"), 200),
         (3, _ts("2024-01-01 00:00:00"), 999)],
        "rk long, rt timestamp, val int",
    )
    out = A.asof_join(
        left, right, "k", "rk", "t", "rt", ["val"]
    ).orderBy("ev").collect()
    # e1@01-05 sees 01-04's 200; e2@01-01 predates all -> null; key 2 has
    # no right rows at all -> null
    assert [(r.ev, r.val) for r in out] == [("e1", 200), ("e2", None), ("e3", None)]


def test_asof_equal_ts_inclusive_vs_strict(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-02 00:00:00"), "e")], "k long, t timestamp, ev string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-02 00:00:00"), 7), (1, _ts("2024-01-01 00:00:00"), 3)],
        "rk long, rt timestamp, val int",
    )
    inc = A.asof_join(left, right, "k", "rk", "t", "rt", ["val"]).collect()
    assert inc[0].val == 7  # ts == matches when include_equal
    strict = A.asof_join(
        left, right, "k", "rk", "t", "rt", ["val"], include_equal=False
    ).collect()
    assert strict[0].val == 3  # strictly-before row wins


def test_asof_matches_duckdb_oracle_shape(spark):
    """The q33 oracle at sf0.001 — spot-check the union-window against
    DuckDB ASOF JOIN on real data (full hash parity runs in the driver)."""
    import duckdb

    from data_pipeline_project_using_telegram_and_aws_spark.plans.temporal_queries import (
        ORACLE,
        q33_asof_join_last_order,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r.event_id: (r.last_orderkey, r.last_order_date)
        for r in q33_asof_join_last_order(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    want = {
        row[0]: (row[2], row[3])
        for row in con.execute(ORACLE["q33_asof_join_last_order"]).fetchall()
    }
    assert got == want


def test_binned_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 0.0), (2, 49.999), (3, 50.0), (4, 150.0)], "id long, v double"
    )
    right = spark.createDataFrame(
        [(10, 0.0, 50.0), (20, 50.0, 100.0)], "band long, lo double, hi double"
    )
    out = A.binned_range_join(left, "v", right, "lo", "hi", 50.0)
    got = sorted((r.id, r.band) for r in out.collect())
    # lo inclusive, hi exclusive; 150.0 falls in no band
    assert got == [(1, 10), (2, 10), (3, 20)]


def test_binned_range_join_wide_interval_no_dup(spark):
    """An interval spanning many bins must still match each row once."""
    left = spark.createDataFrame([(1, 75.0)], "id long, v double")
    right = spark.createDataFrame([(9, 0.0, 1000.0)], "band long, lo double, hi double")
    out = A.binned_range_join(left, "v", right, "lo", "hi", 50.0).collect()
    assert [(r.id, r.band) for r in out] == [(1, 9)]


def test_time_bucket(spark):
    df = spark.createDataFrame(
        [(_ts("2024-01-01 00:22:11"),), (_ts("2024-01-01 00:44:59"),)],
        "t timestamp",
    )
    got = [r.b for r in df.select(A.time_bucket(F.col("t"), 900).alias("b")).collect()]
    assert got == [_ts("2024-01-01 00:15:00"), _ts("2024-01-01 00:30:00")]


def test_asof_null_value_and_null_ts_semantics(spark):
    """A matched right row whose value is legitimately NULL must stay NULL
    (not leak the previous row's value), and right rows with NULL ts must
    never match (DuckDB ASOF semantics)."""
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 02:00:00"))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01 00:00:00"), 100),   # older, value present
            ("k", _ts("2024-01-01 01:00:00"), None),  # newest match, NULL value
            ("k", None, 999),                          # NULL ts: never matches
        ],
        "k string, rts timestamp, v long",
    )
    out = A.asof_join(
        left, right, "k", "k", "ts", "rts", ["v", "rts"]
    ).collect()
    assert len(out) == 1
    # the newest matching row (01:00) wins atomically: v is its NULL, not 100
    assert out[0].v is None
    assert out[0].rts == _ts("2024-01-01 01:00:00")


def test_asof_bucketed_matches_duckdb_on_skewed_fixture(spark):
    """The time-chunk skew guard must preserve exact ASOF semantics: one
    hot key with 2000 events + sparse cold keys, checked row-for-row
    against DuckDB ASOF LEFT JOIN and against the unbucketed plan."""
    import duckdb
    import pandas as pd

    base = _ts("2024-01-01 00:00:00")
    lrows = [(i, "hot", base + pd.Timedelta(seconds=37 * i)) for i in range(2000)]
    lrows += [(10_000 + i, f"cold{i}", base + pd.Timedelta(hours=i)) for i in range(5)]
    rrows = [("hot", base + pd.Timedelta(seconds=600 * j), j) for j in range(120)]
    rrows += [("cold3", base + pd.Timedelta(minutes=90), 777)]
    lpdf = pd.DataFrame(lrows, columns=["id", "k", "ts"])
    rpdf = pd.DataFrame(rrows, columns=["k", "rts", "v"])

    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    plain = A.asof_join(left, right, "k", "k", "ts", "rts", ["v"])
    bucketed = A.asof_join(
        left, right, "k", "k", "ts", "rts", ["v"], bucket_seconds=3600
    )
    got_plain = {(r.id): (r.v,) for r in plain.collect()}
    got_bucketed = {(r.id): (r.v,) for r in bucketed.collect()}
    assert got_bucketed == got_plain

    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)
    oracle = {
        row[0]: (row[1],)
        for row in con.execute(
            "SELECT l.id, r.v FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.ts >= r.rts"
        ).fetchall()
    }
    assert got_bucketed == oracle


def test_asof_bucketed_keeps_null_left_ts_rows(spark):
    """LEFT-join semantics must not depend on the skew-guard tuning flag:
    a left row with NULL ts is kept (NULL right columns) by the plain
    path, and the bucketed path must do the same — it used to drop the
    row because NULL chunks never matched the plain equi-join."""
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 02:00:00")),
         (2, "k", None),
         (3, "nokey", None)],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01 01:00:00"), 7)],
        "k string, rts timestamp, v long",
    )
    plain = A.asof_join(left, right, "k", "k", "ts", "rts", ["v"])
    bucketed = A.asof_join(
        left, right, "k", "k", "ts", "rts", ["v"], bucket_seconds=3600
    )
    want = {(1, 7), (2, None), (3, None)}
    assert {(r.id, r.v) for r in plain.collect()} == want
    assert {(r.id, r.v) for r in bucketed.collect()} == want


def test_interval_overlap_join_matches_brute_force(spark):
    """Binned interval×interval overlap equals the cross-join reference,
    with no duplicate pairs even when a pair shares several bins."""
    import random

    from data_pipeline_project_using_telegram_and_aws_spark.operators.asof import (
        interval_overlap_join,
    )

    rng = random.Random(3)
    lrows = []
    for i in range(80):
        s = rng.uniform(0, 1000)
        lrows.append((i, s, s + rng.uniform(1, 120)))
    rrows = []
    for j in range(60):
        s = rng.uniform(0, 1000)
        rrows.append((j, s, s + rng.uniform(1, 120)))
    left = spark.createDataFrame(lrows, "l_id long, l_s double, l_e double")
    right = spark.createDataFrame(rrows, "r_id long, r_s double, r_e double")

    got = [
        (r.l_id, r.r_id)
        for r in interval_overlap_join(
            left, right, "l_s", "l_e", "r_s", "r_e", bin_width=50.0
        ).collect()
    ]
    expected = {
        (i, j)
        for i, ls, le in lrows
        for j, rs, re_ in rrows
        if rs <= le and ls <= re_
    }
    assert len(got) == len(set(got))  # owner-bin dedup: no duplicates
    assert set(got) == expected
    assert expected  # non-trivial case


def test_interval_overlap_join_rejects_colliding_names(spark):
    import pytest as _pytest

    from data_pipeline_project_using_telegram_and_aws_spark.operators.asof import (
        interval_overlap_join,
    )

    df = spark.createDataFrame([(1, 0.0, 1.0)], "id long, s double, e double")
    with _pytest.raises(ValueError):
        interval_overlap_join(df, df, "s", "e", "s", "e", 10.0)


def test_asof_forward_basic_ties_and_skew_guard(spark):
    """Forward direction: earliest right row at-or-after each left
    row; strict mode excludes the equal-timestamp row; the chunked
    skew-guard path returns identical rows; time-reversal consistency
    with an independent Python recompute."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-05 00:00:00"), "e1"),
         (1, _ts("2024-01-01 00:00:00"), "e2"),
         (1, _ts("2024-01-02 00:00:00"), "e3"),   # exact tie with right
         (2, _ts("2024-01-03 00:00:00"), "e4")],
        "k long, t timestamp, ev string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-02 00:00:00"), 100),
         (1, _ts("2024-01-04 00:00:00"), 200),
         (3, _ts("2024-01-01 00:00:00"), 999)],
        "rk long, rt timestamp, val int",
    )
    out = {
        r.ev: r.val
        for r in A.asof_join_forward(
            left, right, "k", "rk", "t", "rt", ["val"]
        ).collect()
    }
    # e1@01-05 has no future right row; e2@01-01 → 01-02's 100;
    # e3@01-02 ties → inclusive picks 100; key 2 has no rights
    assert out == {"e1": None, "e2": 100, "e3": 100, "e4": None}

    strict = {
        r.ev: r.val
        for r in A.asof_join_forward(
            left, right, "k", "rk", "t", "rt", ["val"],
            include_equal=False,
        ).collect()
    }
    assert strict["e3"] == 200  # the tie row is invisible; next wins

    # python reference over the cross product
    lrows = [(r.k, r.t, r.ev) for r in left.collect()]
    rrows = [(r.rk, r.rt, r.val) for r in right.collect()]
    for k, t, ev in lrows:
        future = [(rt, v) for rk, rt, v in rrows if rk == k and rt >= t]
        want = min(future)[1] if future else None
        assert out[ev] == want, (ev, out[ev], want)

    # chunked skew-guard path: identical output
    bucketed = {
        r.ev: r.val
        for r in A.asof_join_forward(
            left, right, "k", "rk", "t", "rt", ["val"],
            bucket_seconds=3600,
        ).collect()
    }
    assert bucketed == out
    # left schema preserved (no helper columns leak)
    cols = A.asof_join_forward(
        left, right, "k", "rk", "t", "rt", ["val"]
    ).columns
    assert cols == ["k", "t", "ev", "val"]
