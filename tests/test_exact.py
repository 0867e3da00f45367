"""functions/exact.py — the engine's float-determinism mechanism.

Every hash-checked SUM/AVG rides on these helpers, so they get their own
differential property test: Spark expression vs the DuckDB textual twin
on random doubles, plus partition-order invariance (the exact property
plain double sums lack).
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from data_pipeline_project_using_telegram_and_aws_spark.functions.exact import (
    exact_avg,
    exact_sum,
    sql_avg,
    sql_sum,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(min_value=0, max_value=2**31))
def test_exact_sum_avg_match_duckdb_twin(spark, seed):
    rng = random.Random(seed)
    vals = [
        rng.choice([1.0, -1.0]) * rng.random() * 10 ** rng.randint(0, 5)
        for _ in range(200)
    ] + [None]
    pdf = pd.DataFrame({"g": [i % 3 for i in range(len(vals))], "v": vals})

    got = {
        (r.g): (r.s, r.a)
        for r in spark.createDataFrame(pdf)
        .groupBy("g")
        .agg(exact_sum("v").alias("s"), exact_avg("v", 4).alias("a"))
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        row[0]: (row[1], row[2])
        for row in con.execute(
            f"SELECT g, {sql_sum('v')} AS s, {sql_avg('v', 4)} AS a "
            "FROM t GROUP BY g"
        ).fetchall()
    }
    # exact equality of the doubles, not approximate — that's the point
    assert got == want


def test_exact_sum_is_partition_order_invariant(spark):
    vals = [((-1) ** i) * (i * 0.1 + 1e-7) for i in range(1000)]
    pdf = pd.DataFrame({"v": vals})
    one = (
        spark.createDataFrame(pdf).coalesce(1).agg(exact_sum("v").alias("s"))
    ).collect()[0].s
    many = (
        spark.createDataFrame(pdf)
        .repartition(17)
        .agg(exact_sum("v").alias("s"))
    ).collect()[0].s
    rev = (
        spark.createDataFrame(pdf.iloc[::-1])
        .repartition(5)
        .agg(exact_sum("v").alias("s"))
    ).collect()[0].s
    assert one == many == rev
