from __future__ import annotations

from data_pipeline_project_using_telegram_and_aws_spark.operators.profiling import (
    profile_columns,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", None),
            (3, "a", 30.0),
            (4, None, 40.0),
        ],
        "id long, tag string, v double",
    )


def test_profile_single_pass_stats(spark):
    prof = {r["column"]: r for r in profile_columns(_df(spark)).collect()}
    assert set(prof) == {"id", "tag", "v"}
    assert all(r["n_rows"] == 4 for r in prof.values())
    assert prof["tag"]["n_nulls"] == 1 and prof["tag"]["null_frac"] == 0.25
    assert prof["v"]["n_nulls"] == 1
    assert prof["id"]["n_nulls"] == 0
    # HLL at tiny cardinality is exact
    assert prof["tag"]["approx_distinct"] == 2
    assert prof["id"]["approx_distinct"] == 4
    assert prof["id"]["min_repr"] == "1" and prof["id"]["max_repr"] == "4"
    assert prof["v"]["min_repr"] == "10.0" and prof["v"]["max_repr"] == "40.0"


def test_profile_is_one_job_one_scan(spark):
    df = _df(spark)
    plan = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    # one scan feeding one partial+final aggregate: a per-column
    # implementation would show several scans
    assert plan.count("Scan ExistingRDD") <= 1


def test_profile_column_subset(spark):
    rows = profile_columns(_df(spark), cols=["tag"]).collect()
    assert [r["column"] for r in rows] == ["tag"]
