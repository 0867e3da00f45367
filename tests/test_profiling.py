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


def test_robust_outlier_report(spark):
    from pyspark.sql import functions as F

    from data_pipeline_project_using_telegram_and_aws_spark.operators.profiling import (
        robust_outlier_report,
    )

    # tight normal-ish body plus planted extreme outliers
    body = spark.range(1000).select(
        (100.0 + (F.pmod(F.xxhash64("id"), 21) - 10)).alias("x")
    )
    poisoned = body.unionByName(
        spark.createDataFrame([(1e9,), (-1e9,), (5e8,)], "x double")
    )
    rep = robust_outlier_report(poisoned, "x", k=5.0).collect()[0]
    # the median/MAD ignore the poison entirely
    assert abs(rep["median"] - 100.0) <= 2
    assert 0 < rep["mad"] <= 10
    assert rep["n_above"] == 2 and rep["n_below"] == 1
    assert rep["n_rows"] == 1003
    # the fences sit near the body, nowhere near the poison
    assert rep["hi_fence"] < 200


def test_corpus_health_report(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_pipeline_project_using_telegram_and_aws_spark.operators.profiling import (
        corpus_health_report,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = docs.unionByName(
        docs.limit(1).withColumn("doc_id", F.lit(999_999))
    )  # one duplicate text under a fresh id
    rep = corpus_health_report(planted)
    n = docs.count()
    assert rep["n_rows"] == n + 1
    assert rep["n_distinct_ids"] == n + 1
    assert rep["n_distinct_texts"] <= n       # the plant collapsed
    assert rep["duplicate_text_ratio"] > 0
    assert rep["null_text_rate"] == 0.0
    p50, p90, p99 = rep["token_p50_p90_p99"]
    assert 0 < p50 <= p90 <= p99
    assert set(rep["per_group"]) == {
        r["source"] for r in docs.select("source").distinct().collect()
    }
    for g in rep["per_group"].values():
        assert g["n_rows"] > 0 and g["distinct_est"] > 0
