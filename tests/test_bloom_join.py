"""Runtime bloom-filter join pruning (Spark's own, pinned working):
a selective dimension filter injects a bloom semi-filter on the fact
side BEFORE the join shuffle — at 100 TB this is the difference
between shuffling every lineitem row and shuffling only probable
matches. The thresholds that gate it at toy scale are the documented
dials; results must be identical either way."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.sources.tables import load_table


@pytest.fixture()
def tuned(spark):
    """The dials: injection requires the probe (fact) side to look
    scan-heavy and the filtered build side to fit the bloom budget.
    Test-scale tables clear neither default (10 GB application-side
    scan), so lower them here — at real scale the defaults fire on
    their own."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "0",
    )
    yield spark
    for k, v in saved.items():
        spark.conf.set(k, v)


def _query(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).agg(
        F.count(F.lit(1)).alias("n")
    )


def test_bloom_filter_injected_and_result_unchanged(tuned, sf_dir):
    spark = tuned
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )  # on by default in this Spark — the scale path needs no opt-in
    q = _query(spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "bloom_filter_agg" in plan
    assert "might_contain" in plan.lower()
    with_bloom = q.collect()[0]["n"]

    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    try:
        q2 = _query(spark, sf_dir)
        plan2 = q2._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" not in plan2
        assert q2.collect()[0]["n"] == with_bloom  # pruning ≠ semantics
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
