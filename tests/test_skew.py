from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.skew import salted_join


def _tables(spark):
    # one pathological key (0) carrying 90% of the rows
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.createDataFrame(
        [(0, "hot"), (950, "cold"), (999, "cold")], ["k", "tag"]
    )
    return big, dim


def test_salted_inner_matches_plain_join(spark):
    big, dim = _tables(spark)
    plain = sorted(
        (r["k"], r["payload"], r["tag"])
        for r in big.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["payload"], r["tag"])
        for r in salted_join(big, dim, "k", n_salts=8).collect()
    )
    assert salted == plain
    assert len(salted) == 902  # 900 hot + 2 cold


def test_salted_left_keeps_unmatched(spark):
    big, dim = _tables(spark)
    out = salted_join(big, dim, "k", n_salts=8, how="left")
    assert out.count() == 1000
    assert out.filter(F.col("tag").isNull()).count() == 98


def test_join_shuffles_on_key_and_salt(spark):
    big, dim = _tables(spark)
    # force the shuffle path (a table this tiny would broadcast, and a
    # broadcast join has no skew problem to fix in the first place)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            salted_join(big, dim, "k", n_salts=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the exchange must carry the salt: that IS the skew fix
    assert any(
        "Exchange hashpartitioning" in line and "__salt" in line
        for line in plan.splitlines()
    )


def test_rejects_outer_shapes(spark):
    big, dim = _tables(spark)
    try:
        salted_join(big, dim, "k", how="full")
    except ValueError as e:
        assert "inner/left" in str(e)
    else:
        raise AssertionError("full outer accepted")


def test_skew_report(spark):
    from pyspark.sql import functions as F

    from data_pipeline_project_using_telegram_and_aws_spark.operators.skew import skew_report

    # one hot key (500 rows) over a 100-key long tail (5 rows each)
    df = spark.range(1000).select(
        F.when(F.col("id") < 500, F.lit(0))
        .otherwise((F.col("id") % 100) + 1)
        .alias("k")
    )
    rep = skew_report(df, "k", top=3).collect()[0]
    assert rep["total_rows"] == 1000
    assert rep["n_keys"] == 101
    assert rep["max_key_rows"] == 500
    assert rep["top1_share"] == 0.5
    assert rep["top_keys"][0]["key"] == "0"
    assert rep["top_keys"][0]["n"] == 500
    assert len(rep["top_keys"]) == 3
    # the p50 of per-key counts is the tail's 5; the max is the hot key
    labels = list(rep["percentile_labels"])
    p = dict(zip(labels, rep["count_percentiles"]))
    assert p[0.5] == 5 and p[1.0] == 500
