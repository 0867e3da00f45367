"""Bucketed co-located join: same results as the shuffled join, with a
physical plan containing zero Exchange operators (the scale property the
module exists for — see sources/bucketing.py docstring)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.sources.bucketing import (
    cojoined,
    exchange_count,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(lineitem, "lineitem_bkt", 8, "l_orderkey")
    write_bucketed(orders, "orders_bkt", 8, "o_orderkey")
    yield "lineitem_bkt", "orders_bkt"
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")


@pytest.fixture()
def no_broadcast(spark):
    # force the sort-merge path: a broadcast join would be trivially
    # exchange-free and prove nothing about co-location. The legacy flag
    # re-enables sorted-bucket output ordering (off by default since
    # Spark 3.0), which lets the SMJ also skip its per-task Sort when
    # every bucket is a single file — write_bucketed guarantees that.
    old_b = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_b)
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )


def _join_agg(df):
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
    )


def test_bucketed_join_is_exchange_free(spark, bucketed_tables, no_broadcast):
    lt, ot = bucketed_tables
    joined = cojoined(spark, lt, ot, "l_orderkey", "o_orderkey")
    # the join itself: both sides read their 8 buckets co-located,
    # no shuffle anywhere in the executed plan
    assert exchange_count(joined) == 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # per-bucket sortBy at write time lets the SMJ skip its Sort too
    assert "Sort " not in plan


def test_bucketed_groupby_on_key_is_exchange_free(
    spark, bucketed_tables, no_broadcast
):
    lt, _ = bucketed_tables
    agg = (
        spark.table(lt)
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    assert exchange_count(agg) == 0


def test_bucketed_join_matches_shuffled_join(
    spark, sf_dir, bucketed_tables, no_broadcast
):
    lt, ot = bucketed_tables
    bucketed = _join_agg(
        cojoined(spark, lt, ot, "l_orderkey", "o_orderkey")
    ).collect()
    plain = _join_agg(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    ).collect()
    assert sorted(map(tuple, bucketed)) == sorted(map(tuple, plain))


def test_compact_bucketed_table_restores_one_file_per_bucket(spark):
    """After incremental appends a bucket holds several files; the
    compaction pass rewrites to one file per bucket (write-new-then-swap,
    never read-and-overwrite in place) and preserves rows + bucket spec."""
    import glob
    import os

    from pyspark.sql import functions as F

    from data_pipeline_project_using_telegram_and_aws_spark.sources.bucketing import (
        bucket_spec,
        compact_bucketed_table,
        write_bucketed,
    )

    base = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    extra = spark.range(100, 150).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_bucketed(base, "compact_t", 4, "k")
    n, cols, sorts = bucket_spec(spark, "compact_t")
    (
        extra.repartition(n, "k")
        .write.mode("append")
        .bucketBy(n, *cols)
        .sortBy(*sorts)
        .format("parquet")
        .saveAsTable("compact_t")
    )

    def files():
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        return glob.glob(os.path.join(wh, "compact_t", "*.parquet"))

    assert len(files()) == 8  # two files per bucket after the append
    before = sorted(r.k for r in spark.table("compact_t").collect())

    compact_bucketed_table(spark, "compact_t")
    assert len(files()) == 4  # one per bucket again
    assert sorted(r.k for r in spark.table("compact_t").collect()) == before
    assert bucket_spec(spark, "compact_t") == (n, cols, sorts)
    assert not spark.catalog.tableExists("compact_t__precompact")
    assert not spark.catalog.tableExists("compact_t__compacting")


def test_overwrite_of_qualified_table_spares_default_db_twin(spark):
    """An overwrite-mode write of ``db.t`` must resolve the old location
    from the catalog, not guess ``<warehouse>/t`` — the guess is the
    LIVE data directory of a default-db table that happens to share the
    short name."""
    df = spark.range(10).withColumnRenamed("id", "k")
    write_bucketed(df, "twin_tbl", 4, "k")
    spark.sql("CREATE DATABASE IF NOT EXISTS bktdb")
    try:
        write_bucketed(df, "bktdb.twin_tbl", 4, "k")
        write_bucketed(df, "bktdb.twin_tbl", 4, "k")  # overwrite again
        assert spark.table("twin_tbl").count() == 10  # default-db twin intact
        assert spark.table("bktdb.twin_tbl").count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS bktdb.twin_tbl")
        spark.sql("DROP DATABASE IF EXISTS bktdb")
        spark.sql("DROP TABLE IF EXISTS twin_tbl")
