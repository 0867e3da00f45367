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


def test_compact_location_swap_atomic_and_crash_safe(spark):
    """swap="location": the catalog-pointer compaction — one file per
    bucket restored via a SINGLE `SET LOCATION` metastore update, the
    table name resolving continuously, version dirs swept; a crash AT
    the commit statement leaves the OLD data live and a retry
    converges; a crash right AFTER it leaves the NEW data live and the
    next compaction sweeps the leftovers."""
    import glob
    import os

    from pyspark.sql import functions as F

    from data_pipeline_project_using_telegram_and_aws_spark.sources import bucketing as B

    import shutil

    # the warehouse dir outlives sessions: clear any previous run's
    # versions root so v-numbering starts fresh
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("loc_t", "loc_t__compacting", "loc_t_twin"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(os.path.join(wh, "loc_t__versions"), ignore_errors=True)
    shutil.rmtree(os.path.join(wh, "loc_t"), ignore_errors=True)

    base = spark.range(80).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    extra = spark.range(80, 120).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    B.write_bucketed(base, "loc_t", 4, "k")
    n, cols, sorts = B.bucket_spec(spark, "loc_t")

    def append():
        (
            extra.repartition(n, "k")
            .write.mode("append")
            .bucketBy(n, *cols)
            .sortBy(*sorts)
            .format("parquet")
            .saveAsTable("loc_t")
        )

    def loc():
        d = {
            r["col_name"]: r["data_type"]
            for r in spark.sql("DESCRIBE FORMATTED loc_t").collect()
        }
        return d["Location"].removeprefix("file:")

    def files():
        return glob.glob(os.path.join(loc(), "*.parquet"))

    append()
    assert len(files()) == 8
    want = sorted((r.k, r.v) for r in spark.table("loc_t").collect())

    B.compact_bucketed_table(spark, "loc_t", swap="location")
    assert len(files()) == 4  # one per bucket, at the NEW location
    assert loc().endswith("__versions/v0")
    assert sorted((r.k, r.v) for r in spark.table("loc_t").collect()) == want
    assert B.bucket_spec(spark, "loc_t") == (n, cols, sorts)
    assert not spark.catalog.tableExists("loc_t__compacting")
    # co-located joins still exchange-free after the swap (broadcast
    # disabled so a trivially-small broadcast doesn't mask co-location)
    B.write_bucketed(spark.table("loc_t"), "loc_t_twin", 4, "k")
    old_b = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = B.cojoined(spark, "loc_t", "loc_t_twin", "k", "k")
        assert B.exchange_count(j) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_b)

    # second compaction: v0 -> v1, superseded version swept
    append()
    B.compact_bucketed_table(spark, "loc_t", swap="location")
    assert loc().endswith("__versions/v1")
    root = os.path.dirname(loc())
    assert sorted(os.listdir(root)) == ["v1"]
    want2 = sorted((r.k, r.v) for r in spark.table("loc_t").collect())

    # crash AT the commit point: old data stays live, retry converges
    append()
    real_commit = B._commit_sql

    def die(spark_, stmt):
        raise RuntimeError("injected at commit")

    B._commit_sql = die
    try:
        import pytest as _pt

        with _pt.raises(RuntimeError):
            B.compact_bucketed_table(spark, "loc_t", swap="location")
    finally:
        B._commit_sql = real_commit
    assert loc().endswith("__versions/v1")  # pointer unchanged
    got = sorted((r.k, r.v) for r in spark.table("loc_t").collect())
    assert got == sorted(want2 + [(int(r.k), int(r.v)) for r in extra.collect()])
    B.compact_bucketed_table(spark, "loc_t", swap="location")  # retry
    assert loc().endswith("__versions/v3") or loc().endswith(
        "__versions/v2"
    )
    assert len(files()) == 4
    assert sorted(os.listdir(os.path.dirname(loc()))) == [
        os.path.basename(loc())
    ]

    # crash right AFTER the commit: new data live, leftovers swept next
    append()
    def die_after(spark_, stmt):
        real_commit(spark_, stmt)
        raise RuntimeError("injected post commit")

    B._commit_sql = die_after
    try:
        import pytest as _pt

        with _pt.raises(RuntimeError):
            B.compact_bucketed_table(spark, "loc_t", swap="location")
    finally:
        B._commit_sql = real_commit
    assert len(files()) == 4  # committed: compacted data IS live
    append()
    B.compact_bucketed_table(spark, "loc_t", swap="location")
    assert sorted(os.listdir(os.path.dirname(loc()))) == [
        os.path.basename(loc())
    ]
    assert not spark.catalog.tableExists("loc_t__compacting")
