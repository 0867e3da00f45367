"""Format interchange (sources/interchange.py): lossless round-trips per
format, CSV complex-column JSON encoding, NULL-vs-empty-string fidelity,
and ORC scan hygiene (pushdown + pruning, mirroring the parquet pins in
test_plan_hygiene.py)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from data_pipeline_project_using_telegram_and_aws_spark.sources.interchange import (
    FORMATS,
    export_table,
    import_table,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("meta", T.StructType(
            [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
        )),
    ]
)

ROWS = [
    Row(id=1, name="alpha", score=1.5, tags=["a", "b"], meta=Row(k=7, v="x")),
    Row(id=2, name="", score=None, tags=[], meta=Row(k=0, v="")),
    Row(id=3, name=None, score=-2.25, tags=None, meta=None),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _canon(frame):
    return sorted(
        (r.id, r.name, r.score,
         None if r.tags is None else tuple(r.tags),
         None if r.meta is None else (r.meta.k, r.meta.v))
        for r in frame.collect()
    )


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_is_lossless(df, spark, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp("ic") / fmt)
    export_table(df, path, fmt)
    back = import_table(spark, path, fmt, SCHEMA)
    assert back.schema == SCHEMA
    assert _canon(back) == _canon(df)


def test_csv_distinguishes_null_from_empty_string(df, spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ic") / "csvnull")
    export_table(df, path, "csv")
    back = {r.id: r for r in import_table(spark, path, "csv", SCHEMA).collect()}
    assert back[2].name == "" and back[2].score is None
    assert back[3].name is None


def test_partitioned_export_prunes(df, spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ic") / "part")
    export_table(df, path, "parquet", partition_by=["id"])
    got = import_table(spark, path, "parquet", SCHEMA).filter(F.col("id") == 1)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # partition filter prunes directories, not a post-scan filter
    assert "PartitionFilters: [isnotnull(id" in plan
    assert got.count() == 1


def test_orc_scan_pushdown_and_pruning(spark, tmp_path_factory):
    from data_pipeline_project_using_telegram_and_aws_spark.sources.tables import (
        load_table,
    )

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    path = str(tmp_path_factory.mktemp("ic") / "orc")
    export_table(li, path, "orc")
    back = import_table(spark, path, "orc", li.schema)
    q = back.filter(F.col("l_quantity") < 5).select("l_orderkey", "l_quantity")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    plan = q._jdf.queryExecution().executedPlan().toString()
    pushed = plan[plan.find("PushedFilters"):]
    assert "LessThan(l_quantity" in pushed
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and {c.split(":")[0] for c in m.group(1).split(",")} == {
        "l_orderkey", "l_quantity",
    }
    # values survive the ORC hop
    want = li.filter(F.col("l_quantity") < 5).count()
    assert q.count() == want
