"""Z-order layout pins: file-level min/max stats prune on BOTH
z-ordered dimensions (measured against a single-column sort, which
prunes on one), rows survive the rewrite intact, and the key is a pure
projection after one scalar-stats aggregation."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.sources.zorder import (
    write_zordered,
    zorder_key,
)

N = 40_000
FILES = 16


@pytest.fixture(scope="module")
def grid(spark):
    # two INDEPENDENT uniform dimensions — the case one sort can't serve
    return spark.range(N).select(
        F.col("id"),
        (F.xxhash64("id").bitwiseAND(F.lit(0xFFFF))).alias("x"),
        (F.xxhash64("id", F.lit(1)).bitwiseAND(F.lit(0xFFFF))).alias("y"),
    )


def _files_overlapping(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(#files whose [min,max] intersects [lo,hi], #files) from parquet
    footer stats — what a stats-pruning scan must read."""
    names = [f for f in glob.glob(f"{path}/*.parquet")]
    hit = 0
    for f in names:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            hit += 1
    return hit, len(names)


def test_zorder_prunes_both_dimensions(spark, grid, tmp_path):
    zpath = str(tmp_path / "z")
    xpath = str(tmp_path / "xsort")
    write_zordered(grid, zpath, ["x", "y"], n_files=FILES)
    (
        grid.repartitionByRange(FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    band = (1000, 1000 + 0xFFFF // 10)  # a 10% band on each dimension

    zx, zn = _files_overlapping(zpath, "x", *band)
    zy, _ = _files_overlapping(zpath, "y", *band)
    sx, sn = _files_overlapping(xpath, "x", *band)
    sy, _ = _files_overlapping(xpath, "y", *band)
    assert zn == FILES and sn == FILES
    # the x-sorted layout serves x (few files) and fails y (all files)
    assert sx <= 3
    assert sy == FILES
    # the z-order serves BOTH: strictly better than all-files on each,
    # and far better than the sorted layout on the non-sorted dimension
    assert zx <= FILES // 2
    assert zy <= FILES // 2
    assert zy < sy


def test_zorder_rewrite_loses_nothing(spark, grid, tmp_path):
    zpath = str(tmp_path / "z2")
    write_zordered(grid, zpath, ["x", "y"], n_files=8)
    back = spark.read.parquet(zpath)
    assert back.count() == N
    assert "__z" not in back.columns
    # filtered reads agree with the source
    want = grid.filter("x < 5000 AND y < 5000").count()
    assert back.filter("x < 5000 AND y < 5000").count() == want


def test_zorder_key_validation_and_plan(spark, grid):
    with pytest.raises(ValueError):
        zorder_key(grid, [])
    with pytest.raises(ValueError):
        zorder_key(grid, ["x"] * 6)
    with pytest.raises(ValueError):
        zorder_key(grid, ["x", "y"], bits=32)
    plan = (
        zorder_key(grid, ["x", "y"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one scalar-stats aggregation broadcast back; no keyed shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") == 0