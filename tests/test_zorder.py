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

def test_compact_zordered_layout(spark, tmp_path):
    """Z-ordered compaction: per day-partition, files cover compact
    user_id rectangles (vs plain compaction whose per-day files all
    span the full user range); rows conserved."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from data_pipeline_project_using_telegram_and_aws_spark.operators.compaction import (
        compact_by_partition,
        compact_zordered,
    )

    n = 20_000
    df = spark.range(n).select(
        (F.col("id") % 4).cast("string").alias("day"),
        (F.xxhash64("id").bitwiseAND(F.lit(0xFFFF))).alias("user_id"),
        F.col("id").alias("event_id"),
    )
    zp = str(tmp_path / "z")
    pp = str(tmp_path / "plain")
    (
        compact_zordered(df, "day", ["user_id", "event_id"], n_tasks=32)
        .write.mode("overwrite").partitionBy("day").parquet(zp)
    )
    (
        compact_by_partition(df, "day", files_per_partition=4)
        .write.mode("overwrite").partitionBy("day").parquet(pp)
    )

    def spans(root):
        out = []
        for f in glob.glob(f"{root}/day=*/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mn = mx = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == "user_id" and c.statistics:
                        s = c.statistics
                        mn = s.min if mn is None else min(mn, s.min)
                        mx = s.max if mx is None else max(mx, s.max)
            if mn is not None:
                out.append((mx - mn) / 0xFFFF)
        return out

    z_spans, p_spans = spans(zp), spans(pp)
    assert z_spans and p_spans
    # plain per-day files each span ~the whole user range; z-ordered
    # files cover a fraction of it
    p_mean = sum(p_spans) / len(p_spans)
    z_mean = sum(z_spans) / len(z_spans)
    assert p_mean > 0.9
    # interleaving with a second dimension costs some user_id
    # compactness (the measured z-curve trade) but stays well under
    # the every-file-spans-everything plain layout
    assert z_mean < 0.6 * p_mean
    # conservation
    assert spark.read.parquet(zp).count() == n
    assert spark.read.parquet(pp).count() == n
