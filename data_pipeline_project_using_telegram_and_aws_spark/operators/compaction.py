"""Small-file compaction (SURVEY §2.1 S7 / §4 X4).

The reference's daily ETL exists largely to fix the small-file problem:
N one-message JSON files → 1 Parquet file per day partition (ipynb:585-596).
Spark writes one file *per task*, so compaction is a partitioning decision:

- ``files_per_partition=1`` (reference parity): exactly one file per
  day-partition via ``repartition(partition_col)`` — a hash shuffle that
  co-locates each day in one task. Right for toy scale, wrong at 100 TB
  (serializes each day's write through one core).
- ``files_per_partition=N`` (scale mode): each day is spread over N tasks
  via a deterministic row-hash salt → N size-balanced files per day. The
  caller sizes N from input bytes (e.g. day_bytes / 128 MB); AQE coalesces
  if the estimate overshoots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def compact_by_partition(
    df: DataFrame,
    partition_col: str,
    files_per_partition: int = 1,
) -> DataFrame:
    if files_per_partition <= 1:
        # one task — hence one file — per distinct partition value
        return df.repartition(F.col(partition_col))
    salt = F.abs(F.xxhash64(*df.columns)) % F.lit(files_per_partition)
    return (
        df.withColumn("__salt", salt)
        .repartition(F.col(partition_col), F.col("__salt"))
        .drop("__salt")
    )


def compact_zordered(
    df: DataFrame,
    partition_col: str,
    zorder_cols: list[str],
    n_tasks: int,
    bits: int = 12,
) -> DataFrame:
    """Compaction that also CLUSTERS: rows are range-partitioned on
    (partition, z-curve of ``zorder_cols``) and sorted within tasks, so
    a ``partitionBy(partition_col)`` write produces, inside every day
    partition, files covering compact multi-dimensional rectangles —
    the S7 rewrite and the OPTIMIZE-ZORDER layout in one shuffle
    (`sources/zorder.py` has the measured pruning trade).

    ``n_tasks`` sizes output files corpus-wide (bytes / target file
    size); a range boundary can straddle two days, in which case that
    task writes one file into each — correct layout, at most one extra
    file per boundary. Rows-in = rows-out; only order and file
    placement change."""
    from ..sources.zorder import zorder_key

    keyed = zorder_key(df, zorder_cols, bits)
    return (
        keyed.repartitionByRange(
            n_tasks, F.col(partition_col), F.col("__z")
        )
        .sortWithinPartitions(partition_col, "__z")
        .drop("__z")
    )
