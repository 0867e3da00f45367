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
