"""Daily batch ETL: raw JSON partition → flattened, compacted Parquet.

The reference's second Lambda (ipynb:546-603, cell 38): triggered daily,
processes the *previous* day's partition (D-1, ipynb:562), flattens each
update with ``parse_data`` and compacts one day of small JSON files into a
single Parquet file in the enriched zone.

Spark shape (SURVEY.md §3.2): one declarative job —
partition-pruned JSON read → flatten select → compaction repartition →
dynamic-partition-overwrite Parquet write. Parallelism, spill, and retry
come from the engine; re-runs are idempotent (ST4 upgrade over the
reference's duplicate-on-rerun behavior).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession, functions as F

from ..operators.flatten import flatten_updates
from ..sources.lake import TelegramLake


def run_daily_etl(
    spark: SparkSession,
    lake: TelegramLake,
    context_date: dt.date | str | None = None,
    files_per_partition: int = 1,
) -> int:
    """Process one day (default: D-1 on the pipeline's UTC-3 clock, the
    reference's cadence — ipynb:562) from the raw zone into the enriched
    zone. Returns the number of rows written."""
    if context_date is None:
        context_date = lake.today() - dt.timedelta(days=1)

    raw = lake.read_raw(spark, context_date=context_date)
    flat = flatten_updates(raw).withColumn(
        "context_date", F.lit(str(context_date)).cast("date")
    )
    # ONE action: write, then report the row count from the written
    # partition's parquet FOOTERS — a metadata-only read, no second scan
    # and no cache (the previous cache+count shape cost an extra action
    # per day-partition job). An empty day writes no files and counts 0.
    lake.write_enriched(flat, files_per_partition=files_per_partition)
    return _partition_row_count(f"{lake.enriched_path}/context_date={context_date}")


def _partition_row_count(partition_dir: str) -> int:
    """Row count of one written day-partition from parquet footer
    metadata (pyarrow, no data pages touched)."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(partition_dir, "*.parquet"))
    return sum(pq.read_metadata(f).num_rows for f in files)
