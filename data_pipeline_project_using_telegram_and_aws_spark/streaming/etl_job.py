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
    # the write must not re-run the read twice (count + write), so cache the
    # (small, one-day) flattened slice; at scale swap the count for write
    # metrics from the listener if the extra action matters
    flat = flat.cache()
    try:
        n = flat.count()
        if n:
            lake.write_enriched(flat, files_per_partition=files_per_partition)
    finally:
        flat.unpersist()
    return n
