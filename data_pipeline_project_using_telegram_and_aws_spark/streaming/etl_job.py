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
import logging

from pyspark.sql import SparkSession, functions as F

_log = logging.getLogger(__name__)

from ..operators.flatten import flatten_updates
from ..sources.lake import TelegramLake


def run_daily_etl(
    spark: SparkSession,
    lake: TelegramLake,
    context_date: dt.date | str | None = None,
    files_per_partition: int = 1,
    overwrite_on_empty: bool = False,
) -> int:
    """Process one day (default: D-1 on the pipeline's UTC-3 clock, the
    reference's cadence — ipynb:562) from the raw zone into the enriched
    zone. Returns the number of rows written.

    ``overwrite_on_empty``: when the incoming batch flattens to zero
    rows AND a previously-written partition exists for the day, the
    default is to KEEP the existing data (a transient empty/failed
    upstream export must not silently destroy a good load) and log the
    divergence loudly; pass True to make the empty re-run mirror the
    input by deleting the target partition (the strict-idempotency
    mode). Either way the returned count is honestly 0."""
    if context_date is None:
        context_date = lake.today() - dt.timedelta(days=1)

    raw = lake.read_raw(spark, context_date=context_date)
    flat = flatten_updates(raw).withColumn(
        "context_date", F.lit(str(context_date)).cast("date")
    )
    partition_dir = f"{lake.enriched_path}/context_date={context_date}"
    # Dynamic partition overwrite only replaces partitions PRESENT in the
    # incoming data: a re-run whose input flattened to zero rows writes
    # nothing, the previous run's files survive, and a footer count would
    # report the stale number as this run's output. Probe emptiness first
    # (a limit-1 job, negligible next to the write) and report honestly 0;
    # whether the stale partition is also deleted is the caller's call
    # (overwrite_on_empty) — never a silent default.
    if flat.isEmpty():
        existing = _partition_row_count(spark, partition_dir)
        if existing > 0:
            if overwrite_on_empty:
                _log.warning(
                    "run_daily_etl: empty input for %s; deleting the "
                    "existing %d-row partition (overwrite_on_empty=True)",
                    context_date, existing,
                )
                _delete_path(spark, partition_dir)
            else:
                _log.warning(
                    "run_daily_etl: empty input for %s but the target "
                    "partition holds %d rows from a previous load; "
                    "keeping it (pass overwrite_on_empty=True to delete)",
                    context_date, existing,
                )
        return 0
    # ONE full-scan action: write, then report the row count from the
    # written partition's parquet FOOTERS — a metadata-only read, no
    # second scan and no cache (the previous cache+count shape cost an
    # extra action per day-partition job).
    lake.write_enriched(flat, files_per_partition=files_per_partition)
    return _partition_row_count(spark, partition_dir)


def _delete_path(spark: SparkSession, directory: str) -> None:
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(directory)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


def _partition_row_count(spark: SparkSession, partition_dir: str) -> int:
    """Row count of one written day-partition from parquet footer
    metadata — files listed and footers read through the Hadoop FS API,
    so the count works on any Hadoop filesystem (HDFS/S3A/local), not
    just ``file://`` paths as the previous local-glob + pyarrow version
    did. Still metadata-only: no data pages are touched."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(partition_dir)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return 0
    total = 0
    for status in fs.listStatus(path):
        fpath = status.getPath()
        if not fpath.getName().endswith(".parquet"):
            continue
        infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            fpath, conf
        )
        reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
        try:
            total += reader.getRecordCount()
        finally:
            reader.close()
    return total
