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
    partition_dir = f"{lake.enriched_path}/context_date={context_date}"
    # Dynamic partition overwrite only replaces partitions PRESENT in the
    # incoming data: a re-run whose input flattened to zero rows writes
    # nothing, the previous run's files survive, and a footer count would
    # report the stale number as this run's output. Probe emptiness first
    # (a limit-1 job, negligible next to the write) and make the empty
    # re-run genuinely idempotent: the target partition is removed so the
    # output mirrors the input, and the reported count is honestly 0.
    if flat.isEmpty():
        _delete_path(spark, partition_dir)
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
