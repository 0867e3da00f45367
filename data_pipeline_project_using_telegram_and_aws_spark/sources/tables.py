"""Parquet table access for the driver's testdata star schema.

Reads go straight through ``spark.read.parquet`` so Catalyst keeps column
pruning and predicate pushdown (verify with ``df.explain`` → ``ReadSchema``
/ ``PushedFilters``). At 100 TB the same call works unchanged against a
partitioned table directory — partition pruning kicks in for filters on the
partition columns.

Nanosecond timestamps: the testdata parquet stores ``TIMESTAMP(NANOS)``,
which Spark's vectorized reader rejects. We flip the runtime conf
``spark.sql.legacy.parquet.nanosAsLong`` (reads nanos as epoch-nano longs,
keeping the fast vectorized path) and rewrite those columns to
``TimestampType`` with integer-division truncation to microseconds —
exactly how DuckDB reads the same files, so oracle comparisons line up.
The nanos columns are detected once per table from the parquet footer
(pyarrow, metadata-only read) and cached.
"""

from __future__ import annotations

from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES


# path -> inferred Spark StructType (r14). Pure METADATA, same class as
# the pyarrow footer cache below (path-keyed, process-lifetime): repeat
# reads pass the schema explicitly, skipping Spark's per-call footer
# schema inference — measured 0.089 → 0.018 s per read at sf0.1, paid by
# EVERY query build on EVERY invocation (driver-side plan-build cost,
# guide §7.3). No data, no plan, no results are cached: the scan still
# lists, reads, and computes from the parquet files on every run. A
# file whose schema changes under a running session would need a
# process restart — the same caveat _nano_timestamp_columns already
# carries.
_SCHEMA_CACHE: dict = {}


@lru_cache(maxsize=256)
def _nano_timestamp_columns(path: str) -> tuple[str, ...]:
    """Column names stored as timestamp[ns] in the parquet footer."""
    import pyarrow as pa
    import pyarrow.types as pat

    try:
        schema = pq.read_schema(path)
    except Exception:
        import glob
        import os

        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if not files:
            return ()
        schema = pq.read_schema(files[0])
    return tuple(
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns" and f.type.tz is None
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet, transparently fixing nanosecond-timestamp columns.

    Also pins the session zone to UTC — for EVERY read, not just the
    nano-typed ones: the testdata files store timestamps *without*
    timezone and DuckDB (the oracle) reads them as naive wall-clock,
    while Spark's TimestampType is an instant whose wall-clock
    projection (``date_trunc``/``to_date``/``hour``/...) follows the
    session zone resolved at plan-analysis time. Pinning here makes
    every query built on these tables session-TZ-invariant. (A
    micros-typed table once skipped the pin because it lived inside the
    nano branch, so TZ invariance silently depended on which table a
    session read first — caught by tests/test_tz_matrix.py.)"""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    nano_cols = _nano_timestamp_columns(path)
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    for c in nano_cols:
        # integer division keeps full int64 precision (a double-based
        # divide would corrupt epoch-nano values > 2^53)
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Register testdata tables as temp views for ``spark.sql``.

    ``tables`` limits registration to the views a query actually reads —
    each registration costs a driver-side parquet-footer read, and a
    query that re-registers all 10 tables pays ~0.3 s of pure overhead
    per invocation (measured: part of q23's round-2 "regression")."""
    for name in tables if tables is not None else TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
