"""Timezone-independence matrix for the oracle corpus.

Round 2's only driver-red row (q35) was a DuckDB oracle whose
``CAST(to_timestamp(...) AS TIMESTAMP)`` converted through the *session*
TimeZone — green under this machine's UTC default, red under the
driver's America/Sao_Paulo. These tests prove that class of bug is gone:

- every registered oracle returns identical (normalized) rows under
  DuckDB ``TimeZone`` UTC and America/Sao_Paulo — i.e. zero
  TZ-dependent SQL constructs remain in the corpus;
- the TZ-sensitive Spark queries return oracle-matching values even
  when the *caller's* Spark session zone is America/Sao_Paulo (the
  engine pins wall-clock semantics internally, sources/tables.py).
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "check_oracle", os.path.join(ROOT, "tools", "check_oracle.py")
)
_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_check)

TZS = ("UTC", "America/Sao_Paulo")


def _oracle_norm_rows(sql: str, tz: str):
    con = duckdb.connect()
    con.execute(f"SET TimeZone='{tz}'")
    for t in _check.TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    rel = con.execute(sql)
    cols = sorted(d[0] for d in rel.description)
    rows = [dict(zip([d[0] for d in rel.description], r)) for r in rel.fetchall()]
    return cols, sorted(
        "|".join(_check._norm(r[c]) for c in cols) for r in rows
    )


def _oracles():
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_oracles()))
def test_oracle_is_timezone_independent(name):
    sql = _oracles()[name]
    utc = _oracle_norm_rows(sql, "UTC")
    sp = _oracle_norm_rows(sql, "America/Sao_Paulo")
    assert utc == sp, f"{name}: oracle output depends on DuckDB session TimeZone"


def test_q35_spark_matches_oracle_under_foreign_session_tz(spark):
    """The 4th matrix corner: Spark session zone America/Sao_Paulo ×
    DuckDB zone America/Sao_Paulo — exactly the driver's environment."""
    from data_pipeline_project_using_telegram_and_aws_spark.plans.temporal_queries import (
        ORACLE,
        q35_time_bucket_rollup,
    )

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Sao_Paulo")
    try:
        sdf = q35_time_bucket_rollup(spark, SF)
        scols = sorted(sdf.columns)
        got = sorted(
            "|".join(_check._norm(r[c]) for c in scols)
            for r in (row.asDict() for row in sdf.collect())
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    _, want = _oracle_norm_rows(ORACLE["q35_time_bucket_rollup"], "America/Sao_Paulo")
    assert got == want
