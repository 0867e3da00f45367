"""Presto/Athena SQL → Spark SQL text translation.

The reference declares its analytics as Athena (Presto-dialect) SQL. Spark
SQL accepts almost all of it verbatim; the three real divergences
(SURVEY.md §7 risk 1) are rewritten here so the *reference query texts*
run unchanged on this engine:

- ``date_format(ts, '%Y-…')`` MySQL patterns → JDK patterns.
- ``EXTRACT(dow FROM x)`` Presto ISO numbering (1=Mon..7=Sun) → Spark
  expression ``(weekday(x) + 1)``.
- ``EXTRACT(week FROM x)`` → ``weekofyear(x)``.
- ``CAST(AVG(x) AS INT)``: Presto's double→int cast *rounds* to nearest,
  Spark's *truncates* toward zero → rewritten to ``CAST(ROUND(AVG(x)) AS
  INT)`` (reference usage at ipynb:896).

``from_unixtime`` needs no rewrite for the reference's usage: Presto
returns a timestamp, Spark a string, but the reference immediately wraps
it in ``date_format → CAST(AS timestamp)`` (ipynb:935), which coerces both
to the same value.

This is a pragmatic regex translator scoped to the constructs the
reference uses — not a general SQL transpiler.
"""

from __future__ import annotations

import re

from .datetime_shims import translate_mysql_datetime_pattern

_DATE_FORMAT_RE = re.compile(r"date_format\s*\(([^,]+),\s*'([^']*)'\s*\)", re.IGNORECASE)
_EXTRACT_RE = re.compile(r"extract\s*\(\s*(\w+)\s+from\s+([^)]+)\)", re.IGNORECASE)
# the AVG argument may itself contain one level of calls — the reference's
# own text is CAST(AVG(length(text)) AS INT) (ipynb:896), so the argument
# pattern must cross nested parens ([^)]* stops at the first close-paren
# and silently leaves the cast untranslated: Spark then truncates where
# Presto rounds — caught by tests/test_sql_parity.py, invisible to golden
# corpora whose averages are whole numbers)
_CAST_AVG_INT_RE = re.compile(
    r"cast\s*\(\s*(avg\s*\((?:[^()]|\([^()]*\))*\))\s+as\s+int(eger)?\s*\)",
    re.IGNORECASE,
)


def presto_to_spark_sql(sql: str) -> str:
    def _fmt(m: re.Match) -> str:
        jdk = translate_mysql_datetime_pattern(m.group(2))
        return f"date_format({m.group(1)}, '{jdk}')"

    def _extract(m: re.Match) -> str:
        unit, expr = m.group(1).lower(), m.group(2).strip()
        if unit == "dow":
            return f"(weekday({expr}) + 1)"
        if unit == "week":
            return f"weekofyear({expr})"
        return f"extract({m.group(1)} FROM {expr})"

    sql = _DATE_FORMAT_RE.sub(_fmt, sql)
    sql = _EXTRACT_RE.sub(_extract, sql)
    sql = _CAST_AVG_INT_RE.sub(lambda m: f"CAST(ROUND({m.group(1)}) AS INT)", sql)
    return sql
