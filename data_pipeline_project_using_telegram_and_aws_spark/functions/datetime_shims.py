"""Presto/Athena → Spark datetime dialect shims.

The reference's Q4 (ipynb:929-958) leans on three Presto behaviors that
silently diverge in Spark (SURVEY.md §2.8 F5/F6/F9):

- ``from_unixtime(bigint)``: Presto returns a *timestamp*; Spark returns a
  *string* in the session zone. → :func:`from_unixtime_ts`.
- ``date_format(ts, '%Y-%m-%d %H:%i:%s')``: Presto uses MySQL-style ``%``
  patterns; Spark uses JDK ``yyyy-MM-dd`` patterns.
  → :func:`translate_mysql_datetime_pattern` / :func:`presto_date_format`.
- ``EXTRACT(dow FROM ts)``: Presto numbers ISO 1=Monday..7=Sunday; Spark's
  ``dayofweek`` numbers 1=Sunday..7=Saturday. → :func:`presto_dow`.

All shims are plain Column expressions (JVM-side, codegen-friendly) — no
UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# MySQL-style specifier → JDK DateTimeFormatter pattern. Covers the
# specifiers Presto's date_format documents; the reference itself only uses
# %Y %m %d %H %i %s (ipynb:935) but the full map makes the shim reusable.
_MYSQL_TO_JDK = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%c": "M",
    "%d": "dd",
    "%e": "d",
    "%H": "HH",
    "%k": "H",
    "%h": "hh",
    "%i": "mm",
    "%s": "ss",
    "%f": "SSSSSS",
    "%j": "DDD",
    "%a": "EEE",
    "%W": "EEEE",
    "%b": "MMM",
    "%M": "MMMM",
    "%p": "a",
    "%T": "HH:mm:ss",
    "%%": "%",
}


def translate_mysql_datetime_pattern(pattern: str) -> str:
    """Translate a MySQL/Presto ``date_format`` pattern to a JDK pattern.

    Literal runs between specifiers are single-quoted when they contain
    letters (JDK treats bare letters as pattern chars).
    """
    out: list[str] = []
    literal: list[str] = []

    def flush() -> None:
        if literal:
            text = "".join(literal)
            if any(c.isalpha() for c in text):
                out.append("'" + text.replace("'", "''") + "'")
            else:
                out.append(text)
            literal.clear()

    i = 0
    while i < len(pattern):
        if pattern[i] == "%" and i + 1 < len(pattern):
            spec = pattern[i : i + 2]
            if spec in _MYSQL_TO_JDK:
                flush()
                out.append(_MYSQL_TO_JDK[spec])
                i += 2
                continue
        literal.append(pattern[i])
        i += 1
    flush()
    return "".join(out)


def presto_date_format(ts: Column, mysql_pattern: str) -> Column:
    """Presto's ``date_format`` (MySQL patterns) on a Spark timestamp."""
    return F.date_format(ts, translate_mysql_datetime_pattern(mysql_pattern))


def from_unixtime_ts(epoch_seconds: Column) -> Column:
    """Presto ``from_unixtime``: epoch seconds → timestamp (not string)."""
    return F.timestamp_seconds(epoch_seconds.cast("long"))


def presto_dow(ts: Column) -> Column:
    """Presto ``EXTRACT(dow ...)``: ISO day-of-week, 1=Monday..7=Sunday.

    Spark's ``weekday`` is 0=Monday..6=Sunday, so ``weekday + 1`` matches
    Presto (and DuckDB's ``isodow``) exactly.
    """
    return (F.weekday(ts) + F.lit(1)).cast("long")


def presto_week(ts: Column) -> Column:
    """Presto ``EXTRACT(week ...)``: ISO-8601 week of year (= Spark's)."""
    return F.weekofyear(ts).cast("long")
