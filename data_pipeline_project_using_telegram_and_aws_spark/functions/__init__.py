from .datetime_shims import (
    from_unixtime_ts,
    presto_date_format,
    presto_dow,
    presto_week,
    translate_mysql_datetime_pattern,
)

__all__ = [
    "from_unixtime_ts",
    "presto_date_format",
    "presto_dow",
    "presto_week",
    "translate_mysql_datetime_pattern",
]
