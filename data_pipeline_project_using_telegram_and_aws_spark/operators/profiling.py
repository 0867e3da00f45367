"""Column profiling: per-column null counts, approximate distinct
cardinalities, and value ranges for a table — the `ANALYZE TABLE`-style
statistics pass a lake pipeline runs after ingest (feeds partition-sizing
decisions, join-strategy sanity checks, and data-quality alerts).

Scale design: ONE aggregation job regardless of column count — every
statistic for every profiled column is an aggregate expression in a
single ``agg`` (partial+final, no per-column scans), and the wide 1-row
result is unpivoted to tidy (column, stat...) rows with ``stack`` inside
the same plan. No ``collect``; profiling a 100 TB table costs exactly one
scan. Distinct counts use HLL (``approx_count_distinct``) — the exact
version would add a shuffle per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, rsd: float = 0.05
) -> DataFrame:
    """(column, n_rows, n_nulls, null_frac, approx_distinct, min_repr,
    max_repr) — one row per profiled column, computed in one pass.

    min/max are cast to string so heterogeneous column types fit one
    tidy schema (the repr is for humans and alerts; numeric consumers
    should re-aggregate the typed column)."""
    names = cols if cols is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(names):
        col = F.col(c)
        aggs.append(F.count(col).alias(f"__nn{i}"))
        aggs.append(F.approx_count_distinct(col, rsd).alias(f"__d{i}"))
        aggs.append(F.min(col).cast("string").alias(f"__min{i}"))
        aggs.append(F.max(col).cast("string").alias(f"__max{i}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn{i}, __d{i}, __min{i}, __max{i}"
        for i, c in enumerate(names)
    )
    return wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(names)}, {stack_args}) AS "
            "(column, n_non_null, approx_distinct, min_repr, max_repr)"
        ),
    ).select(
        "column",
        "n_rows",
        (F.col("n_rows") - F.col("n_non_null")).alias("n_nulls"),
        F.round(
            (F.col("n_rows") - F.col("n_non_null"))
            / F.greatest(F.col("n_rows"), F.lit(1)),
            4,
        ).alias("null_frac"),
        "approx_distinct",
        "min_repr",
        "max_repr",
    )
