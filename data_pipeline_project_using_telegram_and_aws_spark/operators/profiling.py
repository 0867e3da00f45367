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


def robust_outlier_report(
    df: DataFrame,
    col: str,
    k: float = 5.0,
    relative_error: float = 0.001,
) -> DataFrame:
    """One-row robust-outlier summary: median, MAD (median absolute
    deviation), the [median ± k·MAD·1.4826] fence, and the row counts
    beyond each side — the heavy-tail-safe complement to mean/stddev
    profiling (one poisoned value moves a mean arbitrarily; it moves a
    median not at all). 1.4826 scales MAD to σ-equivalents under
    normality, so ``k`` reads like a z-score cutoff.

    Two aggregations by necessity (MAD needs the median first — the
    median broadcasts back as a 1-row literal between them), then one
    conditional-count pass; all approx_percentile sketches at the
    stated ``relative_error``."""
    med = df.agg(
        F.percentile_approx(
            col, 0.5, int(1 / relative_error)
        ).alias("median")
    )
    dev = df.crossJoin(F.broadcast(med)).select(
        F.col(col),
        F.col("median"),
        F.abs(F.col(col) - F.col("median")).alias("__ad"),
    )
    mad = dev.groupBy("median").agg(
        F.percentile_approx(
            "__ad", 0.5, int(1 / relative_error)
        ).alias("mad"),
        F.count(F.col(col)).alias("n_rows"),
    )
    fence = F.col("mad") * 1.4826 * k
    return (
        df.crossJoin(F.broadcast(mad))
        .select(
            F.col(col),
            "median",
            "mad",
            "n_rows",
            (F.col("median") - fence).alias("lo_fence"),
            (F.col("median") + fence).alias("hi_fence"),
        )
        .groupBy("median", "mad", "n_rows", "lo_fence", "hi_fence")
        .agg(
            F.sum(
                F.when(F.col(col) < F.col("lo_fence"), 1).otherwise(0)
            ).alias("n_below"),
            F.sum(
                F.when(F.col(col) > F.col("hi_fence"), 1).otherwise(0)
            ).alias("n_above"),
        )
    )


def corpus_health_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str | None = "source",
) -> dict:
    """One call, one dict: the numbers an ingest dashboard shows —
    row/distinct-id counts (exact + HLL ledger rows per group), the
    exact-duplicate text ratio, token-length percentiles, and null/empty
    text rates. A composition of the observability operators this
    module sits beside (`sketches.hll_ledger`, the percentile sketches)
    — three aggregations over two scans, nothing row-sized returns to
    the driver.

    This is a REPORT, not a gate: thresholds belong to
    `operators/contracts.py`, trends to `operators/drift.py`."""
    from .sketches import hll_ledger

    toks = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    )
    base = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col(id_col)).alias("n_distinct_ids"),
        F.count_distinct(F.md5(F.col(text_col).cast("binary"))).alias(
            "n_distinct_texts"
        ),
        F.sum(F.col(text_col).isNull().cast("long")).alias("n_null_text"),
        F.sum((F.length(F.coalesce(text_col, F.lit(""))) == 0).cast("long"))
        .alias("n_empty_text"),
        F.percentile_approx(
            toks, [0.5, 0.9, 0.99], 1000
        ).alias("token_percentiles"),
    ).collect()[0]
    n = int(base["n_rows"])
    report = {
        "n_rows": n,
        "n_distinct_ids": int(base["n_distinct_ids"]),
        "n_distinct_texts": int(base["n_distinct_texts"]),
        "duplicate_text_ratio": (
            round(1.0 - base["n_distinct_texts"] / n, 6) if n else 0.0
        ),
        "null_text_rate": round(base["n_null_text"] / n, 6) if n else 0.0,
        "empty_text_rate": round(base["n_empty_text"] / n, 6) if n else 0.0,
        "token_p50_p90_p99": [int(x) for x in base["token_percentiles"]],
    }
    if by is not None and by in docs.columns:
        report["per_group"] = {
            r[by]: {
                "n_rows": int(r["n_rows"]),
                "distinct_est": int(r["distinct_est"]),
            }
            for r in hll_ledger(docs, id_col, by=[by]).collect()
        }
    return report
