"""Time-series resampling: densify a grouped series onto a regular
grid (every missing bucket gets a row) and fill the introduced gaps —
zero-fill for counts, forward-fill for levels.

Why an operator: an aggregation like the reference's daily message
count (`q1`) silently OMITS empty days — the chart reading "no row"
and the chart reading "0 messages" are different claims, and a
downstream join/window on the sparse series propagates the hole. No
Spark built-in densifies; the standard recipe composed here is:

1. per group, the bucket span [min, max] (one aggregation);
2. ``explode(sequence(lo, hi, step))`` — the dense calendar, generated
   ROW-LOCALLY from each group's 1-row span (no driver range, no
   cross join against a global calendar — a group's calendar is its
   own span only);
3. left join the observed buckets back (keyed shuffle on group+bucket,
   the same key the aggregation producing the input already used);
4. fill: ``zero_fill`` columns get 0, ``ffill`` columns get
   ``last(col, ignorenulls) OVER (group ORDER BY bucket)`` — one
   per-group window, and a ``__observed`` flag keeps imputed rows
   auditable.

Scale: the dense calendar is (groups × buckets-in-span) rows — the
OUTPUT size, nothing larger; both joins/windows key on the group. A
pathological span (one stray 1970 timestamp) inflates a group's
calendar; ``max_buckets_per_group`` guards it in-plan, same stance as
``blocked_neardup_pairs``'s block cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_MAX_BUCKETS = 100_000


def resample(
    df: DataFrame,
    bucket_col: str,
    by: list[str] | None = None,
    step: int = 1,
    zero_fill: list[str] | None = None,
    ffill: list[str] | None = None,
    max_buckets_per_group: int = DEFAULT_MAX_BUCKETS,
) -> DataFrame:
    """Densify ``df`` (one row per (group, bucket), ``bucket_col``
    integer-like — day numbers, epoch hours, window ids) onto the full
    [min, max] grid per group with stride ``step``. Returns the input
    columns plus ``__observed`` (false on imputed rows); ``zero_fill``
    columns default to 0 on imputed rows, ``ffill`` columns carry the
    last observed value forward (NULL before the first observation)."""
    keys = list(by or [])
    zero_fill = list(zero_fill or [])
    ffill = list(ffill or [])
    span = (
        df.groupBy(*keys).agg(
            F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
        )
        if keys
        else df.agg(
            F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
        )
    )
    n_buckets = (F.col("__hi") - F.col("__lo")) / step + 1
    guarded = span.filter(
        F.assert_true(
            n_buckets <= F.lit(max_buckets_per_group),
            F.concat_ws(
                " ",
                F.lit("resample: group span"),
                F.col("__lo").cast("string"),
                F.lit(".."),
                F.col("__hi").cast("string"),
                F.lit(
                    f"exceeds max_buckets_per_group={max_buckets_per_group}"
                    " - check for stray out-of-range bucket values"
                ),
            ),
        ).isNull()
    )
    calendar = guarded.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
        ).alias(bucket_col),
    )
    joined = calendar.join(
        df.withColumn("__observed", F.lit(True)),
        keys + [bucket_col],
        "left",
    ).withColumn("__observed", F.coalesce("__observed", F.lit(False)))
    out = joined
    for c in zero_fill:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if ffill:
        w = (
            Window.partitionBy(*keys)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, 0)
            if keys
            else Window.partitionBy()
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in ffill:
            out = out.withColumn(
                c, F.last(F.col(c), ignorenulls=True).over(w)
            )
    return out
