"""Incremental view maintenance over the upsert CDC changefeed:
keep a grouped aggregate (count + sums per group) current by applying
each batch's change rows as DELTAS — never rescanning the base table.

Why this exists at 100 TB: a dashboard aggregate over a keyed table
(`streaming/upsert.py`) recomputed per refresh costs a full scan +
shuffle of the table; the changefeed already names exactly which keys
changed and both sides of their values, so the aggregate can move by
|changes| work instead. This is textbook IVM for the
sum/count-measure, group-by-dimension view class:

    added   row ⇒ group(new):  count +1, sum += new.c
    removed row ⇒ group(old):  count −1, sum −= old.c
    changed row ⇒ group(old):  count −1, sum −= old.c   (then)
                  group(new):  count +1, sum += new.c

— the two-sided form handles a row MOVING groups (the case one-sided
delta rules silently corrupt). AVG and other derived measures come
from sum/count at read time; measures that are not self-maintainable
from deltas (MIN/MAX under deletes, distinct counts) are out of scope
by design — use a sketch ledger or recompute.

Consistency contract: the view carries a CURSOR (the highest
``ingest_batch`` applied, in an underscore-prefixed sidecar Spark's
readers ignore). ``refresh_grouped_view`` applies only feed partitions
above the cursor, so refreshing twice is a no-op and a crash between
write and cursor-advance re-applies one batch onto the PRE-apply view
(the write is atomic: view + cursor land together via a temp-and-swap
on the view directory). Groups whose count reaches zero leave the
view. Equality with a from-scratch recompute after any batch sequence
is the pinned invariant.

Scale shape: deltas are |changefeed-slice|-sized; the view is
group-sized; the merge is one full-outer join between them. The base
table is never read.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from .upsert import read_changefeed


def changefeed_deltas(
    feed: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    value_schema: str,
) -> DataFrame:
    """Reduce change rows to per-group (d_count, d_sum_<c>...) deltas.
    ``value_schema`` is the DDL of the packed value struct (the
    changefeed stores both sides as JSON)."""
    old_v = F.from_json("old_values", value_schema)
    new_v = F.from_json("new_values", value_schema)

    def side(v, keep_changes: list[str], sign: int) -> DataFrame:
        rows = feed.filter(F.col("change").isin(keep_changes)).select(
            *[v.getField(g).alias(g) for g in group_cols],
            F.lit(sign).cast("long").alias("d_count"),
            *[
                (F.coalesce(v.getField(c), F.lit(0.0)) * sign).alias(
                    f"d_sum_{c}"
                )
                for c in sum_cols
            ],
        )
        return rows

    both = side(old_v, ["removed", "changed"], -1).unionByName(
        side(new_v, ["added", "changed"], +1)
    )
    return both.groupBy(*group_cols).agg(
        F.sum("d_count").alias("d_count"),
        *[
            F.sum(f"d_sum_{c}").alias(f"d_sum_{c}")
            for c in sum_cols
        ],
    )


def read_view(spark: SparkSession, view_path: str) -> DataFrame:
    """Current view rows: (group..., n_rows, sum_<c>...)."""
    return spark.read.parquet(view_path)


def _cursor_path(view_path: str) -> Path:
    return Path(view_path) / "_cursor"


def _read_cursor(spark: SparkSession, view_path: str) -> int:
    p = _cursor_path(view_path)
    if not p.exists():
        return -1
    return spark.read.parquet(str(p)).collect()[0]["last_batch"]


def refresh_grouped_view(
    spark: SparkSession,
    changefeed_path: str,
    view_path: str,
    group_cols: list[str],
    sum_cols: list[str],
    value_schema: str,
) -> int:
    """Apply every changefeed partition above the view's cursor;
    returns the number of batches applied. Idempotent: a second call
    with no new feed partitions is a no-op."""
    cursor = _read_cursor(spark, view_path)
    feed = read_changefeed(spark, changefeed_path, since_batch=cursor)
    top_row = feed.agg(F.max("ingest_batch").alias("m")).collect()[0]
    if top_row["m"] is None:
        return 0
    new_cursor = int(top_row["m"])
    n_batches = feed.select("ingest_batch").distinct().count()
    deltas = changefeed_deltas(feed, group_cols, sum_cols, value_schema)

    exists = Path(view_path).exists()
    if exists:
        current = read_view(spark, view_path)
    else:
        # bootstrap with the DELTAS' group-column types (they come out
        # of the value-schema JSON parse — string-typed guesses would
        # break the full-outer join on non-string groups)
        current = deltas.limit(0).select(
            *group_cols,
            F.lit(0).cast("long").alias("n_rows"),
            *[F.lit(0.0).alias(f"sum_{c}") for c in sum_cols],
        )
    merged = (
        current.join(deltas, group_cols, "full_outer")
        .select(
            *group_cols,
            (
                F.coalesce("n_rows", F.lit(0))
                + F.coalesce("d_count", F.lit(0))
            ).alias("n_rows"),
            *[
                (
                    F.coalesce(f"sum_{c}", F.lit(0.0))
                    + F.coalesce(f"d_sum_{c}", F.lit(0.0))
                ).alias(f"sum_{c}")
                for c in sum_cols
            ],
        )
        .filter(F.col("n_rows") > 0)
        .localCheckpoint(eager=True)  # cut lineage: we overwrite input
    )
    cursor_df = spark.createDataFrame(
        [(new_cursor,)], "last_batch long"
    ).localCheckpoint(eager=True)
    # temp-and-swap: view rows + cursor land together or not at all.
    # No coalesce(1): a high-cardinality group column makes the view
    # itself large, and a single-file write would serialize it through
    # one task — let the write keep its parallelism.
    tmp = view_path + "__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    cursor_df.coalesce(1).write.mode("overwrite").parquet(
        str(Path(tmp) / "_cursor")
    )
    if exists:
        shutil.rmtree(view_path)
    Path(tmp).rename(view_path)
    return n_batches
