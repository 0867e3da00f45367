"""Snapshot algebra over keyed tables: collapse a change log to its
current state, and diff two snapshots into an auditable change set —
the two halves of every lakehouse upsert/merge workflow, as plain
DataFrame ops.

- :func:`latest_snapshot`: an append-only CDC/update log (several rows
  per key over time) → exactly one row per key, the one with the
  highest sequence. One keyed window; ties broken deterministically by
  a caller-named tiebreak column so replays and layouts can't flip the
  winner. Optional tombstone handling drops keys whose latest row is a
  delete — the MERGE-with-deletes semantic.
- :func:`snapshot_diff`: two snapshots of the same key schema → one row
  per differing key labeled ``added`` / ``removed`` / ``changed``, with
  both sides' values carried for audit. Implemented as a full outer
  join on the key plus a hash compare over the (sorted) non-key
  columns, so the comparison cost is one shuffle of each side and the
  output is change-sized. The day-over-day ingest audit: diff today's
  `latest_snapshot` against yesterday's, alert on unexpected churn.

At 100 TB both are one-shuffle shapes on the key; `snapshot_diff`
composes with the theta-sketch overlap (`operators/sketches.py`) as the
cheap screen — sketch first to see IF snapshots differ materially,
diff after to see WHICH keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def latest_snapshot(
    log: DataFrame,
    keys: list[str],
    seq_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """One row per key: the highest-``seq_col`` row. With
    ``delete_col`` (boolean), keys whose WINNING row is a tombstone are
    dropped entirely (the tombstone still beats older upserts — a
    delete followed by nothing stays deleted)."""
    if not keys:
        raise ValueError("latest_snapshot: keys must be non-empty")
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), *[F.col(k) for k in keys]
    )
    latest = (
        log.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
    if delete_col is not None:
        latest = latest.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    return latest


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
) -> DataFrame:
    """(keys..., change, old_values, new_values): one row per key that
    was added, removed, or changed between snapshots; unchanged keys
    produce no row. Value columns are compared by a hash over the
    non-key columns sorted BY NAME, so column order differences between
    snapshots don't read as churn (schemas must agree on names)."""
    if not keys:
        raise ValueError("snapshot_diff: keys must be non-empty")
    val_cols = sorted(set(old.columns) - set(keys))
    if val_cols != sorted(set(new.columns) - set(keys)):
        raise ValueError(
            "snapshot_diff: snapshots disagree on non-key columns: "
            f"{sorted(set(old.columns) ^ set(new.columns))}"
        )

    def packed(df: DataFrame, side: str) -> DataFrame:
        strs = [
            F.coalesce(F.col(c).cast("string"), F.lit("\0NULL"))
            for c in val_cols
        ]
        return df.select(
            *keys,
            F.to_json(F.struct(*val_cols)).alias(f"{side}_values"),
            F.md5(F.concat_ws("\x1f", *strs)).alias(f"__h_{side}"),
        )

    o, n = packed(old, "old"), packed(new, "new")
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("__h_old").isNull(), "added")
        .when(F.col("__h_new").isNull(), "removed")
        .when(F.col("__h_old") != F.col("__h_new"), "changed")
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*keys, "change", "old_values", "new_values")
    )
