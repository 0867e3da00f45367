"""Streaming joins: watermarked stream-stream correlation and
stream-static broadcast enrichment.

The reference pipeline joins nothing at ingest time — each webhook
payload is self-contained (SURVEY §2.1 S1/P1) — so, like the rest of
``streaming/``, this is north-star surface: the two join shapes every
production event pipeline eventually needs.

- **Stream-stream inner join** (:func:`interval_join`): correlate two
  event streams on a key within a time interval (impression→click,
  request→response, message→reaction). Both sides carry a watermark and
  the join predicate bounds the right timestamp to
  ``[left_ts, left_ts + within]``; with both pieces in place Spark's
  symmetric hash join can evict buffered rows once the watermark passes
  their reach, so state is bounded by (rate × (watermark + within)) per
  executor — the property that lets the join run forever on a cluster.
  Omitting either piece makes state grow without bound; this module
  refuses to build such a join.
- **Stream-static join** (:func:`enrich_with_dim`): enrich a stream
  against a small batch dimension with an explicit broadcast — planned
  per micro-batch, no streaming state at all. The static side is
  re-resolved each batch, so a dimension refreshed in place (e.g. the
  compacted lake table) is picked up without restarting the query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "15 minutes",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Inner-join two streams on ``key`` where the right event lands in
    ``[left_ts, left_ts + within]``. Watermarks are applied here, on the
    already-renamed timestamp columns, so callers can't accidentally
    build the unbounded-state variant.

    The join predicate is built from raw column names, so colliding
    names would make it ambiguous or silently self-referential (e.g.
    both timestamps called ``ts`` would compare a column to itself);
    the guard below rejects those shapes up front with a clear error
    instead."""
    if left_ts == right_ts:
        raise ValueError(
            f"left_ts and right_ts must differ (both {left_ts!r}): rename "
            "one side's timestamp column before the join"
        )
    overlap = sorted(
        ({left_ts} & set(right.columns)) | ({right_ts} & set(left.columns))
    )
    if overlap:
        raise ValueError(
            f"timestamp columns must be side-unique: {overlap} appear on "
            "both inputs — rename before the join"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withColumnRenamed(key, "__rk").withWatermark(
        right_ts, watermark
    )
    return lw.join(
        rw,
        F.expr(
            f"{key} = __rk AND {right_ts} >= {left_ts} "
            f"AND {right_ts} <= {left_ts} + INTERVAL {within}"
        ),
    ).drop("__rk")


def enrich_with_dim(
    stream: DataFrame, dim: DataFrame, key: str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment: broadcast the dimension into every
    micro-batch. ``dim`` must be a batch DataFrame small enough to
    broadcast (the usual star-schema dimension); rows with no match
    survive with NULL dim columns under the default left join."""
    return stream.join(F.broadcast(dim), key, how)
