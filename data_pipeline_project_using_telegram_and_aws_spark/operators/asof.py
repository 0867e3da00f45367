"""Temporal join operators Spark lacks natively: as-of join and
interval/range join (north-star extensions; the reference itself has no
joins at all — SURVEY.md §2.3 — these serve the star-schema testdata and
the training-pipeline workloads).

Scale design (100 TB):

- **As-of join** is implemented as the *union-window* pattern: tag both
  inputs, union them, and carry the right side's columns forward with
  ``last(..., ignorenulls=True)`` over a (key, time)-ordered window. One
  shuffle on the join key, no range explosion, no per-key driver loop —
  the canonical distributed as-of. (A sort-merge "point join" would need a
  custom physical operator; the union-window gets identical semantics from
  pure Catalyst primitives and AQE handles skewed keys.)
- **Range join** maps the interval predicate onto an *equi-join on a bin
  key*: each right-side interval is exploded to every fixed-width bin it
  overlaps, the join runs on the bin id (hash shuffle or broadcast — never
  a nested-loop cross product), and a residual predicate removes edge
  false-positives. Bin width should be chosen near the median interval
  width so each interval lands in O(1) bins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

_TAG = "__asof_tag"
_TS = "__asof_ts"
_KEY = "__asof_key"
_PAYLOAD = "__asof_payload"
_CHUNK = "__asof_chunk"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    include_equal: bool = True,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of LEFT join: each left row picks up ``right_cols`` from
    the latest right row of the same key with ``right_ts <= left_ts``
    (strictly ``<`` when ``include_equal=False``); null when none exists.

    The right side must be unique per (key, ts) — pre-aggregate otherwise,
    or which row "wins" a tie is undefined (matching DuckDB ``ASOF JOIN``,
    the oracle semantics). Right rows with a NULL ``right_ts`` are dropped
    before the union — DuckDB's ASOF never matches NULL timestamps.

    All ``right_cols`` are carried as ONE struct, so a matched right row
    whose column value is legitimately NULL stays NULL (a struct of NULL
    fields is itself non-NULL), and every output row's right columns come
    from the same right row — never a mix of rows.

    Union-window plan: one hash shuffle on the key, one intra-partition
    sort — O(n log n) per key group, zero row amplification.

    **Skew guard** (``bucket_seconds``): the plain plan puts each key in
    ONE window partition, so a hot key becomes a hot task (AQE skew
    handling does not split windows). With ``bucket_seconds`` set, rows
    window within (key, time-chunk) partitions instead, and a per-chunk
    carry-in (the last right payload of all earlier chunks, computed over
    the tiny per-chunk summary table) preserves exact semantics — a hot
    key's work is spread across its time chunks.
    """
    left_out = [c for c in left.columns]
    rhs = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(right_key).alias(_KEY),
        F.col(right_ts).cast("timestamp").alias(_TS),
        F.lit(0).alias(_TAG),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_out],
        F.struct(*[F.col(c) for c in right_cols]).alias(_PAYLOAD),
    )
    payload_type = rhs.schema[_PAYLOAD].dataType
    lhs = left.select(
        F.col(left_key).alias(_KEY),
        F.col(left_ts).cast("timestamp").alias(_TS),
        F.lit(1).alias(_TAG),
        *[F.col(c) for c in left_out],
        F.lit(None).cast(payload_type).alias(_PAYLOAD),
    )
    # at equal ts: tag 0 (right) sorts first => visible to the left row.
    # include_equal=False flips the tag order so the left row comes first
    # and cannot see the same-timestamp right row.
    tag_order = F.col(_TAG).asc() if include_equal else F.col(_TAG).desc()
    union = lhs.unionByName(rhs)

    if bucket_seconds is None:
        w = (
            Window.partitionBy(_KEY)
            .orderBy(F.col(_TS).asc(), tag_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        resolved = union.select(
            _TAG,
            *left_out,
            F.last(_PAYLOAD, ignorenulls=True).over(w).alias(_PAYLOAD),
        )
    else:
        chunk = F.floor(
            F.unix_timestamp(F.col(_TS)) / F.lit(bucket_seconds)
        ).cast("long")
        union = union.withColumn(_CHUNK, chunk)
        # within-(key, chunk) carry — the hot key is split across chunks
        w1 = (
            Window.partitionBy(_KEY, _CHUNK)
            .orderBy(F.col(_TS).asc(), tag_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # per-chunk summary: the LAST right payload of each chunk (right
        # rows only; unique (key, ts) makes max_by deterministic), then a
        # window over the per-key chunk sequence yields each chunk's
        # carry-in = last payload of any EARLIER chunk. The summary table
        # has one row per (key, chunk) — tiny relative to the data.
        chunks = union.select(_KEY, _CHUNK).distinct()
        rsum = (
            union.filter(F.col(_TAG) == 0)
            .groupBy(_KEY, _CHUNK)
            .agg(F.max_by(_PAYLOAD, F.col(_TS)).alias("__chunk_last"))
        )
        w2 = (
            Window.partitionBy(_KEY)
            .orderBy(_CHUNK)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            chunks.join(rsum, [_KEY, _CHUNK], "left")
            .select(
                _KEY,
                _CHUNK,
                F.last("__chunk_last", ignorenulls=True)
                .over(w2)
                .alias("__carry_in"),
            )
        )
        # Null-safe equi-join: a left row with NULL left_ts has a NULL
        # chunk, and a plain equality join would silently DROP it — the
        # unbucketed path keeps such rows (NULLs sort first in the window,
        # so they see no right payload → NULL columns). eqNullSafe restores
        # identical LEFT-join semantics: (key, NULL) chunks match their
        # carry row, whose carry-in is NULL because NULL orders before
        # every real chunk in w2. Same for NULL join keys, which the
        # window's partitionBy groups together.
        carry = carry.select(
            F.col(_KEY).alias("__carry_key"),
            F.col(_CHUNK).alias("__carry_chunk"),
            "__carry_in",
        )
        resolved = (
            union.join(
                carry,
                F.col(_KEY).eqNullSafe(F.col("__carry_key"))
                & F.col(_CHUNK).eqNullSafe(F.col("__carry_chunk")),
            )
            .select(
                _TAG,
                _KEY,
                _CHUNK,
                *left_out,
                F.coalesce(
                    F.last(_PAYLOAD, ignorenulls=True).over(w1),
                    F.col("__carry_in"),
                ).alias(_PAYLOAD),
            )
        )

    return (
        resolved.filter(F.col(_TAG) == 1)
        .select(
            *left_out,
            *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in right_cols],
        )
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    include_equal: bool = True,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """FORWARD as-of LEFT join: each left row picks up ``right_cols``
    from the EARLIEST right row of the same key with ``right_ts >=
    left_ts`` (strictly ``>`` when ``include_equal=False``) — the
    "next event after" direction (next order after a page view, next
    reading at-or-after a query time). Same contracts as
    :func:`asof_join` (unique right (key, ts); NULL right timestamps
    never match; struct-carried columns; skew guard).

    Implementation is the time-reversal identity — forward-as-of over
    t is backward-as-of over −t — so the entire union-window machinery
    (including the chunked skew guard) is REUSED rather than mirrored:
    both timestamps negate into epoch-second doubles (microsecond
    precision preserved; a cast back to timestamp keeps ordering),
    the backward join runs, and the helper columns drop on the way
    out. Equality, tie-tag semantics, and left-row preservation are
    invariant under the negation."""
    lts, rts = "__fwd_lts", "__fwd_rts"
    lneg = left.withColumn(
        lts, -F.col(left_ts).cast("timestamp").cast("double")
    )
    rneg = right.withColumn(
        rts, -F.col(right_ts).cast("timestamp").cast("double")
    )
    out = asof_join(
        lneg,
        rneg,
        left_key,
        right_key,
        lts,
        rts,
        right_cols,
        include_equal=include_equal,
        bucket_seconds=bucket_seconds,
    )
    return out.drop(lts)


def binned_range_join(
    left: DataFrame,
    value_col: str,
    right: DataFrame,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    broadcast_right: bool = True,
) -> DataFrame:
    """Join each left row to every right interval with
    ``lo <= value < hi``, via an equi-join on a fixed-width bin key.

    The right side explodes to one row per bin its interval overlaps
    (``sequence(floor(lo/w), floor((hi)/w))``), so the join is a plain
    hash join on ``__bin`` followed by the exact residual predicate —
    never a broadcast-nested-loop over the raw inequality. With intervals
    of width ~``bin_width`` the explosion factor is ~2.
    """
    binned_right = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width).cast("long"),
                F.floor(F.col(hi_col) / bin_width).cast("long"),
            )
        ),
    )
    if broadcast_right:
        binned_right = F.broadcast(binned_right)
    binned_left = left.withColumn(
        "__bin", F.floor(F.col(value_col) / bin_width).cast("long")
    )
    return (
        binned_left.join(binned_right, "__bin")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .drop("__bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: float,
) -> DataFrame:
    """Batch interval×interval overlap join (the two-sided generalization
    of :func:`binned_range_join`): every (left, right) pair whose
    ``[start, end]`` intervals intersect, found through a fixed-width bin
    equi-join — never a nested-loop over the raw inequality pair.

    Both sides explode to the bins their interval covers; candidate
    pairs meet in shared bins and the exact overlap predicate filters
    residuals. A pair spanning several shared bins would duplicate, so
    each pair is emitted only by its **owner bin** — the bin containing
    ``greatest(left_start, right_start)``, which any overlapping pair
    shares by construction. Dedup costs a row-local comparison instead
    of a distinct shuffle. Size ``bin_width`` near the typical interval
    length: explosion factor ≈ interval/bin + 1 per side, bin occupancy
    bounds the per-bin quadratic work (same dial as the LSH bands).
    Column names must be side-unique (validated) so the joined row can
    carry both intervals."""
    overlap_cols = set(left.columns) & set(right.columns)
    if overlap_cols:
        raise ValueError(
            f"column names must be side-unique, both sides have: "
            f"{sorted(overlap_cols)} — rename before the join"
        )

    def bins(df, lo, hi):
        return df.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / bin_width).cast("long"),
                    F.floor(F.col(hi) / bin_width).cast("long"),
                )
            ),
        )

    lb = bins(left, left_start, left_end)
    rb = bins(right, right_start, right_end).withColumnRenamed(
        "__bin", "__rbin"
    )
    owner_bin = F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / bin_width
    ).cast("long")
    return (
        lb.join(rb, lb["__bin"] == rb["__rbin"])
        .filter(
            (F.col(right_start) <= F.col(left_end))
            & (F.col(left_start) <= F.col(right_end))
            & (F.col("__bin") == owner_bin)
        )
        .drop("__bin", "__rbin")
    )


def time_bucket(ts: Column, seconds: int) -> Column:
    """Fixed-width tumbling time bucket (hypertable-style): the bucket's
    start timestamp. Epoch-floor arithmetic, identical to DuckDB/Timescale
    ``time_bucket`` for widths that divide a day."""
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(ts) / F.lit(seconds)).cast("long") * seconds
    )
