"""Event-time streaming operators: watermarked tumbling windows, session
windows, and a custom stateful operator via ``applyInPandasWithState``.

The reference needs none of these (its one 'window' is the daily
processing-time batch, SURVEY §2.9 ST2/ST3) — they are the north-star
streaming surface, built on Structured Streaming's event-time machinery:

- **Watermark + tumbling window**: the standard late-data-tolerant
  aggregation. State for a window is dropped once the watermark passes its
  end, so state size is bounded by (watermark delay / window width) per
  key — the property that keeps a 1000-executor streaming agg from OOMing.
- **Session window**: dynamic-gap windows merged by the engine
  (``F.session_window``); works identically in batch mode, which is how
  the oracle checks it.
- **applyInPandasWithState**: the escape hatch for operators Spark lacks.
  Shown here as *streaming first-seen dedup* — keep the first row per
  content hash across micro-batches, state persisted in the checkpoint.
  (Spark's ``dropDuplicates`` on a stream does the same thing with opaque
  state; the explicit version is the template for custom state machines
  and gives us state-size/timeout control.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.exact import exact_sum
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_event_counts(
    events: DataFrame,
    window: str = "15 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time window counts with a watermark: late rows within
    the watermark still update their window; older ones are dropped and
    their window state is reclaimed."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def session_aggregate(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Session windows (gap-merged) per key: start, end (= last event +
    gap), event count, value sum. Batch and streaming share this exact
    plan — in streaming add ``withWatermark`` upstream."""
    return (
        events.groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), gap).alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact fixed-point sum: order-independent, so the rounded
            # value is engine- and run-deterministic (functions/exact.py)
            exact_sum(value_col).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("text_hash", StringType()),
        StructField("doc_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)
DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _first_seen(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit rows of a not-yet-seen hash (first batch wins; within a batch
    the lowest doc_id wins), then mark the hash seen forever."""
    if state.exists:
        return
    best = None
    for pdf in pdfs:
        if pdf.empty:
            continue
        cand = pdf.sort_values(["doc_id"]).iloc[:1]
        if best is None or cand.iloc[0]["doc_id"] < best.iloc[0]["doc_id"]:
            best = cand
    if best is None:
        return
    state.update((1,))
    yield best[["text_hash", "doc_id", "ts"]]


def streaming_first_seen_dedup(docs: DataFrame) -> DataFrame:
    """Exact streaming dedup: first document per md5(text) across all
    micro-batches, state kept per hash in the checkpoint. Input needs
    columns (doc_id, text, ts).

    State grows with the number of DISTINCT hashes forever (NoTimeout) —
    exact global dedup is inherently unbounded. For the bounded
    production variant see :func:`streaming_dedup_within_watermark`."""
    hashed = docs.withColumn("text_hash", F.md5(F.col("text").cast("binary")))
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _first_seen,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_within_watermark(
    docs: DataFrame, watermark: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Bounded-state streaming dedup: suppress re-deliveries of the same
    content arriving within the watermark horizon, via Spark's
    ``dropDuplicatesWithinWatermark`` (engine-managed state, evicted once
    the watermark passes a row's timestamp).

    The 100 TB trade vs :func:`streaming_first_seen_dedup`: state is
    bounded by (arrival rate × watermark) instead of total distinct
    corpus size, at the cost of letting a duplicate through if it
    arrives later than the horizon — exactly the right contract for
    webhook/at-least-once re-delivery dedup (SURVEY §2.9 ST4), where
    duplicates cluster within seconds of each other. A batch-side exact
    dedup (dd1) downstream remains the backstop."""
    hashed = docs.withColumn("text_hash", F.md5(F.col("text").cast("binary")))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )
