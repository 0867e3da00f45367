"""Streaming ingestion: webhook stream → filtered raw zone (SURVEY §2.9).

The reference's first Lambda (ipynb:295-339, cell 21): every Telegram
update arrives as an HTTP POST; updates from foreign chats are dropped
(``chat_id == TELEGRAM_CHAT_ID``, ipynb:325 — the P1 ingest-side filter);
survivors are persisted verbatim into the raw zone partitioned by *arrival*
date (ipynb:330).

Spark shape: a Structured Streaming file source watches a landing
directory (the webhook stand-in; Kafka/Kinesis in prod — same plan with a
different ``format``), filters, stamps processing-time ``context_date``,
and appends JSON partitioned by it. Checkpointing gives at-least-once with
exactly-once file-sink semantics — an ST4 upgrade over the reference.

The two-timeline model (ST3) is preserved: ``context_date`` is processing
time, the event-time epoch ``message.date`` rides along untouched, so
"late" data lands in the arrival-day partition exactly like the reference.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..schemas import RAW_UPDATE_SCHEMA
from ..sources.lake import TelegramLake, arrival_date


def start_ingest_stream(
    spark: SparkSession,
    lake: TelegramLake,
    landing_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Start (or drain, with ``available_now``) the ingestion stream."""
    updates = (
        spark.readStream.schema(RAW_UPDATE_SCHEMA)
        .option("maxFilesPerTrigger", 1000)
        .json(landing_dir)
    )
    if lake.chat_id is not None:
        updates = updates.filter(
            F.col("message.chat.id") == F.lit(lake.chat_id)
        )
    # arrival date on the pipeline's UTC-3 clock (reference ipynb:310)
    stamped = updates.withColumn(
        "context_date",
        arrival_date(F.current_timestamp(), lake.ingest_tz),
    )

    writer = (
        stamped.writeStream.format("json")
        .option("path", lake.raw_path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("context_date")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
