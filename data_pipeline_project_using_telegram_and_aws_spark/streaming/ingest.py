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

**Malformed payloads** (SURVEY §1.4 "permissive JSON parsing / rescue
pattern"): by default a broken webhook body parses to an all-null row and
is silently dropped by the chat filter — the reference's behavior (its
Lambda 500s and Telegram retries). With ``quarantine_dir`` set, the
stream captures every unparseable line verbatim (plus an arrival
timestamp) into a quarantine area via ``foreachBatch``, so bad payloads
are auditable and replayable instead of lost. foreachBatch delivery is
at-least-once, so both of its outputs key their layout on the
deterministic micro-batch id (``ingest_batch=`` partition + dynamic
overwrite): a re-delivered batch rewrites its own partitions instead of
appending duplicates — effective exactly-once for the two-output route.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..schemas import RAW_UPDATE_SCHEMA
from ..sources.lake import TelegramLake, arrival_date

CORRUPT_COL = "_corrupt_record"


def _schema_with_corrupt() -> T.StructType:
    # fresh StructType each call — StructType.add mutates in place
    return T.StructType(
        list(RAW_UPDATE_SCHEMA.fields)
        + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def start_ingest_stream(
    spark: SparkSession,
    lake: TelegramLake,
    landing_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    quarantine_dir: str | None = None,
) -> StreamingQuery:
    """Start (or drain, with ``available_now``) the ingestion stream."""
    if quarantine_dir is not None:
        return _start_with_quarantine(
            spark, lake, landing_dir, checkpoint_dir, available_now,
            quarantine_dir,
        )
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


def _start_with_quarantine(
    spark: SparkSession,
    lake: TelegramLake,
    landing_dir: str,
    checkpoint_dir: str,
    available_now: bool,
    quarantine_dir: str,
) -> StreamingQuery:
    """Two-output ingest: good rows → raw zone, unparseable lines →
    quarantine (verbatim + arrival timestamp), split per micro-batch."""
    updates = (
        spark.readStream.schema(_schema_with_corrupt())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("maxFilesPerTrigger", 1000)
        .json(landing_dir)
    )

    def sink(batch, batch_id: int) -> None:
        # foreachBatch is at-least-once: after a failure the SAME batch id
        # is re-delivered with the SAME rows. Both writes below key their
        # layout on that id (ingest_batch= partition + dynamic overwrite),
        # so a replay rewrites its own partitions instead of appending
        # duplicates — upgrading the two-output route to effective
        # exactly-once (the file sink's commit log gives the single-output
        # route the same property).
        batch = batch.cache()  # consumed twice (good + bad split)
        try:
            bad = batch.filter(F.col(CORRUPT_COL).isNotNull()).select(
                F.col(CORRUPT_COL).alias("payload"),
                F.current_timestamp().alias("quarantined_at"),
                F.lit(batch_id).alias("ingest_batch"),
            )
            (
                bad.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .json(quarantine_dir)
            )
            good = batch.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
            if lake.chat_id is not None:
                good = good.filter(
                    F.col("message.chat.id") == F.lit(lake.chat_id)
                )
            lake.write_raw(good, ingest_batch=batch_id)
        finally:
            batch.unpersist()

    writer = (
        updates.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
