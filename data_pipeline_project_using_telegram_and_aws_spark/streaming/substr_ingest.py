"""Streaming exact-substring dedup ingest — the `dedup_ingest` front
door at SPAN granularity: every micro-batch probes the persisted
gram-position index (`operators/substr_dedup.py`), admitted documents
land in the good zone ALREADY CUT (no corpus-repeated ≥k run
survives the door), and repeats discovered against already-landed
documents become retro-span ledger rows — the cut-all-copies policy's
debt to history, applied by a compaction pass instead of rewriting
landed partitions inside the batch.

Replay contract (inherited from the `dedup_ingest` scoping): good
zone, span audit, retro ledger, and stats are per-batch
``ingest_batch`` partitions under dynamic overwrite, and
classification is replay-stable scoped to the batch id — index rows
stamped by THIS batch id are exempted at probe time, so re-delivery
rewrites every partition with its original contents. The index
append on replay re-inserts rows it already has; harmless for
classification (hash membership is idempotent) — the retro-island
stitch runs on DISTINCT (doc, pos), so padded index rows cannot
split or widen spans.

Retro semantics, stated honestly: a span shared between a new doc
and a landed doc is cut from the NEW doc immediately; the landed
occurrence is only recorded. Until `apply_retro_spans` runs at
compaction, the corpus holds one surviving copy — the door
guarantees no NEW copy enters, the ledger guarantees the old one is
findable and cuttable. That is the strongest contract available
without in-batch history rewrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.substr_dedup import (
    append_to_gram_index,
    build_gram_index,
    exact_substr_against_index,
    remove_spans,
    translate_spans_to_cut,
)


def ingest_batch_with_substr_dedup(
    batch: DataFrame,
    batch_id: int,
    index_table: str,
    good_path: str,
    retro_path: str,
    k: int = 50,
    spans_path: str | None = None,
    stats_path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 32,
) -> None:
    spark = batch.sparkSession
    if not spark.catalog.tableExists(index_table):
        build_gram_index(
            batch.limit(0), index_table, k, buckets, id_col, text_col
        )
    cleaned, batch_spans, retro_spans = exact_substr_against_index(
        spark, batch, index_table, k, id_col, text_col,
        batch_id=int(batch_id),
    )
    cleaned = cleaned.localCheckpoint(eager=True)  # classify once
    batch_spans = batch_spans.localCheckpoint(eager=True)
    retro_spans = retro_spans.localCheckpoint(eager=True)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    stamp = F.lit(int(batch_id)).alias("ingest_batch")
    (
        cleaned.select("*", stamp)
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(good_path)
    )
    (
        retro_spans.select("*", stamp)
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(retro_path)
    )
    if spans_path is not None:
        (
            batch_spans.select("*", stamp)
            .write.mode("overwrite")
            .partitionBy("ingest_batch")
            .parquet(spans_path)
        )
    # index the ORIGINAL batch text (operator docstring: later repeats
    # must match what this batch carried, not what survived the cut)
    append_to_gram_index(
        spark, batch, index_table, k, id_col, text_col,
        batch_id=int(batch_id),
    )
    if stats_path is not None:
        n_docs = cleaned.count()
        n_cut = batch_spans.count()
        n_retro = retro_spans.count()
        spark.createDataFrame(
            [(n_docs, n_cut, n_retro, int(batch_id))],
            "n_docs long, n_spans_cut long, n_retro_spans long, "
            "ingest_batch long",
        ).write.mode("overwrite").partitionBy("ingest_batch").parquet(
            stats_path
        )


def start_substr_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    index_table: str,
    good_path: str,
    retro_path: str,
    checkpoint_dir: str,
    k: int = 50,
    spans_path: str | None = None,
    stats_path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 32,
    available_now: bool = True,
) -> StreamingQuery:
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        ingest_batch_with_substr_dedup(
            batch, batch_id, index_table, good_path, retro_path, k,
            spans_path, stats_path, id_col, text_col, buckets,
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def apply_retro_spans(
    corpus: DataFrame,
    retro: DataFrame,
    door_spans: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The compaction-side settlement of the retro ledger: cut every
    recorded span from the landed corpus (`remove_spans` merges
    overlapping rows from different batches, so accumulation is
    idempotent). Run it when rewriting the good zone anyway —
    compaction, erasure, re-packing — never as its own scan.

    COORDINATES: retro spans speak the documents' ORIGINAL text (the
    gram index is built from pre-cut batch text, by contract), but
    the good zone stores DOOR-CUT text. Pass the spans audit zone
    (``spans_path``) as ``door_spans`` and the ledger rows are
    translated through the door cuts
    (`substr_dedup.translate_spans_to_cut`) before cutting —
    without it (None), the settlement asserts the corpus text was
    never door-cut (true for corpora built by the BATCH operator with
    pre-cut input, false in general for the streaming good zone:
    passing None there deletes the wrong bytes from any landed doc
    that was itself cut at admission)."""
    spans = retro.select(id_col, "span_start", "span_length")
    if door_spans is not None:
        spans = translate_spans_to_cut(
            spans,
            door_spans.select(id_col, "span_start", "span_length"),
            id_col,
        )
    return remove_spans(corpus, spans, id_col, text_col)
