"""Streaming exact-dedup ingest: every micro-batch probes the
persisted exact-hash index (`operators/dedup.py::exact_dedup_against_
index`), admitted documents land in the good zone and GROW the index,
duplicates land in a labeled reject zone with their keeper — the
"never store the same bytes twice" front door, as a stream.

Replay contract, stated precisely: the good zone and the reject zone
are per-batch ``ingest_batch`` partitions (dynamic overwrite — the
ledger pattern, re-delivery rewrites), and classification itself is
replay-STABLE *scoped to the batch id*: a re-delivered row whose
indexed keeper is its own id AND whose index row was admitted by THIS
batch id re-classifies as admitted (self-match = no-match inside
`exact_dedup_against_index`), so the good zone, reject zone, AND the
stats row all rewrite with their original contents. The batch scoping
is load-bearing: a document RE-SENT under a NEW batch id (at-least-
once upstream, not a replay) fails the batch check and lands in the
reject zone as a duplicate of its own corpus copy — without the
scope, the same bytes would be re-admitted into a second good-zone
partition. The re-run's index append pads the index with rows it
already has — harmless (per-hash min wins; compaction dedupes). A
crash between the good-zone write and the index append replays
against the un-grown index and rewrites the same partitions
identically; convergent either way.

Per-batch observability rides along: one stats row per batch
(admitted/duplicate counts, dedup ratio) under the same partition
scheme — the ingest-health series `resample`/drift tooling consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    append_to_exact_hash_index,
    build_exact_hash_index,
    exact_dedup_against_index,
)


def ingest_batch_with_dedup(
    batch: DataFrame,
    batch_id: int,
    index_table: str,
    good_path: str,
    reject_path: str,
    stats_path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 32,
) -> None:
    spark = batch.sparkSession
    if not spark.catalog.tableExists(index_table):
        # bootstrap: an empty index with the right layout
        build_exact_hash_index(
            batch.limit(0), index_table, buckets, id_col, text_col
        )
    admitted, dups = exact_dedup_against_index(
        spark, batch, index_table, id_col, text_col, batch_id=int(batch_id)
    )
    admitted = admitted.localCheckpoint(eager=True)  # classify once
    dups = dups.localCheckpoint(eager=True)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    stamp = F.lit(int(batch_id)).alias("ingest_batch")
    (
        admitted.drop("text_hash")
        .select("*", stamp)
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(good_path)
    )
    (
        dups.select("*", stamp)
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(reject_path)
    )
    append_to_exact_hash_index(
        spark, admitted, index_table, id_col, batch_id=int(batch_id)
    )
    if stats_path is not None:
        n_adm, n_dup = admitted.count(), dups.count()
        total = n_adm + n_dup
        spark.createDataFrame(
            [
                (
                    n_adm,
                    n_dup,
                    round(n_dup / total, 6) if total else 0.0,
                    int(batch_id),
                )
            ],
            "n_admitted long, n_duplicates long, dup_ratio double, "
            "ingest_batch long",
        ).write.mode("overwrite").partitionBy("ingest_batch").parquet(
            stats_path
        )


def start_dedup_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    index_table: str,
    good_path: str,
    reject_path: str,
    checkpoint_dir: str,
    stats_path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 32,
    available_now: bool = True,
) -> StreamingQuery:
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        ingest_batch_with_dedup(
            batch, batch_id, index_table, good_path, reject_path,
            stats_path, id_col, text_col, buckets,
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
