"""Streaming sequence packing: each micro-batch of (curated, encoded)
documents packs into training sequences and lands under its own
``ingest_batch`` partition — the continuous-dataset-production tail of
the streaming front door (contract gate → dedup ingest → THIS), where
the batch pipeline's `pack_sequences` + `materialize_sequences` run
per delivery instead of per corpus.

Contract, stated precisely:

- **sequence identity is (ingest_batch, shard, seq_id)** — batches
  pack independently (a micro-batch cannot re-open sequences an
  earlier batch already materialized; training artifacts are
  immutable once landed), so shard/seq ids repeat ACROSS batches and
  the partition column disambiguates. `read_packed_dataset` exposes
  exactly this composite.
- **replay rewrites**: dynamic partition overwrite + deterministic
  packing (hash-die slot order, same as batch) means an at-least-once
  re-delivery regenerates its partition byte-for-byte — the ledger
  pattern everywhere else in `streaming/`.
- **fill honesty**: per-batch packing fills sequences only as well as
  the batch's token mass allows; small trailing sequences per batch
  are the price of immutability (the batch pipeline amortizes tails
  over the whole corpus). `packing_stats` over any partition subset
  quantifies it; size micro-batches (maxFilesPerTrigger) so that
  batch_tokens ≫ budget · n_shards and the tail cost vanishes.

Scale: per batch, the one shard-keyed window + one partial-agg'd
materialization the batch operators document; nothing cross-batch
ever computes, so state is zero and history is never rescanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.packing import materialize_sequences, pack_sequences


def pack_batch(
    batch: DataFrame,
    batch_id: int,
    out_path: str,
    budget: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    strict: bool = False,
) -> None:
    """Pack one micro-batch and land its materialized sequences under
    ``ingest_batch=<batch_id>``."""
    spark = batch.sparkSession
    packed = pack_sequences(
        batch, budget, n_shards=n_shards, id_col=id_col,
        text_col=text_col, strict=strict,
    )
    seqs = materialize_sequences(packed, text_col=text_col).withColumn(
        "ingest_batch", F.lit(int(batch_id))
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        seqs.write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(out_path)
    )


def start_packing_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    out_path: str,
    budget: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    strict: bool = False,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source stream of documents → immutable per-batch packed
    sequence partitions."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        pack_batch(
            batch, batch_id, out_path, budget, n_shards,
            id_col, text_col, strict,
        )

    writer = stream.writeStream.foreachBatch(sink)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_packed_dataset(spark: SparkSession, out_path: str) -> DataFrame:
    """All landed sequences with their composite identity
    (ingest_batch, shard, seq_id) — partition pruning applies to any
    ``ingest_batch`` cursor filter, so incremental consumers read only
    new batches."""
    return spark.read.parquet(out_path)
