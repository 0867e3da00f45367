"""Streaming span-level decontamination: every micro-batch scrubs its
documents against the PERSISTED eval gram table
(`operators/decontamination.py::build_eval_gram_table`) and lands the
scrubbed rows under its own ``ingest_batch`` partition — the front-door
stage that guarantees no benchmark n-gram survives into anything
downstream (packing, SFT assembly), without dropping the documents that
quote one.

Replay contract: the ledger pattern everywhere else in `streaming/` —
deterministic scrub + dynamic partition overwrite, so an at-least-once
re-delivery rewrites its partition byte-for-byte. The one determinism
caveat is the gram table itself: it must be FROZEN for the life of the
checkpoint (suite versioning = a new gram table + a new stream/
checkpoint), or a replay after a suite update would rewrite history
scrubbed differently. An ``ingest_batch`` column arriving from an
upstream stage (the dedup good zone carries one) is re-stamped with
THIS stream's batch id — each stage's partition ledger is its own.

Per-batch observability rides along like the dedup stage's stats row:
(n_docs, n_docs_scrubbed, n_tokens, n_scrubbed_tokens) per batch under
the same partition scheme.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.decontamination import scrub_contaminated_spans


def scrub_ingest_batch(
    batch: DataFrame,
    batch_id: int,
    gram_table: str,
    out_path: str,
    stats_path: str | None = None,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hits_per_doc: int | None = None,
) -> None:
    """Scrub one micro-batch against ``gram_table`` and land it under
    ``ingest_batch=<batch_id>`` (dynamic overwrite — replay rewrites)."""
    spark = batch.sparkSession
    scrubbed = scrub_contaminated_spans(
        batch.drop("ingest_batch"),
        None,
        n=n,
        id_col=id_col,
        text_col=text_col,
        max_hits_per_doc=max_hits_per_doc,
        eval_grams=spark.table(gram_table),
    ).localCheckpoint(eager=True)  # scrub once, write twice
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    stamp = F.lit(int(batch_id)).alias("ingest_batch")
    (
        scrubbed.select("*", stamp)
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(out_path)
    )
    if stats_path is not None:
        stats = scrubbed.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_scrubbed_tokens") > 0).cast("long")).alias(
                "n_docs_scrubbed"
            ),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_scrubbed_tokens").alias("n_scrubbed_tokens"),
        ).select(
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("n_docs_scrubbed", F.lit(0)).alias(
                "n_docs_scrubbed"
            ),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_scrubbed_tokens", F.lit(0)).alias(
                "n_scrubbed_tokens"
            ),
            stamp,
        )
        (
            stats.write.mode("overwrite")
            .partitionBy("ingest_batch")
            .parquet(stats_path)
        )


def start_scrub_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    gram_table: str,
    out_path: str,
    checkpoint_dir: str,
    stats_path: str | None = None,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hits_per_doc: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        scrub_ingest_batch(
            batch, batch_id, gram_table, out_path, stats_path,
            n, id_col, text_col, max_hits_per_doc,
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
