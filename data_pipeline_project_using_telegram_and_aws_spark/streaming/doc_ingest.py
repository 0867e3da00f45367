"""Streaming DOCUMENT front door — the binary-column twin of the
crawl/media chains for office/ebook/PDF corpora: every micro-batch
of (doc_id, doc) rows is

1. QUARANTINED on extraction failure: every row runs the REAL
   unified extractor (`operators/documents.py` — magic-byte dispatch
   into the PDF / OOXML / ODF / EPUB parsers); a row whose container
   cannot be named, or that names one and then fails structurally
   (torn zip, broken xref, encrypted payload), lands in the
   quarantine zone with the extractor's raise text as the reason
   (the front-door doctrine from `media_ingest.py`: undecodable
   bytes are a data defect to audit, not a row to crash on).
2. RESOLVED: EPUB rows return markup; the JVM
   `documents.document_plain_text` (html_to_text) resolves them in
   the same batch — no second Python stage.
3. GATED: extracted rows below the text-quality thresholds land in
   the reject zone WITH their stats (auditable): too little visible
   text (``min_chars``) or too low extraction confidence
   (``max_unmapped_frac`` — the PDF glyph-coverage signal; formats
   that store text as text always pass it).
4. GOOD rows land with original bytes + text + metadata — the raw
   zone's keep-the-bytes contract, so a better extractor can re-run
   without refetching.

Zones partition the input exactly: |batch| = |quarantine| + |reject|
+ |good| per batch — including degenerate ids: a row whose doc_id is
NULL (or uncastable to long) or duplicated within the batch is
quarantined up front with a ``bad doc_id`` reason, because the
byte-carrying zone writes join back by id and an inner join would
silently drop NULL ids and fan out duplicates, breaking the
invariant. All three land under ``ingest_batch=<batch_id>``
dynamic partition overwrite (deterministic transform ⇒ at-least-once
replay rewrites byte-identically — the ledger pattern everywhere in
`streaming/`).

Scale shape: the only Python is the extraction itself (the
documented Arrow path), over the slim (id, bytes) projection; the
markup resolution, the gate and the zone splits are plain column
filters. Document bytes dominate row size, so the batch is
checkpointed once and each zone write joins back by id (broadcast —
the per-batch id set is small by definition of a micro-batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.documents import document_plain_text, extract_documents


def ingest_documents_batch(
    batch: DataFrame,
    batch_id: int,
    good_path: str,
    reject_path: str,
    quarantine_path: str,
    min_chars: int = 80,
    max_unmapped_frac: float = 0.2,
    id_col: str = "doc_id",
    doc_col: str = "doc",
) -> None:
    spark = batch.sparkSession
    raw = batch.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(doc_col).alias("doc"),
    ).localCheckpoint(eager=True)  # read the source once, split thrice
    # Degenerate ids break the join-back-by-id zone writes (NULL never
    # matches an inner join; duplicates fan out) — quarantine them up
    # front so the zone invariant holds row-for-row.
    dup_ids = (
        raw.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"))
        .filter((F.col("__n") > 1) & F.col("doc_id").isNotNull())
        .select("doc_id")
    )
    bad_fmt = F.lit(None).cast("string").alias("format")
    bad_id = (
        raw.filter(F.col("doc_id").isNull())
        .select("doc_id", "doc", bad_fmt,
                F.lit("bad doc_id: null or not castable to long")
                .alias("reason"))
        .unionByName(
            raw.join(F.broadcast(dup_ids), "doc_id", "left_semi")
            .select("doc_id", "doc", bad_fmt,
                    F.lit("bad doc_id: duplicated within batch")
                    .alias("reason"))
        )
    )
    slim = raw.filter(F.col("doc_id").isNotNull()).join(
        F.broadcast(dup_ids), "doc_id", "left_anti"
    )
    rows = document_plain_text(
        extract_documents(slim)
    ).localCheckpoint(eager=True)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    stamp = F.lit(int(batch_id)).alias("ingest_batch")

    quarantined = rows.filter(F.col("error").isNotNull()).select(
        "doc_id", "format", F.col("error").alias("reason"), stamp
    )
    (
        slim.join(F.broadcast(quarantined), "doc_id")
        .select("doc_id", "doc", "format", "reason", "ingest_batch")
        .unionByName(bad_id.select("doc_id", "doc", "format",
                                   "reason", stamp))
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(quarantine_path)
    )

    extracted = rows.filter(F.col("error").isNull())
    n_chars = F.length(F.col("plain_text"))
    unmapped_frac = F.col("n_unmapped") / F.greatest(
        F.length(F.col("text")), F.lit(1)
    )
    passes = (n_chars >= min_chars) & (unmapped_frac <= max_unmapped_frac)
    audit_cols = [
        "doc_id", "format", "n_units", "n_unmapped",
        n_chars.alias("n_chars"),
        F.round(unmapped_frac, 6).alias("unmapped_frac"),
    ]
    (
        extracted.filter(~passes)
        .select(*audit_cols, stamp)
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(reject_path)
    )
    good = extracted.filter(passes).select(
        "doc_id", "format", "plain_text", "title", "creator",
        "created", "modified", "language", "n_units", "n_unmapped",
    )
    (
        slim.join(F.broadcast(good), "doc_id")
        .select(
            "doc_id", "doc", "format", "plain_text", "title",
            "creator", "created", "modified", "language", "n_units",
            "n_unmapped", stamp,
        )
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(good_path)
    )


def start_document_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    good_path: str,
    reject_path: str,
    quarantine_path: str,
    checkpoint_dir: str,
    min_chars: int = 80,
    max_unmapped_frac: float = 0.2,
    id_col: str = "doc_id",
    doc_col: str = "doc",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source stream of (doc_id, doc binary) parquet →
    quarantine / reject / good zones per the module recipe."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", max_files_per_trigger
        )
    stream = reader.parquet(source_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        ingest_documents_batch(
            batch, batch_id, good_path, reject_path, quarantine_path,
            min_chars, max_unmapped_frac, id_col, doc_col,
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
