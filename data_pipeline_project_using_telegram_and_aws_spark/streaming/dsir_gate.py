"""Streaming DSIR gate: every micro-batch scores its documents against
a PERSISTED log-ratio table (`operators/dsir.build_ratio_table`) and
lands them — optionally thresholded — under an ``ingest_batch``
partition: the front-door stage that attaches target-likeness
(``dsir_logw``) to documents the moment they arrive, so downstream
selection (`dsir_select` over the accumulated good zone) or a hard gate
runs without a second corpus pass.

The persisted-reference discipline is `scrub_stream.py`'s: the ratio
table must be FROZEN for the life of the checkpoint (refreshing ratios
— e.g. from `stat_ledgers.profile_so_far` as the raw corpus grows —
means a NEW table name + a new stream/checkpoint), or an at-least-once
replay would re-score history under different ratios and break the
rewrite-byte-identical replay contract. Scoring itself is deterministic
(hashed grams, fixed table), so a re-delivered batch overwrites its
partition with identical rows.

Two modes, stated loudly:
- ``threshold=None`` (default): score-and-carry — every document lands
  with its ``dsir_logw``; selection stays a downstream, revisitable
  decision (the DSIR paper's sampling needs the whole scored pool).
- ``threshold=x``: hard gate — documents below x are DROPPED from the
  good zone (counted in the stats row, like the dedup stage's
  quarantine counts, but not retained: a threshold gate is a policy
  filter, not an audit trail; compose `operators/curation.py` when the
  dropped side must be explainable row-by-row).

Per-batch stats row: (n_docs, n_kept, logw_min, logw_mean, logw_max)
under the same partition scheme — the drift read ("is this feed getting
less target-like?") without touching the documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dsir import DEFAULT_N_BUCKETS, dsir_importance


def score_ingest_batch(
    batch: DataFrame,
    batch_id: int,
    ratio_table: str,
    out_path: str,
    stats_path: str | None = None,
    threshold: float | None = None,
    n_buckets: int = DEFAULT_N_BUCKETS,
    salt: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Score one micro-batch against ``ratio_table`` and land it under
    ``ingest_batch=<batch_id>`` (dynamic overwrite — replay rewrites).
    ``n_buckets``/``salt`` must match the profiles the table was built
    from — they define the feature space."""
    spark = batch.sparkSession
    scored = dsir_importance(
        batch.drop("ingest_batch"),
        spark.table(ratio_table),
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        salt=salt,
    ).localCheckpoint(eager=True)  # score once, write twice
    kept = (
        scored
        if threshold is None
        else scored.filter(F.col("dsir_logw") >= float(threshold))
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    stamp = F.lit(int(batch_id)).alias("ingest_batch")
    (
        kept.select("*", stamp)
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(out_path)
    )
    if stats_path is not None:
        kept_flag = (
            F.lit(True)
            if threshold is None
            else F.col("dsir_logw") >= float(threshold)
        )
        stats = scored.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept_flag.cast("long")).alias("n_kept"),
            F.min("dsir_logw").alias("logw_min"),
            F.avg("dsir_logw").alias("logw_mean"),
            F.max("dsir_logw").alias("logw_max"),
        ).select(
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            "logw_min",
            "logw_mean",
            "logw_max",
            stamp,
        )
        (
            stats.write.mode("overwrite")
            .partitionBy("ingest_batch")
            .parquet(stats_path)
        )


def start_dsir_gate_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    ratio_table: str,
    out_path: str,
    checkpoint_dir: str,
    stats_path: str | None = None,
    threshold: float | None = None,
    n_buckets: int = DEFAULT_N_BUCKETS,
    salt: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
) -> StreamingQuery:
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        score_ingest_batch(
            batch, batch_id, ratio_table, out_path, stats_path,
            threshold, n_buckets, salt, id_col, text_col,
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
