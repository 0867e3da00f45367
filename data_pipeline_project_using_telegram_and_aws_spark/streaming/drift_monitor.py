"""Streaming drift monitor: score every micro-batch's distribution
against a FROZEN baseline histogram and append one PSI report row per
batch — `operators/drift.py` turned into the in-stream early-warning
the batch report can only give after the fact.

Shape: the baseline (bin probabilities + range, bins+1 tiny rows) is
frozen once by `freeze_baseline` and persisted; each micro-batch
reduces to a bins-sized histogram (one partial-agg'd aggregation),
joins the broadcast baseline, and lands a ONE-ROW report under its own
``ingest_batch`` partition — the `sketch_ledger` replay pattern, so
at-least-once re-delivery rewrites rather than duplicates. The stream
carries no state; the baseline is deliberately immutable (drift is
relative to a fixed reference — a moving baseline hides slow drift;
re-freeze explicitly when the reference should move).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.drift import EPS, histogram


def freeze_baseline(
    df: DataFrame, col: str, path: str, bins: int = 20
) -> None:
    """Persist the reference distribution: one (bin, p) row per
    OCCUPIED bin, every row also carrying the lo/hi/bins/n_rows
    metadata (so any row can seed the scorer's binning)."""
    stats = df.agg(
        F.min(F.col(col)).alias("lo"),
        F.max(F.col(col)).alias("hi"),
        F.count(F.col(col)).alias("n"),
    ).collect()[0]
    if stats["lo"] is None or not stats["hi"] > stats["lo"]:
        raise ValueError(
            "freeze_baseline: need >= 2 distinct non-null values"
        )
    lo, hi, n = float(stats["lo"]), float(stats["hi"]), int(stats["n"])
    h = histogram(df, col, bins, lo, hi)
    rows = h.select(
        F.col("bin"),
        (F.col("n") / n).alias("p"),
        F.lit(lo).alias("lo"),
        F.lit(hi).alias("hi"),
        F.lit(bins).alias("bins"),
        F.lit(n).alias("n_rows"),
    )
    rows.coalesce(1).write.mode("overwrite").parquet(path)


def score_batch_psi(
    batch: DataFrame, col: str, baseline: DataFrame
) -> DataFrame:
    """One row: (psi, n_rows, n_null) for this batch against the
    frozen baseline. Baseline is bins-sized → broadcast."""
    meta = baseline.limit(1).collect()[0]
    lo, hi, bins = float(meta["lo"]), float(meta["hi"]), int(meta["bins"])
    counts = batch.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(col).isNull().cast("long")).alias("n_null"),
    )
    h = histogram(batch, col, bins, lo, hi)
    total = h.agg(F.sum("n").alias("t"))
    # FULL outer: the baseline stores only occupied bins, so batch
    # mass landing in a bin the baseline never saw (a new mode — the
    # strongest drift signal) must still contribute its
    # q·ln((q+eps)/eps) term, matching operators/drift.psi_report
    scored = (
        baseline.select("bin", "p")
        .join(h, "bin", "full_outer")
        .crossJoin(F.broadcast(total))
        .select(
            F.coalesce("p", F.lit(0.0)).alias("p"),
            (F.coalesce("n", F.lit(0)) / F.greatest("t", F.lit(1))).alias(
                "q"
            ),
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("p") - F.col("q"))
                    * F.log((F.col("p") + EPS) / (F.col("q") + EPS))
                ),
                6,
            ).alias("psi")
        )
    )
    return scored.crossJoin(F.broadcast(counts))


def start_drift_monitor(
    spark: SparkSession,
    source_dir: str,
    schema,
    col: str,
    baseline_path: str,
    report_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """File-source stream → one PSI report row per micro-batch under
    ``ingest_batch=<id>`` (replay rewrites). Alerting is the reader's
    job: ``spark.read.parquet(report_path).filter("psi > 0.25")``."""
    baseline = spark.read.parquet(baseline_path)
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        report = score_batch_psi(batch, col, baseline).withColumn(
            "ingest_batch", F.lit(int(batch_id))
        )
        s.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        (
            report.write.mode("overwrite")
            .partitionBy("ingest_batch")
            .parquet(report_path)
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
