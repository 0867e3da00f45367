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


def freeze_categorical_baseline(
    df: DataFrame, col: str, path: str
) -> None:
    """Persist the reference CATEGORY distribution: one (cat, p) row
    per observed category (NULL folded to its own '<null>' category),
    plus n_rows metadata on every row — the categorical twin of
    :func:`freeze_baseline` for lang/source/event_type columns."""
    cat = F.coalesce(F.col(col).cast("string"), F.lit("<null>"))
    counts = df.groupBy(cat.alias("cat")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n")).collect()[0][0] or 0
    if total == 0:
        raise ValueError("freeze_categorical_baseline: empty baseline")
    (
        counts.select(
            "cat",
            (F.col("n") / total).alias("p"),
            F.lit(int(total)).alias("n_rows"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path)
    )


def score_batch_categorical(
    batch: DataFrame, col: str, baseline: DataFrame
) -> DataFrame:
    """One row per batch: (jsd, tv, n_new_categories, n_rows) against
    the frozen category distribution. FULL outer from the start —
    batch mass in a category the baseline never saw is the loudest
    drift signal and must contribute (the lesson the numeric scorer
    learned the hard way). The join operand is category-cardinality-
    sized on both sides; nothing here scales with batch rows beyond
    the one counting aggregation."""
    cat = F.coalesce(F.col(col).cast("string"), F.lit("<null>"))
    counts = batch.groupBy(cat.alias("cat")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("t"))
    q_rows = counts.crossJoin(F.broadcast(total)).select(
        "cat", (F.col("n") / F.greatest("t", F.lit(1))).alias("q")
    )
    joined = (
        baseline.select("cat", "p")
        .join(q_rows, "cat", "full_outer")
        .select(
            F.coalesce("p", F.lit(0.0)).alias("p"),
            F.coalesce("q", F.lit(0.0)).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2.0

    def kl_term(x):
        return F.when(
            F.col(x) > 0, F.col(x) * F.log(F.col(x) / m)
        ).otherwise(F.lit(0.0))

    scored = joined.agg(
        F.round((F.sum(kl_term("p")) + F.sum(kl_term("q"))) / 2.0, 6).alias(
            "jsd"
        ),
        F.round(F.sum(F.abs(F.col("p") - F.col("q"))) / 2.0, 6).alias("tv"),
        F.sum(
            ((F.col("p") == 0.0) & (F.col("q") > 0.0)).cast("long")
        ).alias("n_new_categories"),
    )
    n = batch.agg(F.count(F.lit(1)).alias("n_rows"))
    return scored.crossJoin(F.broadcast(n))


def start_categorical_drift_monitor(
    spark: SparkSession,
    source_dir: str,
    schema,
    col: str,
    baseline_path: str,
    report_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Categorical twin of :func:`start_drift_monitor`: one
    (jsd, tv, n_new_categories, n_rows) report row per micro-batch
    under its replay-idempotent ``ingest_batch`` partition."""
    baseline = spark.read.parquet(baseline_path)
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        report = score_batch_categorical(batch, col, baseline).withColumn(
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
