"""Streaming embedding drift monitor: score every micro-batch's
vector geometry against a FROZEN baseline and append one report row
per batch — `operators/embedding_drift.py` turned into the in-stream
early warning, exactly as `drift_monitor.py` does for scalar PSI (and
sharing its machinery for the norm signal: the L2 norm IS a scalar,
so its baseline/PSI path is `freeze_baseline`/`score_batch_psi`
verbatim over a derived column).

Per batch: ``centroid_cos`` (cosine of the batch mean vector to the
frozen baseline centroid — the direction signal; an encoder swap
upstream shows up here within one batch) and ``norm_psi`` (the scale
signal the scale-blind cosine misses). The baseline is deliberately
immutable — the `drift_monitor` doctrine: drift is relative to a
fixed reference; re-freeze explicitly when the reference should move.

Layout: ``baseline_path/centroid`` (ONE row: centroid array + counts)
and ``baseline_path/norm`` (the scalar PSI baseline, bins-sized).
Report rows land under ``ingest_batch=<id>`` partitions — the ledger
replay pattern, re-delivery rewrites. The stream carries no state.

Scale shape per batch: one posexplode to (pos, v) partial-agged to
DIM rows (the collect that re-assembles the centroid is dim-sized, a
model constant), one bins-sized histogram, two broadcast joins of
one-row/bins-row frames. Batch row volume never funnels anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.embedding_drift import _cosine, _norm
from .drift_monitor import freeze_baseline, score_batch_psi


def _batch_centroid(df: DataFrame, vec_col: str) -> DataFrame:
    """One row: (centroid array<double>, n_vec) over the non-null
    vectors; centroid NULL when the operand is empty."""
    means = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.posexplode(F.col(vec_col)).alias("__pos", "__v"))
        .groupBy("__pos")
        .agg(F.avg(F.col("__v").cast("double")).alias("__m"))
    )
    return means.agg(
        F.when(
            F.count(F.lit(1)) > 0,
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__m"))),
                lambda s: s["__m"],
            ),
        ).alias("centroid")
    )


def freeze_embedding_baseline(
    df: DataFrame, vec_col: str, baseline_path: str, norm_bins: int = 20
) -> None:
    """Persist the reference geometry: the centroid (one row) and the
    norm distribution (`drift_monitor.freeze_baseline` over the
    row-local L2 norm). Raises on an empty or norm-degenerate
    reference, same as the scalar freezer."""
    vecs = df.filter(F.col(vec_col).isNotNull())
    freeze_baseline(
        vecs.select(_norm(F.col(vec_col)).alias("__norm")),
        "__norm",
        baseline_path + "/norm",
        bins=norm_bins,
    )
    cent = _batch_centroid(vecs, vec_col)
    cent.coalesce(1).write.mode("overwrite").parquet(
        baseline_path + "/centroid"
    )


def score_batch_embedding_drift(
    batch: DataFrame,
    vec_col: str,
    centroid_baseline: DataFrame,
    norm_baseline: DataFrame,
) -> DataFrame:
    """One row: (n_vec, n_null_vec, centroid_cos, norm_psi) for this
    batch against the frozen geometry. An empty batch reports zero
    counts with NULL signals (there is no geometry to score)."""
    counts = batch.agg(
        F.count(F.col(vec_col)).alias("n_vec"),
        (F.count(F.lit(1)) - F.count(F.col(vec_col))).alias("n_null_vec"),
    )
    cent = _batch_centroid(batch, vec_col).withColumnRenamed(
        "centroid", "__bc"
    )
    cos = (
        cent.crossJoin(
            F.broadcast(
                centroid_baseline.select(
                    F.col("centroid").alias("__base_c")
                )
            )
        )
        .select(
            F.when(
                F.col("__bc").isNotNull(),
                F.round(_cosine(F.col("__bc"), F.col("__base_c")), 6),
            ).alias("centroid_cos")
        )
    )
    psi = score_batch_psi(
        batch.filter(F.col(vec_col).isNotNull()).select(
            _norm(F.col(vec_col)).alias("__norm")
        ),
        "__norm",
        norm_baseline,
    ).select("psi")
    out = counts.crossJoin(F.broadcast(cos)).crossJoin(F.broadcast(psi))
    return out.select(
        "n_vec",
        "n_null_vec",
        "centroid_cos",
        F.when(F.col("n_vec") > 0, F.col("psi")).alias("norm_psi"),
    )


def start_embedding_drift_monitor(
    spark: SparkSession,
    source_dir: str,
    schema,
    vec_col: str,
    baseline_path: str,
    report_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source stream → one geometry report row per micro-batch
    under ``ingest_batch=<id>`` (replay rewrites). Alerting is the
    reader's job: ``filter("centroid_cos < 0.9 or norm_psi > 0.25")``."""
    centroid_baseline = spark.read.parquet(baseline_path + "/centroid")
    norm_baseline = spark.read.parquet(baseline_path + "/norm")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        report = score_batch_embedding_drift(
            batch, vec_col, centroid_baseline, norm_baseline
        ).withColumn("ingest_batch", F.lit(int(batch_id)))
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
