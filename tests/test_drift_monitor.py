"""Streaming drift monitor: stable batches score inside the stable
band, a shifted batch crosses the investigate threshold, one report
row per batch with replay idempotence, and checkpointed resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from data_pipeline_project_using_telegram_and_aws_spark.streaming.drift_monitor import (
    freeze_baseline,
    score_batch_psi,
    start_drift_monitor,
)

SCHEMA = T.StructType([T.StructField("x", T.DoubleType())])


def _uniform(spark, n, lo, hi, seed):
    return spark.range(n).select(
        (
            lo
            + (hi - lo)
            * (F.pmod(F.xxhash64("id", F.lit(seed)), 10_000) / 10_000.0)
        ).alias("x")
    )


def test_stream_scores_batches(spark, tmp_path):
    base_path = str(tmp_path / "baseline")
    freeze_baseline(_uniform(spark, 4000, 0.0, 1.0, seed=1), "x", base_path)

    src = tmp_path / "src"
    src.mkdir()
    report = str(tmp_path / "report")
    ckpt = str(tmp_path / "ckpt")
    # batch 0: same distribution; batch 1: hard shift
    _uniform(spark, 2000, 0.0, 1.0, seed=2).coalesce(1).write.parquet(
        str(src / "stable.parquet")
    )
    q = start_drift_monitor(
        spark, str(src) + "/*", SCHEMA, "x", base_path, report, ckpt
    )
    q.awaitTermination(120)
    _uniform(spark, 2000, 0.6, 1.6, seed=3).coalesce(1).write.parquet(
        str(src / "shifted.parquet")
    )
    q2 = start_drift_monitor(
        spark, str(src) + "/*", SCHEMA, "x", base_path, report, ckpt
    )
    q2.awaitTermination(120)

    rows = {
        r["ingest_batch"]: r for r in spark.read.parquet(report).collect()
    }
    assert len(rows) == 2
    assert rows[0]["psi"] < 0.1          # stable band
    assert rows[1]["psi"] > 0.25         # investigate band
    assert rows[0]["n_rows"] == 2000

    # restart with nothing new: no report rows added or changed
    q3 = start_drift_monitor(
        spark, str(src) + "/*", SCHEMA, "x", base_path, report, ckpt
    )
    q3.awaitTermination(120)
    assert spark.read.parquet(report).count() == 2


def test_score_batch_matches_batch_report(spark, tmp_path):
    """The streaming scorer and operators/drift.psi_report agree on the
    same (baseline, current) pair within histogram-vs-minmax noise."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.drift import psi_report

    base = _uniform(spark, 3000, 0.0, 1.0, seed=1)
    cur = _uniform(spark, 3000, 0.2, 1.2, seed=2)
    base_path = str(tmp_path / "b")
    freeze_baseline(base, "x", base_path)
    stream_psi = score_batch_psi(
        cur, "x", spark.read.parquet(base_path)
    ).collect()[0]["psi"]
    batch_psi = psi_report(base, cur, "x")["psi"]
    assert abs(stream_psi - batch_psi) < 0.05
    with pytest.raises(ValueError):
        freeze_baseline(
            spark.createDataFrame([(1.0,)], "x double"), "x",
            str(tmp_path / "bad"),
        )


def test_new_mode_in_baseline_empty_bin_counts(spark, tmp_path):
    """Regression: batch mass landing in a bin the baseline never
    occupied (a NEW mode) used to vanish from the PSI sum because the
    scorer left-joined from the baseline side and the baseline persists
    only occupied bins. It must contribute its q·ln((q+eps)/eps) term,
    matching the batch-side psi_report on the same pair."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.drift import psi_report

    # bimodal baseline: bins in the middle of [0, 1] are empty
    base = _uniform(spark, 1000, 0.0, 0.05, seed=1).unionAll(
        _uniform(spark, 1000, 0.95, 1.0, seed=2)
    )
    # the whole batch lands in the baseline-empty middle
    cur = _uniform(spark, 1000, 0.45, 0.55, seed=3)
    base_path = str(tmp_path / "b")
    freeze_baseline(base, "x", base_path)
    stream_psi = score_batch_psi(
        cur, "x", spark.read.parquet(base_path)
    ).collect()[0]["psi"]
    batch_psi = psi_report(base, cur, "x")["psi"]
    # identical binning (both fix edges from the baseline min/max), so
    # the two scorers must agree tightly — and the new mode dominates
    assert stream_psi > 5.0
    assert abs(stream_psi - batch_psi) < 1e-3


CAT_SCHEMA = T.StructType([T.StructField("lang", T.StringType())])


def _langs(spark, spec):
    rows = [(c,) for c, n in spec.items() for _ in range(n)]
    return spark.createDataFrame(rows, CAT_SCHEMA)


def test_categorical_stream_scores_batches(spark, tmp_path):
    """Stable batch in the stable band; a batch dominated by a never-
    seen language crosses it, with the new category counted; one row
    per batch; replay-stable restart."""
    from data_pipeline_project_using_telegram_and_aws_spark.streaming.drift_monitor import (
        freeze_categorical_baseline,
        score_batch_categorical,
        start_categorical_drift_monitor,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.drift import (
        categorical_drift_report,
    )

    base = _langs(spark, {"en": 700, "de": 200, "fr": 100})
    bpath = str(tmp_path / "cat_base")
    freeze_categorical_baseline(base, "lang", bpath)

    src = tmp_path / "src"
    src.mkdir()
    report = str(tmp_path / "rep")
    ckpt = str(tmp_path / "ck")
    _langs(spark, {"en": 350, "de": 100, "fr": 50}).coalesce(1).write.parquet(
        str(src / "stable.parquet")
    )
    start_categorical_drift_monitor(
        spark, str(src) + "/*", CAT_SCHEMA, "lang", bpath, report, ckpt
    ).awaitTermination(120)
    _langs(spark, {"zz": 400, "en": 100}).coalesce(1).write.parquet(
        str(src / "shifted.parquet")
    )
    start_categorical_drift_monitor(
        spark, str(src) + "/*", CAT_SCHEMA, "lang", bpath, report, ckpt
    ).awaitTermination(120)

    rows = {
        r["ingest_batch"]: r for r in spark.read.parquet(report).collect()
    }
    assert len(rows) == 2
    assert rows[0]["jsd"] < 0.01 and rows[0]["n_new_categories"] == 0
    assert rows[1]["jsd"] > 0.3 and rows[1]["n_new_categories"] == 1
    assert rows[1]["n_rows"] == 500

    # scorer parity with the batch report on the same pair
    cur = _langs(spark, {"zz": 400, "en": 100})
    stream_row = score_batch_categorical(
        cur, "lang", spark.read.parquet(bpath)
    ).collect()[0]
    batch_rep = categorical_drift_report(base, cur, "lang")
    assert stream_row["jsd"] == pytest.approx(batch_rep["js_divergence"])
    assert stream_row["tv"] == pytest.approx(batch_rep["total_variation"])

    # restart with nothing new: no rows added
    start_categorical_drift_monitor(
        spark, str(src) + "/*", CAT_SCHEMA, "lang", bpath, report, ckpt
    ).awaitTermination(120)
    assert spark.read.parquet(report).count() == 2
