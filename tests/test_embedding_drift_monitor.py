"""Streaming embedding drift monitor: per-batch centroid cosine and
norm PSI against a frozen geometry — a stable batch scores clean, a
rotated batch trips the direction signal only, a rescaled batch trips
the scale signal only; report rows land per ingest_batch and an empty
batch reports NULL signals."""

from __future__ import annotations

import pytest

from data_pipeline_project_using_telegram_and_aws_spark.streaming.embedding_drift_monitor import (
    freeze_embedding_baseline,
    score_batch_embedding_drift,
    start_embedding_drift_monitor,
)

SCHEMA = "doc_id long, embedding array<float>"


def _vecs(axis: int, scales, dim: int = 4):
    out = []
    for s in scales:
        v = [0.0] * dim
        v[axis] = float(s)
        v[(axis + 1) % dim] = 0.1 * float(s)
        out.append(v)
    return out


SCALES = [1.0, 1.2, 1.4, 1.6, 1.8, 2.0]


def test_streamed_geometry_reports(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_vecs(0, SCALES))], SCHEMA
    )
    bpath = str(tmp_path / "baseline")
    freeze_embedding_baseline(base, "embedding", bpath, norm_bins=8)

    src = tmp_path / "src"
    src.mkdir()
    batches = {
        0: _vecs(0, SCALES),                      # stable
        1: _vecs(2, SCALES),                      # rotated
        2: _vecs(0, [3 * s for s in SCALES]),     # rescaled
    }
    for b, vs in batches.items():
        spark.createDataFrame(
            [(100 * b + i, v) for i, v in enumerate(vs)], SCHEMA
        ).coalesce(1).write.parquet(str(src / f"b{b}.parquet"))

    report = str(tmp_path / "report")
    start_embedding_drift_monitor(
        spark, str(src) + "/*", SCHEMA, "embedding", bpath, report,
        str(tmp_path / "ck"), max_files_per_trigger=1,
    ).awaitTermination(180)

    rows = {
        r["ingest_batch"]: r
        for r in spark.read.parquet(report).collect()
    }
    assert len(rows) == 3
    # one file per batch is not guaranteed; identify batches by content
    by_kind = {}
    for r in rows.values():
        if r["centroid_cos"] is not None and r["centroid_cos"] < 0.5:
            by_kind["rotated"] = r
        elif r["norm_psi"] is not None and r["norm_psi"] > 0.25:
            by_kind["rescaled"] = r
        else:
            by_kind["stable"] = r
    assert set(by_kind) == {"stable", "rotated", "rescaled"}
    assert by_kind["stable"]["centroid_cos"] == pytest.approx(
        1.0, abs=1e-5
    )
    assert by_kind["stable"]["norm_psi"] == pytest.approx(0.0, abs=1e-6)
    # the two failure axes are independent: rotation leaves norms
    # alone, rescale leaves direction alone
    assert by_kind["rotated"]["norm_psi"] == pytest.approx(
        0.0, abs=1e-6
    )
    assert by_kind["rescaled"]["centroid_cos"] == pytest.approx(
        1.0, abs=1e-5
    )
    assert all(r["n_vec"] == 6 for r in rows.values())


def test_empty_batch_and_null_vectors(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_vecs(0, SCALES))], SCHEMA
    )
    bpath = str(tmp_path / "baseline")
    freeze_embedding_baseline(base, "embedding", bpath)

    empty = spark.createDataFrame([], SCHEMA)
    r = score_batch_embedding_drift(
        empty,
        "embedding",
        spark.read.parquet(bpath + "/centroid"),
        spark.read.parquet(bpath + "/norm"),
    ).collect()[0]
    assert r["n_vec"] == 0
    assert r["centroid_cos"] is None and r["norm_psi"] is None

    mixed = spark.createDataFrame(
        [(0, _vecs(0, SCALES)[0]), (1, None)], SCHEMA
    )
    r2 = score_batch_embedding_drift(
        mixed,
        "embedding",
        spark.read.parquet(bpath + "/centroid"),
        spark.read.parquet(bpath + "/norm"),
    ).collect()[0]
    assert r2["n_vec"] == 1 and r2["n_null_vec"] == 1
    assert r2["centroid_cos"] is not None
