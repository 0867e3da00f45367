"""Streaming model inference: the trained quality classifier scoring a
structured stream directly — ``PipelineModel.transform`` is an ordinary
row-wise plan, so the same fitted model serves batch curation AND the
live ingest gate with zero code difference; batch/stream score parity
is the pinned contract."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id long, text string"


def _write_batch(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture(scope="module")
def model(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.quality_classifier import (
        train_quality_classifier,
    )

    import random

    rng = random.Random(3)
    prose = "the quick brown fox jumps over the lazy dog".split()
    junk = ["zz%d" % i for i in range(50)]
    rows = [(i, " ".join(rng.choice(prose) for _ in range(10)), 1.0)
            for i in range(80)]
    rows += [(100 + i, " ".join(rng.choice(junk) for _ in range(10)), 0.0)
             for i in range(80)]
    return train_quality_classifier(
        spark.createDataFrame(rows, ["doc_id", "text", "label"]),
        n_features=1 << 12,
    )


def test_stream_scores_match_batch_scores(spark, model, tmp_path):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.quality_classifier import (
        score_documents,
    )

    docs = [
        {"doc_id": 1, "text": "the quick brown fox"},
        {"doc_id": 2, "text": "zz1 zz2 zz3 zz4"},
        {"doc_id": 3, "text": "over the lazy dog"},
    ]
    landing = str(tmp_path / "landing")
    _write_batch(landing, "a.json", docs)

    stream = spark.readStream.schema(DOCS_SCHEMA).json(landing)
    scored = score_documents(model, stream)
    out = str(tmp_path / "out")
    q = (
        scored.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.doc_id: r.quality_prob for r in spark.read.parquet(out).collect()
    }
    batch = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in docs], ["doc_id", "text"]
    )
    want = {
        r.doc_id: r.quality_prob
        for r in score_documents(model, batch).collect()
    }
    assert got == want and len(got) == 3
    # and the scores separate as trained
    assert got[1] > 0.5 and got[3] > 0.5 and got[2] < 0.5


def test_stream_filter_gate_composes(spark, model, tmp_path):
    """The keep-gate as a streaming transformation: filter on the score
    column inside the streaming plan, prose passes, junk quarantined by
    omission."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.quality_classifier import (
        score_documents,
    )

    landing = str(tmp_path / "landing")
    _write_batch(landing, "b.json", [
        {"doc_id": 10, "text": "the quick brown fox jumps"},
        {"doc_id": 11, "text": "zz7 zz8 zz9"},
    ])
    stream = spark.readStream.schema(DOCS_SCHEMA).json(landing)
    kept = score_documents(model, stream).filter(F.col("quality_prob") >= 0.5)
    out = str(tmp_path / "kept")
    q = (
        kept.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert ids == {10}
