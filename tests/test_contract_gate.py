"""Streaming contract gate: good/quarantine split per micro-batch,
violation labels name every broken rule, batch-level rules are
rejected loudly, and conservation holds (every input row lands in
exactly one sink)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from data_pipeline_project_using_telegram_and_aws_spark.streaming.contract_gate import (
    row_violation_expr,
    start_contract_gate_stream,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)
RULES = [
    {"rule": "not_null", "col": "doc_id"},
    {"rule": "accepted_values", "col": "lang", "values": ["en", "de"]},
    {"rule": "bounds", "col": "score", "lo": 0.0, "hi": 1.0},
]


def test_row_violation_expr_labels(spark):
    df = spark.createDataFrame(
        [
            (1, "en", 0.5),      # clean
            (None, "xx", 2.0),   # breaks all three
            (2, "de", -0.1),     # bounds only
        ],
        SCHEMA,
    )
    got = {
        r["doc_id"]: sorted(r["v"])
        for r in df.select(
            "doc_id", row_violation_expr(RULES).alias("v")
        ).collect()
    }
    assert got[1] == []
    assert got[None] == [
        "accepted_values:lang",
        "bounds:score",
        "not_null:doc_id",
    ]
    assert got[2] == ["bounds:score"]


def test_batch_level_rules_rejected(spark):
    with pytest.raises(ValueError, match="unique"):
        row_violation_expr([{"rule": "unique", "cols": ["doc_id"]}])
    with pytest.raises(ValueError):
        row_violation_expr([])


def test_stream_splits_and_conserves(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    good = str(tmp_path / "good")
    quar = str(tmp_path / "quar")
    rows = [
        (1, "en", 0.5),
        (2, "de", 0.9),
        (None, "en", 0.5),
        (3, "xx", 0.5),
        (4, "en", 1.5),
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        str(src / "f0.parquet")
    )
    q = start_contract_gate_stream(
        spark, str(src) + "/*", SCHEMA, RULES, good, quar,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    good_df = spark.read.parquet(good)
    quar_df = spark.read.parquet(quar)
    assert {r["doc_id"] for r in good_df.collect()} == {1, 2}
    assert "violated" not in good_df.columns
    assert good_df.count() + quar_df.count() == len(rows)
    labels = {
        r["doc_id"]: sorted(r["violated"]) for r in quar_df.collect()
    }
    assert labels[3] == ["accepted_values:lang"]
    assert labels[4] == ["bounds:score"]
    assert labels[None] == ["not_null:doc_id"]

    # a second file resumes from the checkpoint and appends
    spark.createDataFrame([(5, "en", 0.1)], SCHEMA).coalesce(1).write.parquet(
        str(src / "f1.parquet")
    )
    q2 = start_contract_gate_stream(
        spark, str(src) + "/*", SCHEMA, RULES, good, quar,
        str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(good).count() == 3
    assert spark.read.parquet(quar).count() == 3
