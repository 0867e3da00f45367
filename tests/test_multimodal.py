"""Multimodal plumbing: binary columns, mapInPandas decode stage (fake
decoder), stub gating."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.multimodal import (
    MEDIA_FEATURE_SCHEMA,
    attach_media_metadata,
    decode_media_batch,
    extract_media_features,
)


def _media(spark):
    rows = [(i, bytes([i % 251] * (100 + i)), "image/fake") for i in range(20)]
    return spark.createDataFrame(rows, ["media_id", "media", "media_type"])


def test_metadata_jvm_side(spark):
    out = attach_media_metadata(_media(spark)).collect()
    assert all(r.media_n_bytes == 100 + r.media_id for r in out)
    assert all(len(r.media_hash) == 32 for r in out)


def test_real_decode_is_explicitly_stubbed():
    batch = pd.DataFrame({"media_id": [1], "media": [b"xx"]})
    with pytest.raises(NotImplementedError):
        decode_media_batch(batch, fake=False)


def test_fake_decode_deterministic_and_schema_stable(spark):
    df = _media(spark)
    a = extract_media_features(df, fake=True, partitions=4)
    b = extract_media_features(df, fake=True, partitions=2)
    assert a.schema == MEDIA_FEATURE_SCHEMA
    ra = sorted((tuple(r) for r in a.collect()))
    rb = sorted((tuple(r) for r in b.collect()))
    assert ra == rb                      # partitioning-invariant
    assert len(ra) == 20
    row = dict(zip([f.name for f in MEDIA_FEATURE_SCHEMA.fields], ra[0]))
    assert row["n_bytes"] == 100
    assert len(row["feature"]) == 8
    assert 16 <= row["width"] < 80 and 16 <= row["height"] < 80


def test_nulls_survive_decode(spark):
    df = spark.createDataFrame(
        [(1, None, "image/fake")],
        "media_id long, media binary, media_type string",
    )
    out = extract_media_features(df, fake=True).collect()
    assert out[0].n_bytes == 0
