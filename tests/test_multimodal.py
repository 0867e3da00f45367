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


def test_injectable_decoder_plugs_in_without_code_change(spark):
    """A real environment swaps the stub for its own batch decoder (PIL /
    ffmpeg dispatch) via the `decoder` argument — shipped to executors
    like any UDF, schema contract enforced by mapInPandas."""
    import pandas as pd

    from data_pipeline_project_using_telegram_and_aws_spark.operators.multimodal import (
        MEDIA_FEATURE_SCHEMA,
        extract_media_features,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, bytearray(b"defg"))],
        "media_id long, media binary",
    )

    def my_decoder(batch: pd.DataFrame) -> pd.DataFrame:
        rows = [
            {
                "media_id": mid,
                "n_bytes": len(bytes(m)),
                "content_hash": "custom",
                "width": 1, "height": 2, "n_frames": 3,
                "feature": [0.5],
            }
            for mid, m in zip(batch["media_id"], batch["media"])
        ]
        return pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURE_SCHEMA.fields])

    got = {r.media_id: (r.n_bytes, r.content_hash, r.width)
           for r in extract_media_features(df, decoder=my_decoder).collect()}
    assert got == {1: (3, "custom", 1), 2: (4, "custom", 1)}


def test_sample_frames_stride_and_determinism(spark):
    import hashlib

    from data_pipeline_project_using_telegram_and_aws_spark.operators.multimodal import (
        sample_frames,
    )

    # n_frames rule: 1 + len % 8 -> b"xxxxx" has 6 frames, b"x" has 2
    df = spark.createDataFrame(
        [(1, bytearray(b"xxxxx")), (2, bytearray(b"x"))],
        "media_id long, media binary",
    )
    rows = sample_frames(df, max_frames=3, fake=True).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    # 6 frames at max 3 -> stride 2 -> indices 0,2,4; 2 frames -> 0,1
    assert sorted(r.frame_index for r in by_media[1]) == [0, 2, 4]
    assert sorted(r.frame_index for r in by_media[2]) == [0, 1]
    assert all(r.n_frames == 6 for r in by_media[1])
    want = hashlib.md5(b"xxxxx" + (2).to_bytes(4, "big")).hexdigest()
    got = next(r.frame_hash for r in by_media[1] if r.frame_index == 2)
    assert got == want


def test_sample_frames_requires_fake_or_injected(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.multimodal import (
        sample_frames,
    )

    df = spark.createDataFrame([(1, bytearray(b"x"))], "media_id long, media binary")
    try:
        sample_frames(df)
    except NotImplementedError:
        pass
    else:
        raise AssertionError("stub decoder accepted without fake=True")


def test_resize_media_deterministic_stub(spark):
    import hashlib

    from data_pipeline_project_using_telegram_and_aws_spark.operators.multimodal import (
        resize_media,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"imgdata")), (2, None)],
        "media_id long, media binary",
    )
    rows = {r.media_id: r for r in resize_media(df, 32, 24, fake=True).collect()}
    assert rows[1].width == 32 and rows[1].height == 24
    want = hashlib.md5(b"imgdata" + b"32x24").digest()
    assert bytes(rows[1].resized) == want
    # null payload resizes the empty bytes, deterministically
    assert bytes(rows[2].resized) == hashlib.md5(b"" + b"32x24").digest()


def test_resize_media_requires_fake_or_injected(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.multimodal import (
        resize_media,
    )

    df = spark.createDataFrame([(1, bytearray(b"x"))], "media_id long, media binary")
    try:
        resize_media(df, 8, 8)
    except NotImplementedError:
        pass
    else:
        raise AssertionError("stub resizer accepted without fake=True")
