"""Streaming multimodal front door (streaming/media_ingest.py):
undecodable containers → quarantine with the decoder's reason, blank/
blurry images → reject with their stats, clean images → good zone with
stats attached; zones PARTITION the input per batch; checkpoint resume
processes only new files; good-zone media feeds the WebDataset export
end-to-end."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F, types as T

from data_pipeline_project_using_telegram_and_aws_spark.operators.media_codecs import (
    encode_gif,
    encode_png,
    encode_ppm,
)
from data_pipeline_project_using_telegram_and_aws_spark.streaming.media_ingest import (
    start_media_ingest_stream,
)

SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
    ]
)


def _sharp_img(seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def test_media_front_door_zones_and_resume(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    good, reject, quar = (
        str(tmp_path / z) for z in ("good", "reject", "quar")
    )
    ck = str(tmp_path / "ck")
    rows = [
        (1, bytearray(encode_ppm(_sharp_img(1)))),          # good
        (2, bytearray(encode_png(_sharp_img(2)))),          # good
        (3, bytearray(encode_ppm(                           # blank ->
            np.full((8, 8, 3), 128, dtype=np.uint8)))),     # reject
        (4, bytearray(b"\xff\xd8\xffcorrupt jpeg")),        # quarantine
        (5, bytearray(b"OggS not an image at all")),        # quarantine
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        str(src / "b0.parquet")
    )
    start_media_ingest_stream(
        spark, str(src) + "/*", SCHEMA, good, reject, quar, ck
    ).awaitTermination(120)

    g = {r.media_id: r for r in spark.read.parquet(good).collect()}
    rj = {r.media_id: r for r in spark.read.parquet(reject).collect()}
    q = {r.media_id: r for r in spark.read.parquet(quar).collect()}
    assert set(g) == {1, 2} and set(rj) == {3} and set(q) == {4, 5}
    assert len(g) + len(rj) + len(q) == len(rows)  # conservation
    # good rows carry bytes AND stats; stats are the real decode's
    assert bytes(g[1].media) == bytes(encode_ppm(_sharp_img(1)))
    assert g[1].width == 8 and g[1].sharpness > 1e-4
    # reject rows carry the auditable stats that failed the gate
    assert rj[3].contrast == 0.0
    # quarantine reasons quote the decoder
    assert "jpeg" in q[4].reason
    assert "undecodable container" in q[5].reason

    # resume: a later landing flows only the new file through
    # full-range indices: encode_gif's (i, 2i, 3i) palette then spans
    # bright varied colors (low indices alone would be near-black and
    # correctly REJECTED by the gate)
    spark.createDataFrame(
        [(10, bytearray(encode_gif([_sharp_img(3)[:, :, 0]])))],
        SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b1.parquet"))
    start_media_ingest_stream(
        spark, str(src) + "/*", SCHEMA, good, reject, quar, ck
    ).awaitTermination(120)
    g2 = {r.media_id for r in spark.read.parquet(good).collect()}
    assert g2 == {1, 2, 10}
    batches = {
        r.ingest_batch for r in spark.read.parquet(good).collect()
    }
    assert batches == {0, 1}


def test_media_front_door_feeds_webdataset_export(spark, tmp_path):
    """The multimodal pipeline end-to-end to the training artifact:
    streamed quality gate -> good zone -> WebDataset shard tars. Only
    admitted media reaches the tars, byte-identical."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.webdataset import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    src = tmp_path / "src"
    src.mkdir()
    good, reject, quar = (
        str(tmp_path / z) for z in ("good", "reject", "quar")
    )
    wds = str(tmp_path / "wds")
    rows = [(i, bytearray(encode_ppm(_sharp_img(i)))) for i in range(6)]
    rows.append((99, bytearray(b"broken bytes")))
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        str(src / "b0.parquet")
    )
    start_media_ingest_stream(
        spark, str(src) + "/*", SCHEMA, good, reject, quar,
        str(tmp_path / "ck"),
    ).awaitTermination(120)
    admitted = spark.read.parquet(good)
    write_webdataset_shards(
        admitted, wds, n_shards=2, id_col="media_id",
        text_col=None, media_col="media",
        meta_cols=["width", "height", "sharpness"],
    )
    back = {
        int(r.key): bytes(r.bin)
        for r in read_webdataset_shards(spark, wds).collect()
    }
    assert set(back) == set(range(6))
    for i in range(6):
        assert back[i] == bytes(encode_ppm(_sharp_img(i)))


def test_decode_or_error_quarantines_any_exception_class():
    """The quarantine contract covers ANY decode failure, not only
    ValueError: a decoder bug surfacing as IndexError/KeyError on
    malformed bytes must become a (media_id, decode_error) row, never
    fail the micro-batch. Driven directly through the Arrow-stage
    generator with a truncated-DHT jpeg (the historical IndexError
    shape, now a loud ValueError in the decoder) plus a monkeypatched
    decoder raising a non-ValueError."""
    import pandas as pd

    from data_pipeline_project_using_telegram_and_aws_spark.operators import media_codecs
    from data_pipeline_project_using_telegram_and_aws_spark.streaming.media_ingest import (
        _decode_or_error,
    )

    trunc_dht = (
        b"\xff\xd8"
        + b"\xff\xc4" + (2 + 1 + 16 + 2).to_bytes(2, "big")
        + b"\x00" + bytes([5] + [0] * 15) + b"\x01\x02"
        + b"\xff\xd9"
    )
    batch = pd.DataFrame(
        {"media_id": [1], "media": [trunc_dht]}
    )
    out = pd.concat(list(_decode_or_error(iter([batch]))))
    assert out.decode_error.notna().all()
    assert "truncated" in out.decode_error.iloc[0]

    real = media_codecs._decode
    try:
        def buggy(raw):
            raise IndexError("decoder bug on malformed bytes")

        media_codecs._decode = buggy
        out2 = pd.concat(list(_decode_or_error(iter([batch]))))
    finally:
        media_codecs._decode = real
    assert out2.decode_error.notna().all()
    assert "IndexError" in out2.decode_error.iloc[0]


def test_audio_front_door_zones_resume_and_export(spark, tmp_path):
    """The audio twin of the image front door, pinned end-to-end:
    WAV and FLAC goods, a silent WAV in the reject zone WITH its
    stats, corrupt/unknown containers quarantined with the decoder's
    reason, three-zone conservation per batch, checkpoint resume on a
    later landing, and the good zone feeding the WebDataset export
    byte-identically."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.webdataset import (
        read_webdataset_shards,
        write_webdataset_shards,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.streaming.media_ingest import (
        start_audio_ingest_stream,
    )
    from tests.test_media_codecs import _wav_bytes

    src = tmp_path / "src"
    src.mkdir()
    good, reject, quar = (
        str(tmp_path / z) for z in ("good", "reject", "quar")
    )
    ck = str(tmp_path / "ck")
    silent = _wav_bytes(samples=[0.0] * 64)
    sq = ([0.5] * 4 + [-0.5] * 4) * 64  # 512 samples = 64 ms @ 8 kHz
    tone = _wav_bytes(samples=sq)
    flac_torn = bytearray(b"fLaC" + b"\x00" * 10)
    rows = [
        (1, bytearray(tone)),                      # good
        (2, bytearray(_wav_bytes(bits=8, samples=sq))),  # good (8-bit)
        (3, bytearray(silent)),                    # reject: silence
        (4, bytearray(flac_torn)),                 # quarantine
        (5, bytearray(b"ID3 not a wav")),          # quarantine
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        str(src / "b0.parquet")
    )
    start_audio_ingest_stream(
        spark, str(src) + "/*", SCHEMA, good, reject, quar, ck
    ).awaitTermination(120)
    g = {r.media_id: r for r in spark.read.parquet(good).collect()}
    rj = {r.media_id: r for r in spark.read.parquet(reject).collect()}
    q = {r.media_id: r for r in spark.read.parquet(quar).collect()}
    assert set(g) == {1, 2} and set(rj) == {3} and set(q) == {4, 5}
    assert len(g) + len(rj) + len(q) == len(rows)  # conservation
    # good rows carry bytes AND the real decode's stats
    assert bytes(g[1].media) == tone
    assert g[1].sample_rate == 8000 and g[1].rms > 0.4
    # reject rows carry the auditable stats that failed the gate
    assert rj[3].silence_frac == 1.0 and rj[3].rms == 0.0
    # quarantine reasons quote the decoder
    assert q[4].reason and q[5].reason

    # resume: only the new landing flows
    spark.createDataFrame(
        [(10, bytearray(_wav_bytes(rate=16000, samples=sq * 2)))],
        SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b1.parquet"))
    start_audio_ingest_stream(
        spark, str(src) + "/*", SCHEMA, good, reject, quar, ck
    ).awaitTermination(120)
    gread = spark.read.parquet(good)
    assert {r.media_id for r in gread.collect()} == {1, 2, 10}
    assert {r.ingest_batch for r in gread.collect()} == {0, 1}

    # good zone -> WebDataset tars, byte-identical through the tar
    wds = str(tmp_path / "wds")
    write_webdataset_shards(
        gread, wds, n_shards=2, id_col="media_id",
        text_col=None, media_col="media",
        meta_cols=["sample_rate", "duration_s"],
    )
    back = {
        r.key: r
        for r in read_webdataset_shards(spark, wds).collect()
    }
    assert len(back) == 3
    assert bytes(back[f"{1:012d}"].bin) == tone


def test_progressive_jpeg_flows_through_front_door(spark, tmp_path):
    """A real-encoder PROGRESSIVE jpeg (SOF2) now decodes instead of
    being quarantined wholesale — the round-10 fix for the double-digit
    share of web-crawl jpegs that are progressive. Skipped where the
    fixture isn't installed; a truncated progressive stream still
    quarantines."""
    import os

    from data_pipeline_project_using_telegram_and_aws_spark.streaming.media_ingest import (
        start_media_ingest_stream,
    )

    fixture = "/usr/share/doc/nodejs/full-white-stripe.jpg"
    if not os.path.exists(fixture):
        pytest.skip("fixture not installed")
    raw = open(fixture, "rb").read()
    src = tmp_path / "src"
    src.mkdir()
    good, reject, quar = (
        str(tmp_path / z) for z in ("good", "reject", "quar")
    )
    rows = [
        (1, bytearray(raw)),
        (2, bytearray(raw[: len(raw) // 3])),  # torn mid-scan
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        str(src / "b0.parquet")
    )
    start_media_ingest_stream(
        spark, str(src) + "/*", SCHEMA, good, reject, quar,
        str(tmp_path / "ck"),
        # the stripe image is near-uniform white: gate on decode
        # success only so the good row lands in good, not reject
        min_contrast=0.0, min_sharpness=0.0, max_extreme_frac=1.0,
    ).awaitTermination(120)
    g = {r.media_id: r for r in spark.read.parquet(good).collect()}
    q = {r.media_id: r for r in spark.read.parquet(quar).collect()}
    assert set(g) == {1} and set(q) == {2}
    assert g[1].width > 0 and g[1].brightness > 0.5  # white stripe


def test_video_front_door_zones_resume_and_frame_sampling(spark, tmp_path):
    """The video edition: probe-only triage (no pixels touched at the
    door), Y4M/AVI goods with frames_decodable set, a tiny clip in
    the reject zone WITH its probe columns, unknown containers
    quarantined, conservation per batch, checkpoint resume, and the
    good zone feeding the real frame sampler downstream."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.multimodal import (
        sample_frames,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.video import (
        numpy_video_frame_sampler,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.streaming.media_ingest import (
        start_video_ingest_stream,
    )
    from tests.test_video import _avi_bytes, _dib_frame, _y4m_bytes

    src = tmp_path / "src"
    src.mkdir()
    good, reject, quar = (
        str(tmp_path / z) for z in ("good", "reject", "quar")
    )
    ck = str(tmp_path / "ck")
    y4m = _y4m_bytes(
        [
            (np.full((16, 16), 60 + 20 * i), np.full((8, 8), 128),
             np.full((8, 8), 128))
            for i in range(6)
        ],
        16, 16,
    )
    avi = _avi_bytes(
        [
            _dib_frame(np.full((16, 16, 3), v, np.uint8))
            for v in (10, 200)
        ],
        16, 16, b"\x00" * 4, rate=10, scale=1,
    )
    # 2x2 one-frame clip: probes fine, below both floors
    tiny = _y4m_bytes(
        [(np.full((2, 2), 80), np.full((1, 1), 128),
          np.full((1, 1), 128))], 2, 2,
    )
    rows = [
        (1, bytearray(y4m)),                         # good
        (2, bytearray(avi)),                         # good
        (3, bytearray(tiny)),                        # reject: floors
        (4, bytearray(b"RIFF\x10\x00\x00\x00AVI corrupt")),  # quarantine
        (5, bytearray(b"not video at all")),         # quarantine
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        str(src / "b0.parquet")
    )
    start_video_ingest_stream(
        spark, str(src) + "/*", SCHEMA, good, reject, quar, ck
    ).awaitTermination(120)
    g = {r.media_id: r for r in spark.read.parquet(good).collect()}
    rj = {r.media_id: r for r in spark.read.parquet(reject).collect()}
    q = {r.media_id: r for r in spark.read.parquet(quar).collect()}
    assert set(g) == {1, 2} and set(rj) == {3} and set(q) == {4, 5}
    assert len(g) + len(rj) + len(q) == len(rows)  # conservation
    assert bytes(g[1].media) == y4m
    assert g[1].container == "y4m" and g[1].frames_decodable
    assert g[2].codecs == ["DIB"] and g[2].frames_decodable
    # reject carries the probe columns that failed the gate
    assert (rj[3].width, rj[3].height) == (2, 2)
    assert q[4].reason and q[5].reason

    # resume: only the new landing flows
    spark.createDataFrame(
        [(10, bytearray(avi))], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b1.parquet"))
    start_video_ingest_stream(
        spark, str(src) + "/*", SCHEMA, good, reject, quar, ck
    ).awaitTermination(120)
    gread = spark.read.parquet(good)
    assert {r.media_id for r in gread.collect()} == {1, 2, 10}

    # good zone -> real frame sampling downstream, decodable rows only
    frames = sample_frames(
        gread.filter("frames_decodable"),
        max_frames=3,
        frame_sampler=numpy_video_frame_sampler,
    ).collect()
    per_media = {}
    for r in frames:
        per_media.setdefault(r.media_id, set()).add(r.frame_index)
    assert per_media[1] == {0, 2, 4}  # 6 frames strided to 3
    assert per_media[2] == {0, 1}
    assert per_media[10] == {0, 1}
