"""Pure-NumPy media codecs (operators/media_codecs.py): hand-built PPM
and BMP bytes decode to exact pixels, features match independent
arithmetic, the Spark mapInPandas plumbing runs them end to end, and
undecodable containers fail loudly naming the row."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_project_using_telegram_and_aws_spark.operators.media_codecs import (
    decode_bmp,
    decode_ppm,
    encode_ppm,
    numpy_image_decoder,
    numpy_resize_batch,
    sniff_format,
)
from data_pipeline_project_using_telegram_and_aws_spark.operators.multimodal import (
    extract_media_features,
    resize_media,
)

# a 2x2 image: red, green / blue, white (RGB rows top-down)
PIXELS = np.array(
    [
        [[255, 0, 0], [0, 255, 0]],
        [[0, 0, 255], [255, 255, 255]],
    ],
    dtype=np.uint8,
)


def _ppm_bytes() -> bytes:
    # hand-assembled, with a comment line the parser must skip
    return (
        b"P6\n# hand-built fixture\n2 2\n255\n" + PIXELS.tobytes()
    )


def _bmp_bytes() -> bytes:
    # 24bpp BI_RGB, stride 8 (2*3 padded to 4), rows bottom-up, BGR
    def row(px):
        return b"".join(bytes([b, g, r]) for r, g, b in px) + b"\x00\x00"

    body = row(PIXELS[1]) + row(PIXELS[0])  # bottom row first
    header = (
        b"BM"
        + (54 + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")  # pixel array offset
        + (40).to_bytes(4, "little")  # BITMAPINFOHEADER size
        + (2).to_bytes(4, "little", signed=True)  # width
        + (2).to_bytes(4, "little", signed=True)  # height (bottom-up)
        + (1).to_bytes(2, "little")  # planes
        + (24).to_bytes(2, "little")  # bpp
        + (0).to_bytes(4, "little")  # BI_RGB
        + b"\x00" * 20
    )
    return header + body


def test_ppm_and_bmp_decode_to_identical_pixels():
    assert sniff_format(_ppm_bytes()) == "ppm"
    assert sniff_format(_bmp_bytes()) == "bmp"
    assert sniff_format(b"\xff\xd8\xff") is None  # jpeg magic
    np.testing.assert_array_equal(decode_ppm(_ppm_bytes()), PIXELS)
    np.testing.assert_array_equal(decode_bmp(_bmp_bytes()), PIXELS)
    # encode→decode round trip is the identity
    np.testing.assert_array_equal(decode_ppm(encode_ppm(PIXELS)), PIXELS)


def test_decoder_failures_are_loud():
    with pytest.raises(ValueError, match="payload"):
        decode_ppm(b"P6\n2 2\n255\n\x00")  # truncated body
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")
    bad_bpp = bytearray(_bmp_bytes())
    bad_bpp[28] = 8
    with pytest.raises(ValueError, match="only 24-bit"):
        decode_bmp(bytes(bad_bpp))


def test_real_decoder_through_spark_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_ppm_bytes())), (2, bytearray(_bmp_bytes()))],
        "media_id long, media binary",
    )
    rows = {
        r.media_id: r
        for r in extract_media_features(
            df, decoder=numpy_image_decoder
        ).collect()
    }
    # identical pixels -> identical features across containers
    f = np.array(PIXELS.reshape(-1, 3), dtype=np.float64) / 255.0
    want_means = f.mean(axis=0)
    want_luma = round(
        0.299 * want_means[0] + 0.587 * want_means[1] + 0.114 * want_means[2],
        6,
    )
    for mid in (1, 2):
        r = rows[mid]
        assert (r.width, r.height, r.n_frames) == (2, 2, 1)
        assert r.feature[0] == pytest.approx(round(want_means[0], 6))
        assert r.feature[6] == pytest.approx(want_luma)
        assert r.feature[7] == pytest.approx(1.0)  # aspect
    assert rows[1].feature == rows[2].feature


def test_real_resize_through_spark_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_ppm_bytes()))], "media_id long, media binary"
    )
    out = resize_media(
        df, width=4, height=2, resizer=numpy_resize_batch
    ).collect()[0]
    assert (out.width, out.height) == (4, 2)
    resized = decode_ppm(bytes(out.resized))
    # nearest-neighbor doubling along x: each source column repeats
    want = PIXELS[:, [0, 0, 1, 1]]
    np.testing.assert_array_equal(resized, want)


def test_undecodable_row_fails_naming_the_id(spark):
    df = spark.createDataFrame(
        [(7, bytearray(b"\xff\xd8\xffjpegish"))],
        "media_id long, media binary",
    )
    with pytest.raises(Exception, match="media_id=7"):
        extract_media_features(df, decoder=numpy_image_decoder).collect()


# --------------------------------------------------------------- audio


def _wav_bytes(bits=16, rate=8000, channels=1, samples=None) -> bytes:
    import struct

    if samples is None:
        # one full period of a square wave at rate/8 Hz, 16 samples
        samples = ([0.5] * 4 + [-0.5] * 4) * 2
    if bits == 16:
        body = b"".join(
            struct.pack("<h", int(s * 32768)) for s in samples
            for _ in range(channels)
        )
    else:
        body = bytes(
            int(s * 128) + 128 for s in samples for _ in range(channels)
        )
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block, block, bits
    )
    chunks = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"LIST" + (4).to_bytes(4, "little") + b"INFO"  # skipped chunk
        + b"data" + len(body).to_bytes(4, "little") + body
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_wav_decode_matches_hand_arithmetic():
    import numpy as np

    from data_pipeline_project_using_telegram_and_aws_spark.operators.media_codecs import (
        decode_wav,
    )

    rate, x = decode_wav(_wav_bytes())
    assert rate == 8000 and x.shape == (16, 1)
    np.testing.assert_allclose(
        x[:, 0], ([0.5] * 4 + [-0.5] * 4) * 2, atol=1e-3
    )
    # 8-bit unsigned path
    rate8, x8 = decode_wav(_wav_bytes(bits=8))
    np.testing.assert_allclose(
        x8[:, 0], ([0.5] * 4 + [-0.5] * 4) * 2, atol=1e-2
    )
    # stereo interleave
    _, x2 = decode_wav(_wav_bytes(channels=2))
    assert x2.shape == (16, 2)
    np.testing.assert_allclose(x2[:, 0], x2[:, 1])


def test_wav_failures_are_loud():
    from data_pipeline_project_using_telegram_and_aws_spark.operators.media_codecs import (
        decode_wav,
    )

    with pytest.raises(ValueError, match="not a riff"):
        decode_wav(b"OggS compressed audio")
    # format tag 85 = mp3-in-wav: needs ffmpeg
    raw = bytearray(_wav_bytes())
    raw[20] = 85
    with pytest.raises(ValueError, match="only integer PCM"):
        decode_wav(bytes(raw))


def test_audio_features_through_spark_plumbing(spark):
    import math

    from data_pipeline_project_using_telegram_and_aws_spark.operators.media_codecs import (
        extract_audio_features,
    )

    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes()))], "media_id long, media binary"
    )
    r = extract_audio_features(df).collect()[0]
    assert (r.sample_rate, r.n_channels, r.n_samples) == (8000, 1, 16)
    assert r.duration_s == pytest.approx(16 / 8000)
    # square wave at ±0.5: rms ≈ 0.5, peak ≈ 0.5, dc ≈ 0,
    # 3 sign flips over 15 transitions
    assert r.feature[0] == pytest.approx(0.5, abs=1e-3)   # rms
    assert r.feature[1] == pytest.approx(0.5, abs=1e-3)   # peak
    assert r.feature[2] == pytest.approx(3 / 15, abs=1e-6)  # zcr
    assert abs(r.feature[3]) < 1e-3                        # dc
    assert r.feature[7] == 0.0                             # silence frac
    bad = spark.createDataFrame(
        [(9, bytearray(b"OggS..."))], "media_id long, media binary"
    )
    with pytest.raises(Exception, match="media_id=9"):
        extract_audio_features(bad).collect()


def test_audio_frame_energies_localize_silence(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.media_codecs import (
        audio_frame_energies,
    )

    # 3 frames at 8000 Hz / 25 ms = 200 samples each: loud, SILENT, loud
    samples = [0.5] * 200 + [0.0] * 200 + [-0.5] * 200
    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(samples=samples)))],
        "media_id long, media binary",
    )
    rows = sorted(
        audio_frame_energies(df, frame_ms=25).collect(),
        key=lambda r: r.frame_index,
    )
    assert [r.n_frames for r in rows] == [3, 3, 3]
    assert [r.start_s for r in rows] == [0.0, 0.025, 0.05]
    assert rows[0].rms == pytest.approx(0.5, abs=1e-3)
    assert rows[1].rms == pytest.approx(0.0, abs=1e-4)  # the silent frame
    assert rows[2].peak == pytest.approx(0.5, abs=1e-3)
    # the VAD-style composition: silence trimming is a plain filter
    kept = audio_frame_energies(df, frame_ms=25).filter("rms > 0.01")
    assert sorted(r.frame_index for r in kept.collect()) == [0, 2]
    with pytest.raises(ValueError, match="frame_ms"):
        audio_frame_energies(df, frame_ms=0)
