"""WAV codec-variant decode — G.711 μ-law/A-law, IMA ADPCM, float and
wide-integer PCM, WAVE_FORMAT_EXTENSIBLE — pinned against INDEPENDENT
scalar reference implementations written here from the published specs
(G.711 segment layout; the IMA ADPCM reference algorithm), never by
calling the module under test. The reference ingests no audio at all
(Data_Pipeline_Project_using_Telegram_and_AWS is a text webhook
pipeline); this is north-star multimodal surface, tested the same way
the JPEG/PNG/FLAC decoders are: encoder and decoder written twice,
independently, equality asserted."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from data_pipeline_project_using_telegram_and_aws_spark.operators.media_codecs import (
    decode_wav,
)

# ------------------------------------------------------------- builders


def _wav(tag, channels, rate, bits, block_align, data,
         fmt_ext=b"", fact=None, subformat=None):
    """Assemble a RIFF/WAVE file by hand (independent of the reader)."""
    fmt = struct.pack(
        "<HHIIHH", tag, channels, rate,
        rate * max(block_align, 1), block_align, bits,
    )
    if subformat is not None:  # WAVE_FORMAT_EXTENSIBLE
        # KSDATAFORMAT_SUBTYPE GUID in wire layout: Data1 LE (tag in
        # the low word), Data2=0000, Data3=0010 LE, Data4 big-endian
        guid = struct.pack("<H", subformat) + bytes.fromhex(
            "000000001000800000aa00389b71"
        )
        fmt_ext = struct.pack("<HHI", 22, bits, 0x4) + guid
    if fmt_ext:
        fmt += fmt_ext
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    if len(fmt) & 1:
        chunks += b"\x00"
    if fact is not None:
        chunks += b"fact" + (4).to_bytes(4, "little") + struct.pack(
            "<I", fact
        )
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    if len(data) & 1:
        chunks += b"\x00"
    return (
        b"RIFF" + (4 + len(chunks)).to_bytes(4, "little")
        + b"WAVE" + chunks
    )


# --------------------------------------------- independent G.711 scalar


def _ulaw_decode_scalar(byte: int) -> int:
    u = ~byte & 0xFF
    mag = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return 0x84 - mag if u & 0x80 else mag - 0x84


def _alaw_decode_scalar(byte: int) -> int:
    a = byte ^ 0x55
    seg = (a >> 4) & 0x07
    t = ((a & 0x0F) << 4) + (8 if seg == 0 else 0x108)
    mag = t << max(seg - 1, 0)
    return mag if a & 0x80 else -mag


def _ulaw_encode_scalar(pcm: int) -> int:
    """Linear → μ-law, by segment search (the spec's definition)."""
    sign = 0x80 if pcm < 0 else 0
    mag = min(-pcm if pcm < 0 else pcm, 32635) + 0x84
    seg = mag.bit_length() - 8  # top set bit above the 7-bit mantissa
    mant = (mag >> (seg + 3)) & 0x0F
    return ~(sign | (seg << 4) | mant) & 0xFF


def test_g711_known_extremes_and_zeros():
    # published table anchors: μ-law 0x00 = -32124, 0x80 = +32124,
    # 0xFF = 0; A-law 0x55 = -8, 0xD5 = +8, 0x2A = -32256, 0xAA = +32256
    data = bytes([0x00, 0x80, 0xFF, 0x7F])
    rate, x = decode_wav(_wav(7, 1, 8000, 8, 1, data))
    np.testing.assert_allclose(
        x[:, 0] * 32768.0, [-32124, 32124, 0, 0], atol=1e-9
    )
    data = bytes([0x55, 0xD5, 0x2A, 0xAA])
    _, x = decode_wav(_wav(6, 1, 8000, 8, 1, data))
    np.testing.assert_allclose(
        x[:, 0] * 32768.0, [-8, 8, -32256, 32256], atol=1e-9
    )


def test_g711_all_256_codes_match_scalar_reference():
    data = bytes(range(256))
    _, xu = decode_wav(_wav(7, 1, 8000, 8, 1, data))
    _, xa = decode_wav(_wav(6, 1, 8000, 8, 1, data))
    for b in range(256):
        assert xu[b, 0] * 32768.0 == _ulaw_decode_scalar(b)
        assert xa[b, 0] * 32768.0 == _alaw_decode_scalar(b)


def test_ulaw_encode_roundtrip_within_quantization():
    pcm = [int(20000 * math.sin(2 * math.pi * i / 37)) for i in range(200)]
    data = bytes(_ulaw_encode_scalar(v) for v in pcm)
    _, x = decode_wav(_wav(7, 2, 16000, 8, 2, data))
    assert x.shape == (100, 2)
    decoded = (x.reshape(-1) * 32768.0).astype(int)
    # μ-law quantization error grows with the segment: bound relative
    err = np.abs(decoded - np.array(pcm))
    tol = np.maximum(np.abs(np.array(pcm)) * 0.04, 40)
    assert (err <= tol).all()


# ------------------------------------------ independent IMA ADPCM pair

_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_encode(samples_by_ch: list[list[int]], block_align: int) -> bytes:
    """Scalar IMA ADPCM encoder, written from the reference algorithm.
    samples_by_ch: per-channel int16 lists, equal length; sample 0 of
    each block is stored verbatim in the block header."""
    ch = len(samples_by_ch)
    n = len(samples_by_ch[0])
    groups = (block_align - 4 * ch) // (4 * ch)
    spb = 1 + groups * 8
    out = bytearray()
    idx = [0] * ch
    for b0 in range(0, n, spb):
        nibbles: list[list[int]] = [[] for _ in range(ch)]
        preds, start_idx = [], []
        for c in range(ch):
            block = samples_by_ch[c][b0 : b0 + spb]
            pred = block[0]
            preds.append(pred)
            start_idx.append(idx[c])  # header carries block-START state
            for s in block[1:]:
                step = _STEPS[idx[c]]
                diff = s - pred
                code = 0
                if diff < 0:
                    code = 8
                    diff = -diff
                if diff >= step:
                    code |= 4
                    diff -= step
                if diff >= step >> 1:
                    code |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    code |= 1
                # decoder-mirrored reconstruction
                d = step >> 3
                if code & 1:
                    d += step >> 2
                if code & 2:
                    d += step >> 1
                if code & 4:
                    d += step
                pred = max(-32768, min(32767, pred + (-d if code & 8 else d)))
                idx[c] = max(0, min(88, idx[c] + _ADJ[code & 7]))
                nibbles[c].append(code)
            while len(nibbles[c]) < groups * 8:
                nibbles[c].append(0)  # pad the final block
        for c in range(ch):
            out += struct.pack("<hBB", preds[c], start_idx[c], 0)
        for g in range(groups):
            for c in range(ch):
                for k in range(0, 8, 2):
                    lo = nibbles[c][g * 8 + k]
                    hi = nibbles[c][g * 8 + k + 1]
                    out.append(lo | (hi << 4))
    return bytes(out)


def _ima_decode_scalar(data: bytes, ch: int, block_align: int) -> list[list[int]]:
    """Scalar IMA ADPCM decoder — the second, independent copy the
    vectorized module decode is pinned against."""
    groups = (block_align - 4 * ch) // (4 * ch)
    out: list[list[int]] = [[] for _ in range(ch)]
    for b0 in range(0, len(data) - block_align + 1, block_align):
        block = data[b0 : b0 + block_align]
        pred, idx = [], []
        for c in range(ch):
            p, i, _ = struct.unpack_from("<hBB", block, c * 4)
            pred.append(p)
            idx.append(min(max(i, 0), 88))
            out[c].append(p)
        body = block[4 * ch :]
        for g in range(groups):
            for c in range(ch):
                four = body[(g * ch + c) * 4 : (g * ch + c) * 4 + 4]
                for byte in four:
                    for code in (byte & 0x0F, byte >> 4):
                        step = _STEPS[idx[c]]
                        d = step >> 3
                        if code & 1:
                            d += step >> 2
                        if code & 2:
                            d += step >> 1
                        if code & 4:
                            d += step
                        pred[c] = max(
                            -32768,
                            min(32767, pred[c] + (-d if code & 8 else d)),
                        )
                        idx[c] = max(0, min(88, idx[c] + _ADJ[code & 7]))
                        out[c].append(pred[c])
    return out


@pytest.mark.parametrize("ch", [1, 2])
def test_ima_adpcm_vectorized_matches_scalar_decoder(ch):
    block_align = 32 * 4 * ch + 4 * ch  # 32 groups → 257 samples/block
    spb = 1 + 32 * 8
    n = spb * 3  # three full blocks
    sig = [
        [
            int(12000 * math.sin(2 * math.pi * i / (50 + 20 * c)))
            for i in range(n)
        ]
        for c in range(ch)
    ]
    data = _ima_encode(sig, block_align)
    fmt_ext = struct.pack("<HH", 2, spb)  # cbSize=2, wSamplesPerBlock
    raw = _wav(0x11, ch, 8000, 4, block_align, data,
               fmt_ext=fmt_ext, fact=n)
    rate, x = decode_wav(raw)
    assert rate == 8000 and x.shape == (n, ch)
    got = (x * 32768.0).round().astype(int)
    want = _ima_decode_scalar(data, ch, block_align)
    for c in range(ch):
        assert got[:, c].tolist() == want[c][:n]
    # and the codec actually tracks the signal (quantization-bounded)
    err = np.abs(got[:, 0] - np.array(sig[0]))
    assert float(np.mean(err)) < 600


def test_ima_adpcm_fact_chunk_trims_padded_tail():
    block_align = 4 * 4 + 4  # mono, 4 groups → 33 samples/block
    n = 40  # 33 + 7: second block is mostly encoder padding
    sig = [[(i * 251) % 2001 - 1000 for i in range(n)]]
    data = _ima_encode(sig, block_align)
    raw = _wav(0x11, 1, 8000, 4, block_align, data,
               fmt_ext=struct.pack("<HH", 2, 33), fact=n)
    _, x = decode_wav(raw)
    assert x.shape == (40, 1)
    no_fact = _wav(0x11, 1, 8000, 4, block_align, data,
                   fmt_ext=struct.pack("<HH", 2, 33))
    _, x2 = decode_wav(no_fact)
    assert x2.shape == (66, 1)  # both blocks at full capacity


# ------------------------------------------------- PCM width and float


def test_pcm_24_and_32_bit_exact():
    vals = [-8388608, -1, 0, 1, 8388607]
    body = b"".join(
        struct.pack("<i", v << 8)[1:] for v in vals  # 24-bit LE truncate
    )
    _, x = decode_wav(_wav(1, 1, 44100, 24, 3, body))
    np.testing.assert_allclose(
        x[:, 0], [v / 8388608.0 for v in vals], atol=1e-12
    )
    vals32 = [-(2**31), -1, 0, 1, 2**31 - 1]
    body = b"".join(struct.pack("<i", v) for v in vals32)
    _, x = decode_wav(_wav(1, 1, 44100, 32, 4, body))
    np.testing.assert_allclose(
        x[:, 0], [v / 2147483648.0 for v in vals32], atol=1e-12
    )


def test_float_wav_and_clipping():
    vals = [-1.5, -0.25, 0.0, 0.75, 2.0]  # float WAV may overshoot
    body = b"".join(struct.pack("<f", v) for v in vals)
    _, x = decode_wav(_wav(3, 1, 48000, 32, 4, body))
    np.testing.assert_allclose(
        x[:, 0], [-1.0, -0.25, 0.0, 0.75, 1.0], atol=1e-7
    )
    body = b"".join(struct.pack("<d", v) for v in vals)
    _, x = decode_wav(_wav(3, 1, 48000, 64, 8, body))
    np.testing.assert_allclose(
        x[:, 0], [-1.0, -0.25, 0.0, 0.75, 1.0], atol=1e-12
    )


def test_extensible_unwraps_to_subformat():
    body = struct.pack("<hh", -16384, 16384)
    raw = _wav(0xFFFE, 1, 8000, 16, 2, body, subformat=1)
    _, x = decode_wav(raw)
    np.testing.assert_allclose(x[:, 0], [-0.5, 0.5], atol=1e-9)
    # μ-law inside extensible
    raw = _wav(0xFFFE, 1, 8000, 8, 1, bytes([0xFF]), subformat=7)
    _, x = decode_wav(raw)
    assert x[0, 0] == 0.0


def test_wav_variant_failures_are_loud():
    with pytest.raises(ValueError, match="not a KSDATAFORMAT"):
        bad = bytearray(
            _wav(0xFFFE, 1, 8000, 16, 2, b"\x00\x00", subformat=1)
        )
        # corrupt one GUID tail byte (fmt body starts at offset 20)
        bad[20 + 30] ^= 0xFF
        decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="tag=85"):
        decode_wav(_wav(85, 1, 8000, 0, 1, b"\x00" * 8))
    with pytest.raises(ValueError, match="float bits=16"):
        decode_wav(_wav(3, 1, 8000, 16, 2, b"\x00" * 8))
    with pytest.raises(ValueError, match="shorter than one block"):
        decode_wav(_wav(0x11, 1, 8000, 4, 512, b"\x00" * 8))


def test_g711_flows_through_audio_features(spark):
    """The variant decoders ride the existing distributed feature
    path unchanged (container-agnostic _decode_audio contract)."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.media_codecs import (
        extract_audio_features,
    )

    pcm = [int(15000 * math.sin(2 * math.pi * i / 40)) for i in range(400)]
    raw = _wav(7, 1, 8000, 8, 1, bytes(_ulaw_encode_scalar(v) for v in pcm))
    df = spark.createDataFrame(
        [(1, bytearray(raw))], "media_id long, media binary"
    )
    row = extract_audio_features(df).collect()[0]
    assert (row.sample_rate, row.n_channels, row.n_samples) == (8000, 1, 400)
    # 15000/32768 sine → rms ≈ amp/√2 ≈ 0.3237 within companding error
    assert abs(row.feature[0] - 0.3237) < 0.01


def test_zero_block_align_adpcm_raises_valueerror_not_zerodivision():
    raw = _wav(0x11, 1, 8000, 4, 0, b"\x00" * 64)
    with pytest.raises(ValueError, match="block_align=0"):
        decode_wav(raw)


def test_spectral_features_pure_tone_vs_noise(spark):
    """A pure 1 kHz tone: centroid ~1 kHz, tiny bandwidth, rolloff at
    the tone, flatness near 0. White noise: centroid near band
    middle, flatness near 1. A silent frame: NULL shape, flatness 1
    (the stated contract)."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.media_codecs import (
        audio_spectral_features,
    )

    rate = 8000
    n = rate // 10  # 100 ms = 4 x 25ms frames
    tone = [0.8 * math.sin(2 * math.pi * 1000 * i / rate) for i in range(n)]
    rng = np.random.default_rng(3)
    noise = (rng.uniform(-0.9, 0.9, n)).tolist()
    silence = [0.0] * n

    def wav(samples):
        body = b"".join(
            struct.pack("<h", int(s * 32767)) for s in samples
        )
        return _wav(1, 1, rate, 16, 2, body)

    df = spark.createDataFrame(
        [
            (1, bytearray(wav(tone))),
            (2, bytearray(wav(noise))),
            (3, bytearray(wav(silence))),
        ],
        "media_id long, media binary",
    )
    rows = audio_spectral_features(df, frame_ms=25).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert all(len(v) == 4 for v in by_id.values())
    t0 = by_id[1][0]
    assert t0.spectral_centroid_hz == pytest.approx(1000, abs=30)
    assert t0.spectral_bandwidth_hz < 150
    assert t0.spectral_rolloff_hz == pytest.approx(1000, abs=50)
    assert t0.spectral_flatness < 0.2
    n0 = by_id[2][0]
    assert 1200 < n0.spectral_centroid_hz < 2800  # band middle-ish
    assert n0.spectral_flatness > 0.5
    assert n0.spectral_rolloff_hz > 2500
    s0 = by_id[3][0]
    assert s0.spectral_centroid_hz is None
    assert s0.spectral_flatness == 1.0
    # centroid/rolloff hand-check on one tiny frame: 4 samples of
    # alternating +-1 at 8 kHz = energy at Nyquist (4 kHz) only
    alt = [1.0, -1.0, 1.0, -1.0]
    df2 = spark.createDataFrame(
        [(9, bytearray(wav(alt)))], "media_id long, media binary"
    )
    r = audio_spectral_features(df2, frame_ms=1000).collect()[0]
    assert r.spectral_centroid_hz == pytest.approx(4000, abs=1e-3)
    assert r.spectral_bandwidth_hz == pytest.approx(0.0, abs=1e-3)
