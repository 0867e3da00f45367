"""Perceptual image hashes + Hamming-banded near-dup join
(`operators/phash.py`) — hashes pinned against INDEPENDENT scalar
implementations (direct-sum DCT, loop-built bit strings), perceptual
properties (noise robustness, brightness invariance of dHash/pHash
structure bits), and the band join's pigeonhole recall checked
against a brute-force all-pairs oracle over adversarial bit
patterns."""

from __future__ import annotations

import math

import numpy as np
import pytest

from data_pipeline_project_using_telegram_and_aws_spark.operators.phash import (
    ahash64,
    dhash64,
    hamming_neardup_pairs,
    image_hashes,
    phash64,
)

# --------------------------------------- independent scalar references


def _luma_ref(px):
    return (
        0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    ).astype(float)


def _nearest_ref(g, w, h):
    hh, ww = g.shape
    out = np.empty((h, w))
    for y in range(h):
        for x in range(w):
            sy = min(int((y + 0.5) * hh / h), hh - 1)
            sx = min(int((x + 0.5) * ww / w), ww - 1)
            out[y, x] = g[sy, sx]
    return out


def _bits_ref(flags):
    v = 0
    for b in flags:
        v = (v << 1) | int(bool(b))
    return v - (1 << 64) if v >= (1 << 63) else v


def _ahash_ref(px):
    g = _nearest_ref(_luma_ref(px), 8, 8)
    return _bits_ref((g >= g.mean()).reshape(-1))


def _dhash_ref(px):
    g = _nearest_ref(_luma_ref(px), 9, 8)
    flags = []
    for y in range(8):
        for x in range(8):
            flags.append(g[y, x + 1] > g[y, x])
    return _bits_ref(flags)


def _phash_ref(px):
    g = _nearest_ref(_luma_ref(px), 32, 32)
    # direct-sum DCT-II (independent of the module's matrix form)
    coefs = np.zeros((8, 8))
    for k in range(8):
        for l in range(8):  # noqa: E741
            s = 0.0
            for m in range(32):
                for n in range(32):
                    s += (
                        g[m, n]
                        * math.cos(math.pi * (2 * m + 1) * k / 64)
                        * math.cos(math.pi * (2 * n + 1) * l / 64)
                    )
            ck = math.sqrt(1 / 32) if k == 0 else math.sqrt(2 / 32)
            cl = math.sqrt(1 / 32) if l == 0 else math.sqrt(2 / 32)
            coefs[k, l] = ck * cl * s
    ac = coefs.reshape(-1)[1:]
    med = np.median(ac)
    return _bits_ref([False] + [c > med for c in ac])


def _hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_hashes_match_scalar_references():
    rng = np.random.default_rng(31)
    for _ in range(3):
        px = rng.integers(0, 256, size=(24, 37, 3), dtype=np.uint8)
        assert ahash64(px) == _ahash_ref(px)
        assert dhash64(px) == _dhash_ref(px)
        assert phash64(px) == _phash_ref(px)


def _natural_image(seed=7):
    """Dense-spectrum smooth field (box-blurred noise) — the
    natural-image regime pHash's median threshold assumes. A pure
    sinusoid would put ~53 of the 63 AC coefficients at exactly zero
    and make the sign bits noise-fragile (measured while writing this
    test; the module docstring states the caveat)."""
    rng = np.random.default_rng(seed)
    f = rng.normal(size=(96, 96))
    k = 9
    csum = np.cumsum(
        np.cumsum(np.pad(f, ((k, 0), (k, 0))), axis=0), axis=1
    )
    blur = (
        csum[k:, k:] - csum[:-k, k:] - csum[k:, :-k] + csum[:-k, :-k]
    ) / (k * k)
    img = (128 + 300 * blur).clip(10, 245)
    return np.stack(
        [img, np.roll(img, 5, axis=0), img[::-1]], axis=-1
    ).astype(np.uint8)


def test_perceptual_properties():
    rng = np.random.default_rng(7)
    base = _natural_image()
    # mild noise: hashes move only a few bits
    noisy = np.clip(
        base.astype(int) + rng.integers(-5, 6, base.shape), 0, 255
    ).astype(np.uint8)
    assert _hamming(phash64(base), phash64(noisy)) <= 6
    assert _hamming(dhash64(base), dhash64(noisy)) <= 6
    # global brightness shift: dHash (adjacent differences) and
    # pHash structure bits barely move
    brighter = np.clip(base.astype(int) + 25, 0, 255).astype(np.uint8)
    assert _hamming(dhash64(base), dhash64(brighter)) <= 4
    assert _hamming(phash64(base), phash64(brighter)) <= 4
    # an unrelated image is far from all of them
    other = rng.integers(0, 256, size=base.shape, dtype=np.uint8)
    assert _hamming(phash64(base), phash64(other)) > 12
    # resize invariance of pHash (its point): half-size image, same
    # structure
    half = base[::2, ::2]
    assert _hamming(phash64(base), phash64(half)) <= 6


def test_image_hashes_through_spark(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.media_codecs import (
        encode_png,
        encode_ppm,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_ppm(px))),
            (2, bytearray(encode_png(px))),
        ],
        "media_id long, media binary",
    )
    rows = {r.media_id: r for r in image_hashes(df).collect()}
    # same pixels through two containers → identical hashes,
    # matching the scalar reference
    assert rows[1].phash == rows[2].phash == _phash_ref(px)
    assert rows[1].ahash == _ahash_ref(px)
    assert rows[1].dhash == _dhash_ref(px)
    bad = spark.createDataFrame(
        [(9, bytearray(b"not an image"))], "media_id long, media binary"
    )
    with pytest.raises(Exception, match="media_id=9"):
        image_hashes(bad).collect()


def _hash_df(spark, values):
    return spark.createDataFrame(
        [(i, int(np.uint64(v).astype(np.int64))) for i, v in values],
        "media_id long, phash long",
    )


def test_band_join_matches_bruteforce_oracle(spark):
    """Adversarial patterns: differing bits CONCENTRATED inside one
    band (the pigeonhole's worst case) and spread across bands; every
    pair within the radius must surface, none outside it."""
    rng = np.random.default_rng(13)
    base = int(rng.integers(0, 2**63))
    values = [(0, base)]
    # flip j low bits (all inside the lowest band when j small)
    for j in range(1, 10):
        values.append((j, base ^ ((1 << j) - 1)))
    # flips spread one-per-band: distance 7 across 7 bands
    spread = base
    for b in range(7):
        spread ^= 1 << (b * 9 + 3)
    values.append((100, spread))
    # random far points
    for i in range(101, 106):
        values.append((i, int(rng.integers(0, 2**63))))
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_neardup_pairs(
            _hash_df(spark, values), max_hamming=6
        ).collect()
    }
    want = {}
    for i, (ia, va) in enumerate(values):
        for ib, vb in values[i + 1 :]:
            d = _hamming(va, vb)
            if d <= 6:
                want[(min(ia, ib), max(ia, ib))] = d
    assert got == want and len(want) >= 10


def test_band_join_guard_rails(spark):
    df = _hash_df(spark, [(0, 1), (1, 3)])
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_neardup_pairs(df, max_hamming=6, n_bands=6)
    # distance-1 pair found with default banding
    out = hamming_neardup_pairs(df, max_hamming=1).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in out] == [(0, 1, 1)]


def test_near_dup_images_pair_far_images_do_not(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.media_codecs import (
        encode_ppm,
    )

    rng = np.random.default_rng(41)
    base = _natural_image(seed=41)
    noisy = np.clip(
        base.astype(int) + rng.integers(-5, 6, base.shape), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 256, size=base.shape, dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_ppm(base))),
            (2, bytearray(encode_ppm(noisy))),
            (3, bytearray(encode_ppm(other))),
        ],
        "media_id long, media binary",
    )
    pairs = hamming_neardup_pairs(
        image_hashes(df), max_hamming=10
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}
