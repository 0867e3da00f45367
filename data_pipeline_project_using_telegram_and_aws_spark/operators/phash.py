"""Perceptual image hashing + Hamming-banded near-dup join — the
IMAGE twin of the text SimHash stack (`dedup.simhash16` /
`dedup.band_rows`): fingerprint every image into 64 bits whose
Hamming distance tracks visual similarity, then find near-duplicate
pairs with a banded bucket join instead of all-pairs. The reference
pipeline has no image surface; this is north-star multimodal
curation — near-dup image collapse is a standard stage of public
image-text corpus builds.

Three classic hashes, all pure NumPy over the in-repo decoders
(`media_codecs._decode` → `to_rgb`), each with its recipe stated as
the contract (perceptual hashing has no universal standard — what
matters at corpus scale is that the fingerprint is deterministic and
cheap, and these match the widely published constructions):

- **aHash** (average): 8×8 nearest-resized luma, bit = pixel ≥ mean.
- **dHash** (difference): 9×8 luma, bit = row-adjacent increase —
  robust to global brightness shifts.
- **pHash** (DCT): 32×32 luma → exact 2-D DCT-II (the same
  matrix-multiplication construction `jpeg.py` uses for its IDCT) →
  the 8×8 low-frequency block, DC EXCLUDED → bit = coefficient >
  median of the 63. Robust to resizing and mild compression on
  NATURAL images (dense spectra); stated caveat: on synthetic
  sparse-spectrum content (flat fields, pure gradients/sinusoids)
  most AC coefficients sit at the median and the sign bits are
  noise-fragile — that regime belongs to aHash/dHash or exact
  hashing.

Luma is ITU-R BT.601 (0.299 R + 0.587 G + 0.114 B); resizing is the
same nearest-neighbor index arithmetic as
`media_codecs.numpy_resize_batch` (deterministic, no
interpolation-kernel variance across BLAS builds). Hashes are stored
as SIGNED 64-bit longs (the raw bit pattern reinterpreted — Spark has
no unsigned type); XOR/bit_count work on the pattern regardless.

Scale shape: hashing is one mapInPandas pass (constant per-row work);
the near-dup join splits each 64-bit hash into ``n_bands`` contiguous
bit slices and bucket-joins on (band, slice) — by pigeonhole, any
pair within Hamming distance ``n_bands − 1`` shares at least one
band, so candidate generation is exact-recall for the configured
radius without any all-pairs pass (same argument as the MinHash-LSH
and SimHash band joins). The final ``bit_count(xor)`` filter is
JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# ------------------------------------------------------------ hashing


def _luma(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB → float64 BT.601 luma."""
    return (
        0.299 * px[:, :, 0].astype(np.float64)
        + 0.587 * px[:, :, 1].astype(np.float64)
        + 0.114 * px[:, :, 2].astype(np.float64)
    )


def _nearest(gray: np.ndarray, width: int, height: int) -> np.ndarray:
    h, w = gray.shape
    ys = np.minimum(
        ((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1
    )
    xs = np.minimum(
        ((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1
    )
    return gray[np.ix_(ys, xs)]


def _bits_to_int(bits: np.ndarray) -> int:
    """Flat boolean array (MSB first) → the bit pattern as a SIGNED
    64-bit int (Spark long)."""
    v = 0
    for b in bits.reshape(-1):
        v = (v << 1) | int(bool(b))
    return int(np.uint64(v).astype(np.int64))


def ahash64(px: np.ndarray) -> int:
    g = _nearest(_luma(px), 8, 8)
    return _bits_to_int(g >= g.mean())


def dhash64(px: np.ndarray) -> int:
    g = _nearest(_luma(px), 9, 8)
    return _bits_to_int(g[:, 1:] > g[:, :-1])


_DCT32 = None


def _dct32() -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        n = 32
        k = np.arange(n)[:, None]
        m = np.arange(n)[None, :]
        c = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * m + 1) * k / (2 * n))
        c[0] /= np.sqrt(2.0)
        _DCT32 = c
    return _DCT32


def phash64(px: np.ndarray) -> int:
    g = _nearest(_luma(px), 32, 32)
    c = _dct32()
    coefs = c @ g @ c.T
    low = coefs[:8, :8].reshape(-1)
    ac = low[1:]  # DC excluded: overall brightness is not structure
    return _bits_to_int(np.concatenate([[False], ac > np.median(ac)]))


PHASH_SCHEMA_DDL = (
    "media_id long, ahash long, dhash long, phash long"
)


def image_hashes(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
) -> DataFrame:
    """Distributed fingerprinting: decode each image binary
    (ppm/bmp/png/gif/jpeg via the in-repo decoders) and emit all
    three 64-bit hashes. Same slim-projection mapInPandas plumbing
    as every media stage; raises naming the media id on undecodable
    bytes (front-door callers wrap for quarantine)."""
    from .media_codecs import _decode, to_rgb

    slim = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(media_col).alias("media"),
    )

    def _hashes(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for media_id, media in zip(batch["media_id"], batch["media"]):
            raw = bytes(media) if media is not None else b""
            try:
                px = to_rgb(_decode(raw))
            except ValueError as e:
                raise ValueError(f"media_id={media_id}: {e}") from e
            out.append(
                {
                    "media_id": media_id,
                    "ahash": ahash64(px),
                    "dhash": dhash64(px),
                    "phash": phash64(px),
                }
            )
        return pd.DataFrame(
            out, columns=["media_id", "ahash", "dhash", "phash"]
        )

    def run(batches):
        for batch in batches:
            if len(batch):
                yield _hashes(batch)

    return slim.mapInPandas(run, PHASH_SCHEMA_DDL)


# ------------------------------------------------- banded hamming join


def hamming_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = 6,
    hash_col: str = "phash",
    id_col: str = "media_id",
    n_bands: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) for every pair whose 64-bit hashes are
    within ``max_hamming`` bits — EXACT within the radius: with
    ``n_bands`` contiguous bit slices (default ``max_hamming + 1``),
    any pair at distance ≤ n_bands − 1 shares at least one identical
    slice (pigeonhole), so the bucket join misses nothing inside the
    configured radius. Pairs outside it may appear as candidates but
    are filtered by the JVM-side ``bit_count(xor)``.

    Scale: one explode to n_bands rows per hash, one (band, value)
    shuffle, bucket-local pairing — the exact shape of the MinHash
    band join; a pathological bucket (e.g. millions of identical
    images) pairs within its own partition only. Raises when
    n_bands ≤ max_hamming (the recall guarantee would silently
    vanish)."""
    if n_bands is None:
        n_bands = max_hamming + 1
    if n_bands <= max_hamming:
        raise ValueError(
            f"hamming_neardup_pairs: n_bands={n_bands} <= "
            f"max_hamming={max_hamming} loses the pigeonhole recall "
            "guarantee"
        )
    if not 1 <= n_bands <= 64:
        raise ValueError(f"hamming_neardup_pairs: n_bands={n_bands}")
    # contiguous slices covering all 64 bits (widths differ by <= 1)
    starts, widths = [], []
    pos = 0
    for i in range(n_bands):
        width = 64 // n_bands + (1 if i < 64 % n_bands else 0)
        starts.append(pos)
        widths.append(width)
        pos += width
    h = hashes.select(
        F.col(id_col).alias("__id"), F.col(hash_col).alias("__h")
    )
    bands = h.select(
        "__id", "__h",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("__h"), s)
                    .bitwiseAND(F.lit((1 << w) - 1))
                    .alias("value"),
                )
                for i, (s, w) in enumerate(zip(starts, widths))
            ])
        ).alias("bv"),
    ).select("__id", "__h", "bv.band", "bv.value")
    left = bands.select(
        "band", "value",
        F.col("__id").alias("id_a"), F.col("__h").alias("__ha"),
    )
    right = bands.select(
        "band", "value",
        F.col("__id").alias("id_b"), F.col("__h").alias("__hb"),
    )
    pairs = (
        left.join(right, ["band", "value"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(
                F.col("__ha").bitwiseXOR(F.col("__hb"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs
