"""Multimodal (image/audio/video) column plumbing (north-star extension).

Model: media rides in an opaque ``binary`` column next to typed metadata
(``media_type``, byte size, content hash) — the same two-timeline idea as
the lake's raw zone: keep original bytes, extract features alongside.

The *decode* step for COMPRESSED containers (PIL / torchaudio / ffmpeg)
is STUBBED — those libraries are not in this container.
``decode_media_batch`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic fake decode
derived from the bytes (stable across runs / engines), so the
Spark-side plumbing — schema, Arrow batching, ``mapInPandas``
signature, partition balance — is real and tested. Zlib-or-simpler
containers decode for real: `media_codecs.py` ships pure-NumPy
ppm/bmp/png decode (PNG via stdlib zlib inflate + per-row
unfiltering), feature extraction, and nearest-neighbor resize that
plug into the ``decoder=``/``resizer=`` injection points below — the
environment gate covers only formats that genuinely need external
entropy codecs (JPEG/MP3/video).

Scale notes: media bytes dominate row size, so the decode stage
repartitions by a hash of the id to balance batches, projects only
(id, media) into the Python worker, and rejoins features by id. Columns
never pass through the driver; Arrow batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# a batch decoder maps (media_id, media) rows to MEDIA_FEATURE_SCHEMA rows
BatchDecoder = Callable[[pd.DataFrame], pd.DataFrame]

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_media_metadata(
    df: DataFrame, media_col: str = "media"
) -> DataFrame:
    """Typed metadata columns computed JVM-side (no decode needed)."""
    m = F.col(media_col)
    return df.withColumn("media_n_bytes", F.length(m).cast("long")).withColumn(
        "media_hash", F.md5(m)
    )


def decode_media_batch(
    batch: pd.DataFrame, fake: bool = False
) -> pd.DataFrame:
    """Decode one Arrow batch of (media_id, media) into features.

    Real implementation would dispatch on container bytes (PIL for images,
    soundfile/ffmpeg for audio/video). STUB: deterministic fake decode —
    dimensions and an 8-dim feature vector derived from the md5 digest of
    the bytes, frame count from byte length.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires PIL/ffmpeg, not available in this "
            "container; pass fake=True for the deterministic test decoder"
        )
    out = []
    for media_id, media in zip(batch["media_id"], batch["media"]):
        raw = bytes(media) if media is not None else b""
        digest = hashlib.md5(raw).digest()
        out.append(
            {
                "media_id": media_id,
                "n_bytes": len(raw),
                "content_hash": digest.hex(),
                "width": 16 + digest[0] % 64,
                "height": 16 + digest[1] % 64,
                "n_frames": 1 + len(raw) % 8,
                "feature": [float(b) / 255.0 for b in digest[:8]],
            }
        )
    return pd.DataFrame(
        out,
        columns=[f.name for f in MEDIA_FEATURE_SCHEMA.fields],
    )


def extract_media_features(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    fake: bool = False,
    partitions: int | None = None,
    decoder: "BatchDecoder | None" = None,
) -> DataFrame:
    """Distributed decode/feature-extract via ``mapInPandas``.

    Only (id, media) enters the Python worker; heavy bytes never hit the
    driver. ``partitions`` rebalances ahead of the CPU-bound decode stage.

    ``decoder`` is the injection point for a real environment: any
    callable ``pd.DataFrame[(media_id, media)] -> pd.DataFrame`` matching
    ``MEDIA_FEATURE_SCHEMA`` (e.g. a PIL/ffmpeg dispatch) plugs in
    without code change — it is cloudpickled to the executors like any
    Python UDF. Default: :func:`decode_media_batch` (the stub, which
    requires ``fake=True`` in this container).
    """
    slim = df.select(
        F.col(id_col).cast("long").alias("media_id"), F.col(media_col).alias("media")
    )
    if partitions:
        slim = slim.repartition(partitions, "media_id")
    dec = decoder if decoder is not None else (
        lambda batch: decode_media_batch(batch, fake=fake)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch):
                yield dec(batch)

    return slim.mapInPandas(run, MEDIA_FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_hash", T.StringType()),
    ]
)


def fake_frame_batch(batch: pd.DataFrame, max_frames: int) -> pd.DataFrame:
    """Deterministic fake frame sampler: frame count follows the same
    rule as :func:`decode_media_batch` (1 + n_bytes % 8), sampled at a
    uniform stride so at most ``max_frames`` frames emit per media row;
    each frame's content stands in as md5(bytes || index)."""
    out = []
    for media_id, media in zip(batch["media_id"], batch["media"]):
        raw = bytes(media) if media is not None else b""
        n_frames = 1 + len(raw) % 8
        stride = max(1, -(-n_frames // max_frames))  # ceil division
        for idx in range(0, n_frames, stride):
            out.append(
                {
                    "media_id": media_id,
                    "frame_index": idx,
                    "n_frames": n_frames,
                    "frame_hash": hashlib.md5(
                        raw + idx.to_bytes(4, "big")
                    ).hexdigest(),
                }
            )
    return pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])


def sample_frames(
    df: DataFrame,
    max_frames: int = 4,
    id_col: str = "media_id",
    media_col: str = "media",
    fake: bool = False,
    frame_sampler: "Callable[[pd.DataFrame, int], pd.DataFrame] | None" = None,
) -> DataFrame:
    """Frame sampling over video binaries: the 1→N exploding decode shape
    (vs :func:`extract_media_features`' 1→1), via the same
    slim-projection ``mapInPandas`` plumbing — one input row yields up to
    ``max_frames`` frame rows, Arrow-batched, bytes never on the driver.

    ``frame_sampler(batch, max_frames)`` is the real-environment
    injection point (an ffmpeg/OpenCV stride reader); the default stub
    requires ``fake=True`` like the feature decoder. Downstream treats
    the result as any other table — frame-level dedup (dd1 on
    frame_hash) and per-frame feature extraction compose directly."""
    if frame_sampler is None:
        if not fake:
            raise NotImplementedError(
                "no frame_sampler given: pass media_codecs."
                "numpy_gif_frame_sampler (GIF) or video."
                "numpy_video_frame_sampler (y4m / MJPG- or DIB-AVI) "
                "for real decode, an ffmpeg/OpenCV sampler for other "
                "codecs, or fake=True for the deterministic stub"
            )
        frame_sampler = fake_frame_batch
    slim = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(media_col).alias("media"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch):
                yield frame_sampler(batch, max_frames)

    return slim.mapInPandas(run, FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def fake_resize_batch(
    batch: pd.DataFrame, width: int, height: int
) -> pd.DataFrame:
    """Deterministic fake resizer: the 'resized image' is the md5 digest
    of (bytes || WxH) — stable across runs/engines so the binary output
    path through Arrow is hash-checkable, without pretending to do
    pixel work the container cannot do."""
    out = []
    for media_id, media in zip(batch["media_id"], batch["media"]):
        raw = bytes(media) if media is not None else b""
        payload = hashlib.md5(raw + f"{width}x{height}".encode()).digest()
        out.append(
            {
                "media_id": media_id,
                "width": width,
                "height": height,
                "resized": payload,
            }
        )
    return pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA.fields])


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    media_col: str = "media",
    fake: bool = False,
    resizer: "Callable[[pd.DataFrame, int, int], pd.DataFrame] | None" = None,
) -> DataFrame:
    """Batch image resize over the slim-projection ``mapInPandas``
    plumbing: binary in, binary out, bytes never on the driver — the
    1→1 transform whose output REPLACES the payload (vs
    :func:`extract_media_features`, whose output rides alongside it).

    ``resizer(batch, width, height)`` injects a real PIL/OpenCV
    implementation; the stub requires ``fake=True`` like the other
    decode stages."""
    if resizer is None:
        if not fake:
            raise NotImplementedError(
                "image resize requires PIL/OpenCV, not available in this "
                "container; pass fake=True for the deterministic stub"
            )
        resizer = fake_resize_batch
    slim = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(media_col).alias("media"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch):
                yield resizer(batch, width, height)

    return slim.mapInPandas(run, RESIZED_SCHEMA)
