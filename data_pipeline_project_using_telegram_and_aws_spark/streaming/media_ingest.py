"""Streaming MULTIMODAL front door — the binary-column twin of the
text chain (gate → dedup → scrub → dsir → pack): every micro-batch of
(media_id, media) rows is

1. QUARANTINED on decode failure: every row runs the REAL decoders;
   a row whose container the dispatcher cannot name, or that names a
   container but then fails to decode (truncated payload, corrupt
   chunk), lands in the quarantine zone with the decoder's raise text
   as the reason — for unknown containers that text includes the
   leading magic bytes (the contract-gate doctrine: undecodable media
   is a data defect to audit, not a row to crash on or silently
   drop). There is no separate sniff-only pre-gate: quarantine is
   driven per row by the decode raise inside `_decode_or_error`, so
   the quarantine cost for a corrupt row is whatever the decoder
   spends before it raises (magic-byte dispatch rejects unknown
   containers before any entropy decode).
2. SCORED: decoded survivors get `image_quality_stats`-equivalent
   stats (brightness/contrast/saturation/sharpness/extreme_frac)
   computed in the same Arrow batch as the decode.
3. GATED: rows below the quality thresholds land in the reject zone
   WITH their stats (auditable, like the dedup stage's rejects);
   the rest land in the good zone joined to their stats.

Zones partition the input exactly: |batch| = |quarantine| + |reject| +
|good| per batch — the conservation contract every front-door stage
pins. All three zones land under ``ingest_batch=<batch_id>`` dynamic
partition overwrite (deterministic transform ⇒ at-least-once replay
rewrites byte-identically — the ledger pattern everywhere in
`streaming/`).

Scale shape: the only Python is the decode itself (inherently so —
the documented Arrow path from `multimodal.py`), over the slim
(id, bytes) projection; the gate and the zone splits are plain column
filters on the stats rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

QUALITY_DDL = (
    "media_id long, width int, height int, brightness double, "
    "contrast double, saturation double, sharpness double, "
    "extreme_frac double, decode_error string"
)


def _decode_or_error(batch_iter):
    """Per-row image_quality_stats that converts a decoder raise into
    a (media_id, decode_error) row instead of failing the batch — the
    quarantine path needs the row, not the exception."""
    import pandas as pd

    from ..operators.media_codecs import _decode, to_rgb

    import numpy as np

    for batch in batch_iter:
        out = []
        for media_id, media in zip(batch["media_id"], batch["media"]):
            raw = bytes(media) if media is not None else b""
            row = {
                "media_id": media_id, "width": None, "height": None,
                "brightness": None, "contrast": None,
                "saturation": None, "sharpness": None,
                "extreme_frac": None, "decode_error": None,
            }
            try:
                px = to_rgb(_decode(raw)).astype(np.float64)
            except Exception as e:  # noqa: BLE001 — quarantine IS the
                # stated policy for ANY decode failure: a decoder bug
                # (IndexError on malformed bytes) must quarantine the
                # row, not fail the whole micro-batch
                row["decode_error"] = (
                    f"{type(e).__name__}: {e}"[:200]
                    if not isinstance(e, ValueError)
                    else str(e)[:200]
                )
                out.append(row)
                continue
            h, w = px.shape[:2]
            luma = (
                0.299 * px[:, :, 0]
                + 0.587 * px[:, :, 1]
                + 0.114 * px[:, :, 2]
            )
            mx, mn = px.max(axis=2), px.min(axis=2)
            if h >= 3 and w >= 3:
                lap = (
                    4 * luma[1:-1, 1:-1] - luma[:-2, 1:-1]
                    - luma[2:, 1:-1] - luma[1:-1, :-2] - luma[1:-1, 2:]
                )
                sharp = float(lap.var()) / (255.0**2)
            else:
                sharp = 0.0
            row.update(
                width=int(w),
                height=int(h),
                brightness=round(float(luma.mean()) / 255.0, 6),
                contrast=round(float(luma.std()) / 255.0, 6),
                saturation=round(
                    float(
                        np.where(mx > 0, (mx - mn) / np.maximum(mx, 1), 0)
                        .mean()
                    ),
                    6,
                ),
                sharpness=round(sharp, 6),
                extreme_frac=round(
                    float(((luma <= 2) | (luma >= 253)).mean()), 6
                ),
            )
            out.append(row)
        yield pd.DataFrame(
            out,
            columns=[
                "media_id", "width", "height", "brightness", "contrast",
                "saturation", "sharpness", "extreme_frac", "decode_error",
            ],
        )


def ingest_media_batch(
    batch: DataFrame,
    batch_id: int,
    good_path: str,
    reject_path: str,
    quarantine_path: str,
    min_contrast: float = 0.02,
    min_sharpness: float = 1e-4,
    max_extreme_frac: float = 0.9,
    id_col: str = "media_id",
    media_col: str = "media",
) -> None:
    spark = batch.sparkSession
    slim = batch.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(media_col).alias("media"),
    ).localCheckpoint(eager=True)  # read the source once, split thrice
    stats = slim.mapInPandas(_decode_or_error, QUALITY_DDL).localCheckpoint(
        eager=True
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    stamp = F.lit(int(batch_id)).alias("ingest_batch")

    quarantined = stats.filter(F.col("decode_error").isNotNull()).select(
        "media_id",
        F.col("decode_error").alias("reason"),
        stamp,
    )
    (
        slim.join(F.broadcast(quarantined), "media_id")
        .select("media_id", "media", "reason", "ingest_batch")
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(quarantine_path)
    )
    scored = stats.filter(F.col("decode_error").isNull()).drop(
        "decode_error"
    )
    passes = (
        (F.col("contrast") >= min_contrast)
        & (F.col("sharpness") >= min_sharpness)
        & (F.col("extreme_frac") <= max_extreme_frac)
    )
    rejected = scored.filter(~passes)
    (
        rejected.select("*", stamp)
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(reject_path)
    )
    good = scored.filter(passes)
    (
        slim.join(F.broadcast(good), "media_id")
        .select(
            "media_id", "media", "width", "height", "brightness",
            "contrast", "saturation", "sharpness", "extreme_frac", stamp,
        )
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(good_path)
    )


def start_media_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    good_path: str,
    reject_path: str,
    quarantine_path: str,
    checkpoint_dir: str,
    min_contrast: float = 0.02,
    min_sharpness: float = 1e-4,
    max_extreme_frac: float = 0.9,
    id_col: str = "media_id",
    media_col: str = "media",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source stream of (media_id, media binary) parquet →
    quarantine / reject / good zones per the module recipe."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", max_files_per_trigger
        )
    stream = reader.parquet(source_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        ingest_media_batch(
            batch, batch_id, good_path, reject_path, quarantine_path,
            min_contrast, min_sharpness, max_extreme_frac,
            id_col, media_col,
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ------------------------------------------------- audio front door
# The AUDIO twin of the image chain above, per-zone identical: decode
# failure (unknown container, torn RIFF, CRC-failing FLAC) →
# quarantine with the raise text; decoded-but-unusable (silence,
# sub-minimum duration, DC-stuck) → reject WITH its stats; the rest →
# good joined to stats. Same conservation contract, same
# ingest_batch-partitioned idempotent zones, same Arrow-stage cost
# model (decode is the only Python; WAV/FLAC decode per
# `operators/media_codecs._decode_audio` / `operators/flac.py`).

AUDIO_QUALITY_DDL = (
    "media_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_s double, rms double, peak double, zcr double, "
    "silence_frac double, decode_error string"
)


def _decode_audio_or_error(batch_iter):
    """Per-row audio decode + stats that converts ANY decode raise
    into a (media_id, decode_error) row — quarantine is the stated
    policy for every decode failure, decoder bugs included."""
    import numpy as np
    import pandas as pd

    from ..operators.media_codecs import _decode_audio

    cols = [
        "media_id", "sample_rate", "n_channels", "n_samples",
        "duration_s", "rms", "peak", "zcr", "silence_frac",
        "decode_error",
    ]
    for batch in batch_iter:
        out = []
        for media_id, media in zip(batch["media_id"], batch["media"]):
            raw = bytes(media) if media is not None else b""
            row = dict.fromkeys(cols)
            row["media_id"] = media_id
            try:
                rate, x = _decode_audio(raw)
                if x.shape[0] == 0:
                    raise ValueError("audio has no samples")
            except Exception as e:  # noqa: BLE001 — quarantine policy
                row["decode_error"] = (
                    f"{type(e).__name__}: {e}"[:200]
                    if not isinstance(e, ValueError)
                    else str(e)[:200]
                )
                out.append(row)
                continue
            n = x.shape[0]
            row.update(
                sample_rate=int(rate),
                n_channels=int(x.shape[1]),
                n_samples=int(n),
                duration_s=round(n / rate, 6),
                rms=round(float(np.sqrt((x**2).mean())), 6),
                peak=round(float(np.abs(x).max()), 6),
                zcr=round(
                    float((np.sign(x[1:]) != np.sign(x[:-1])).mean())
                    if n > 1 else 0.0,
                    6,
                ),
                silence_frac=round(
                    float((np.abs(x) < 1e-3).mean()), 6
                ),
            )
            out.append(row)
        yield pd.DataFrame(out, columns=cols)


def ingest_audio_batch(
    batch: DataFrame,
    batch_id: int,
    good_path: str,
    reject_path: str,
    quarantine_path: str,
    min_duration_s: float = 0.05,
    max_silence_frac: float = 0.98,
    min_rms: float = 1e-4,
    id_col: str = "media_id",
    media_col: str = "media",
) -> None:
    spark = batch.sparkSession
    slim = batch.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(media_col).alias("media"),
    ).localCheckpoint(eager=True)
    stats = slim.mapInPandas(
        _decode_audio_or_error, AUDIO_QUALITY_DDL
    ).localCheckpoint(eager=True)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    stamp = F.lit(int(batch_id)).alias("ingest_batch")

    quarantined = stats.filter(F.col("decode_error").isNotNull()).select(
        "media_id", F.col("decode_error").alias("reason"), stamp
    )
    (
        slim.join(F.broadcast(quarantined), "media_id")
        .select("media_id", "media", "reason", "ingest_batch")
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(quarantine_path)
    )
    scored = stats.filter(F.col("decode_error").isNull()).drop(
        "decode_error"
    )
    passes = (
        (F.col("duration_s") >= min_duration_s)
        & (F.col("silence_frac") <= max_silence_frac)
        & (F.col("rms") >= min_rms)
    )
    (
        scored.filter(~passes)
        .select("*", stamp)
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(reject_path)
    )
    good = scored.filter(passes)
    (
        slim.join(F.broadcast(good), "media_id")
        .select(
            "media_id", "media", "sample_rate", "n_channels",
            "n_samples", "duration_s", "rms", "peak", "zcr",
            "silence_frac", stamp,
        )
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(good_path)
    )


def start_audio_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    good_path: str,
    reject_path: str,
    quarantine_path: str,
    checkpoint_dir: str,
    min_duration_s: float = 0.05,
    max_silence_frac: float = 0.98,
    min_rms: float = 1e-4,
    id_col: str = "media_id",
    media_col: str = "media",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source stream of (media_id, media binary) parquet →
    quarantine / reject / good zones, audio edition."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", max_files_per_trigger
        )
    stream = reader.parquet(source_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        ingest_audio_batch(
            batch, batch_id, good_path, reject_path, quarantine_path,
            min_duration_s, max_silence_frac, min_rms,
            id_col, media_col,
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ------------------------------------------------- video front door
# The VIDEO edition of the same three-zone recipe. The triage stage is
# METADATA-ONLY (`operators/video.py probe_video`: MP4 boxes, AVI
# headers, Y4M stream scan) — frame pixels are never decoded at the
# door, because at crawl scale the overwhelming video cost is codec
# work that belongs to a downstream stage with its own budget
# (`video.decode_video_frames` / `multimodal.sample_frames`).
# Quarantine = probe raise (not a recognized container, torn
# structure); reject = probed fine but below the resolution/duration
# floors; good = the rest WITH the probe columns and a
# ``frames_decodable`` flag telling downstream which rows the in-repo
# decoders (y4m, MJPG/DIB-AVI) can open without external codecs.

VIDEO_TRIAGE_DDL = (
    "media_id long, container string, width int, height int, "
    "duration_s double, n_tracks int, codecs array<string>, "
    "frames_decodable boolean, decode_error string"
)


def _probe_video_or_error(batch_iter):
    """Per-row container probe that converts ANY raise into a
    (media_id, decode_error) row — the front-door doctrine."""
    import pandas as pd

    from ..operators.video import (
        frames_decodable,
        probe_video,
        sniff_video,
    )

    cols = [
        "media_id", "container", "width", "height", "duration_s",
        "n_tracks", "codecs", "frames_decodable", "decode_error",
    ]
    for batch in batch_iter:
        out = []
        for media_id, media in zip(batch["media_id"], batch["media"]):
            raw = bytes(media) if media is not None else b""
            row = dict.fromkeys(cols)
            row["media_id"] = media_id
            try:
                kind = sniff_video(raw)
                meta = probe_video(raw)
            except Exception as e:  # noqa: BLE001 — quarantine policy
                row["decode_error"] = (
                    f"{type(e).__name__}: {e}"[:200]
                    if not isinstance(e, ValueError)
                    else str(e)[:200]
                )
                out.append(row)
                continue
            row.update(
                container=kind,
                width=meta.get("width"),
                height=meta.get("height"),
                duration_s=meta.get("duration_s"),
                n_tracks=meta.get("n_tracks"),
                codecs=meta.get("codecs") or [],
                # mirrors decode_video_frames' ACTUAL stream
                # selection (first vids stream's compression), so the
                # flag never promises what the decoder refuses
                frames_decodable=frames_decodable(raw),
            )
            out.append(row)
        yield pd.DataFrame(out, columns=cols)


def ingest_video_batch(
    batch: DataFrame,
    batch_id: int,
    good_path: str,
    reject_path: str,
    quarantine_path: str,
    min_duration_s: float = 0.2,
    min_width: int = 16,
    min_height: int = 16,
    id_col: str = "media_id",
    media_col: str = "media",
) -> None:
    spark = batch.sparkSession
    slim = batch.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(media_col).alias("media"),
    ).localCheckpoint(eager=True)
    stats = slim.mapInPandas(
        _probe_video_or_error, VIDEO_TRIAGE_DDL
    ).localCheckpoint(eager=True)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    stamp = F.lit(int(batch_id)).alias("ingest_batch")

    quarantined = stats.filter(F.col("decode_error").isNotNull()).select(
        "media_id", F.col("decode_error").alias("reason"), stamp
    )
    (
        slim.join(F.broadcast(quarantined), "media_id")
        .select("media_id", "media", "reason", "ingest_batch")
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(quarantine_path)
    )
    scored = stats.filter(F.col("decode_error").isNull()).drop(
        "decode_error"
    )
    # NULL probe values (duration unknown for some containers) pass
    # the floor — rejecting on absent evidence would silently drop
    # whole container families; the floors gate MEASURED defects
    passes = (
        F.coalesce(F.col("duration_s") >= min_duration_s, F.lit(True))
        & F.coalesce(F.col("width") >= min_width, F.lit(True))
        & F.coalesce(F.col("height") >= min_height, F.lit(True))
    )
    (
        scored.filter(~passes)
        .select("*", stamp)
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(reject_path)
    )
    good = scored.filter(passes)
    (
        slim.join(F.broadcast(good), "media_id")
        .select(
            "media_id", "media", "container", "width", "height",
            "duration_s", "n_tracks", "codecs", "frames_decodable",
            stamp,
        )
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(good_path)
    )


def start_video_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    good_path: str,
    reject_path: str,
    quarantine_path: str,
    checkpoint_dir: str,
    min_duration_s: float = 0.2,
    min_width: int = 16,
    min_height: int = 16,
    id_col: str = "media_id",
    media_col: str = "media",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source stream of (media_id, media binary) parquet →
    quarantine / reject / good zones, video edition (probe-only
    triage; see the section note)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", max_files_per_trigger
        )
    stream = reader.parquet(source_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        ingest_video_batch(
            batch, batch_id, good_path, reject_path, quarantine_path,
            min_duration_s, min_width, min_height, id_col, media_col,
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
