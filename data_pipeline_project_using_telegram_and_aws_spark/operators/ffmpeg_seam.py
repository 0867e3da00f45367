"""Injectable ffmpeg seam for codec-gated media formats (north-star
extension; reference analog: none — the reference pipeline carries no
media at all).

This container ships no entropy codecs, so `operators/multimodal.py`
gates MP3/AAC/H.264 decode behind documented ``NotImplementedError``
raises with ``decoder=`` / ``frame_sampler=`` injection points. This
module is the seam itself, pinned: factories that build a
`multimodal.BatchDecoder` (features) and a frame sampler whose ONLY
environment dependency is a ``run(argv, stdin_bytes) -> stdout_bytes``
callable.

- With no ``run`` argument they shell out to the REAL ``ffmpeg`` /
  ``ffprobe`` when present on PATH, and raise the same documented
  environment gate when not.
- Tests inject a fake ``run`` that emulates the binaries' stdout, so
  the command-line contract, the per-format dispatch, the probe-JSON
  parse, and the Arrow plumbing through ``extract_media_features`` /
  ``sample_frames`` are exercised end-to-end in CI — a real binary
  drops in with zero code change.

Contract (stated):

- :func:`sniff_compressed_media` — container kind from magic bytes:
  ``mp3 | aac-adts | h264-annexb | mp4 | unknown`` (ADTS sync
  0xFFFx is checked before the looser MP3 0xFFEx sync; ISO 14496
  Annex-B start codes 00 00 01 / 00 00 00 01).
- :func:`ffmpeg_feature_decoder` — per row: ffprobe JSON →
  width/height/n_frames; one gray video frame (or 8 kHz mono s16le
  PCM for audio-only) decoded through ffmpeg, reduced to the 8-dim
  chunk-mean feature. A row whose probe or decode fails carries NULL
  width/height/n_frames/feature (absence is data — the schema has no
  error column; the front doors quarantine upstream).
- :func:`ffmpeg_frame_sampler` — all frames decoded gray, split into
  width*height chunks, sampled at the uniform stride
  ``ceil(n_frames / max_frames)`` (the `multimodal.fake_frame_batch`
  rule), each frame's hash = md5 of its raw gray bytes.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable

import pandas as pd

from .multimodal import FRAME_SCHEMA, MEDIA_FEATURE_SCHEMA

__all__ = [
    "sniff_compressed_media",
    "ffmpeg_feature_decoder",
    "ffmpeg_frame_sampler",
    "PROBE_ARGV",
    "audio_pcm_argv",
    "video_gray_argv",
]

# run(argv, stdin_bytes) -> stdout_bytes; raises on decode failure
Runner = Callable[[list, bytes], bytes]

PROBE_ARGV = [
    "ffprobe", "-v", "error", "-print_format", "json",
    "-show_streams", "pipe:0",
]


def audio_pcm_argv() -> list:
    """8 kHz mono signed-16 PCM to stdout — tiny, deterministic."""
    return ["ffmpeg", "-v", "error", "-i", "pipe:0",
            "-f", "s16le", "-ac", "1", "-ar", "8000", "pipe:1"]


def video_gray_argv(n_frames: int | None = None) -> list:
    """Gray rawvideo frames to stdout (all frames, or the first
    ``n_frames``) — one width*height byte plane per frame."""
    argv = ["ffmpeg", "-v", "error", "-i", "pipe:0"]
    if n_frames is not None:
        argv += ["-frames:v", str(n_frames)]
    return argv + ["-f", "rawvideo", "-pix_fmt", "gray", "pipe:1"]


def sniff_compressed_media(raw: bytes) -> str:
    """Container kind from magic bytes (module contract)."""
    if len(raw) >= 8 and raw[4:8] == b"ftyp":
        return "mp4"
    if raw[:4] == b"\x00\x00\x00\x01" or raw[:3] == b"\x00\x00\x01":
        return "h264-annexb"
    if raw[:3] == b"ID3":
        return "mp3"
    if len(raw) >= 2 and raw[0] == 0xFF:
        if raw[1] & 0xF6 == 0xF0:  # ADTS: syncword 0xFFF, layer 00
            return "aac-adts"
        if raw[1] & 0xE0 == 0xE0:  # MPEG audio frame sync
            return "mp3"
    return "unknown"


def _default_run(argv: list, data: bytes) -> bytes:
    """The real-binary runner: shells out to ffmpeg/ffprobe on PATH.
    Raising the documented environment gate when absent keeps this
    seam's behavior identical to the multimodal stub gates."""
    import shutil
    import subprocess

    if shutil.which(argv[0]) is None:
        raise NotImplementedError(
            f"{argv[0]} is not available in this container; inject "
            "run= (the test contract) or install ffmpeg for real decode"
        )
    proc = subprocess.run(
        argv, input=data, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, check=True,
    )
    return proc.stdout


def _probe(run: Runner, raw: bytes) -> dict | None:
    """ffprobe JSON → the first video stream (preferred) or first
    audio stream: {kind, width, height, n_frames}."""
    try:
        streams = json.loads(run(PROBE_ARGV, raw).decode()).get(
            "streams", []
        )
    except Exception:  # noqa: BLE001 — unprobeable row: nulls
        return None
    video = [s for s in streams if s.get("codec_type") == "video"]
    audio = [s for s in streams if s.get("codec_type") == "audio"]
    if video:
        s = video[0]
        # real ffprobe writes "N/A" (not absent) for raw elementary
        # streams' nb_frames; a bare int() would escape the try above
        # and crash the task instead of nulling the row
        nb = str(s.get("nb_frames", ""))
        return {
            "kind": "video",
            "width": int(s["width"]) if s.get("width") else None,
            "height": int(s["height"]) if s.get("height") else None,
            "n_frames": int(nb) if nb.isdigit() else None,
        }
    if audio:
        return {"kind": "audio", "width": None, "height": None,
                "n_frames": None}
    return None


def _chunk_means(data: bytes, n: int = 8) -> list | None:
    """The n-dim feature: per-chunk byte means scaled to [0, 1].
    ALWAYS exactly n entries (equal-split chunks; an empty chunk from
    data shorter than n contributes 0.0) so the feature column's
    dimensionality is stable across rows."""
    if not data:
        return None
    out = []
    for i in range(n):
        seg = data[i * len(data) // n:(i + 1) * len(data) // n]
        out.append(sum(seg) / (255.0 * len(seg)) if seg else 0.0)
    return out


def ffmpeg_feature_decoder(run: Runner | None = None):
    """Build a `multimodal.BatchDecoder` backed by ffmpeg/ffprobe
    through ``run`` (module contract). Plug into
    ``extract_media_features(df, decoder=...)``."""
    run = run if run is not None else _default_run

    def decode(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for media_id, media in zip(batch["media_id"], batch["media"]):
            raw = bytes(media) if media is not None else b""
            row = {
                "media_id": media_id,
                "n_bytes": len(raw),
                "content_hash": hashlib.md5(raw).hexdigest(),
                "width": None, "height": None, "n_frames": None,
                "feature": None,
            }
            info = _probe(run, raw) if raw else None
            if info is not None:
                # dims land only on full success: the module contract
                # says a row whose probe OR decode fails carries NULL
                # width/height/n_frames/feature, so probe-derived dims
                # must not survive a decode failure as a false
                # success signal
                try:
                    if info["kind"] == "video":
                        plane = run(video_gray_argv(1), raw)
                        row["n_frames"] = (
                            info["n_frames"]
                            if info["n_frames"] is not None else 1
                        )
                    else:
                        plane = run(audio_pcm_argv(), raw)
                    if not plane:
                        # ffmpeg exiting 0 with zero output bytes (0
                        # frames / 0 PCM samples) is a decode failure
                        # under the contract: all four columns NULL,
                        # not probe dims beside a NULL feature
                        raise ValueError("empty decode plane")
                    row["feature"] = _chunk_means(plane)
                    row["width"] = info["width"]
                    row["height"] = info["height"]
                except Exception:  # noqa: BLE001 — undecodable: nulls
                    row["n_frames"] = None
            out.append(row)
        return pd.DataFrame(
            out, columns=[f.name for f in MEDIA_FEATURE_SCHEMA.fields]
        )

    return decode


def ffmpeg_frame_sampler(run: Runner | None = None):
    """Build a ``frame_sampler(batch, max_frames)`` for
    ``sample_frames(df, frame_sampler=...)`` (module contract)."""
    run = run if run is not None else _default_run

    def sampler(batch: pd.DataFrame, max_frames: int) -> pd.DataFrame:
        out = []
        for media_id, media in zip(batch["media_id"], batch["media"]):
            raw = bytes(media) if media is not None else b""
            info = _probe(run, raw) if raw else None
            if (
                info is None or info["kind"] != "video"
                or not info["width"] or not info["height"]
            ):
                continue  # not a video row: nothing to sample
            try:
                planes = run(video_gray_argv(), raw)
            except Exception:  # noqa: BLE001 — undecodable: skip
                continue
            size = info["width"] * info["height"]
            frames = [
                planes[i:i + size]
                for i in range(0, len(planes) - size + 1, size)
            ]
            n = len(frames)
            stride = max(1, -(-n // max_frames))  # ceil
            for idx in range(0, n, stride):
                out.append({
                    "media_id": media_id,
                    "frame_index": idx,
                    "n_frames": n,
                    "frame_hash": hashlib.md5(frames[idx]).hexdigest(),
                })
        return pd.DataFrame(
            out, columns=[f.name for f in FRAME_SCHEMA.fields]
        )

    return sampler
