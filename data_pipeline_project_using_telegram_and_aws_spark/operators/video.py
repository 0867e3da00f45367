"""Video container decode — Y4M (YUV4MPEG2) raw frames and AVI
(RIFF) with MJPEG or uncompressed-DIB video streams — pure
NumPy + stdlib, closing most of what was the "video frames need
ffmpeg" environment gate. The reference pipeline ingests no video
(Data_Pipeline_Project_using_Telegram_and_AWS is a text webhook →
Athena flow); this is north-star multimodal surface, built like the
image/audio codecs in `media_codecs.py`: real decoders for containers
whose math is tractable in NumPy, loud ValueErrors for codecs that
genuinely need external libraries (H.264/H.265/VP9 bitstreams stay
behind the `multimodal.sample_frames` injection gate).

Formats, exactly as read:

- **Y4M**: ``YUV4MPEG2`` parameter line (W/H/F rate, C colorspace,
  I interlace), then per frame a ``FRAME`` line + planar YUV. C420
  family (420jpeg/420mpeg2/420paldv share the plane GEOMETRY — their
  difference is chroma siting, which nearest-neighbor upsampling
  cannot honor anyway and is documented as such), C422, C444, Cmono.
  YUV→RGB is BT.601 limited-range (Y 16-235), the studio-range
  convention Y4M carries.
- **AVI**: RIFF walk (hdrl → avih + per-stream strl, movi chunk
  stream, ``rec `` sub-lists honored). Video stream selected by
  ``strh.fccType == 'vids'``; frames decode for ``MJPG`` (each
  ``##dc`` chunk is a JPEG — reusing `jpeg.py`, with the standard
  MJPEG quirk handled: frames that omit their Huffman tables get the
  ITU T.81 Annex K tables spliced in, which is what every MJPEG
  consumer does) and for ``biCompression == 0`` uncompressed
  bottom-up BGR DIBs.

Spark shape: same slim-projection ``mapInPandas`` plumbing as every
media stage — `frame_sampler` plugs into `multimodal.sample_frames`
(FRAME_SCHEMA rows, the 1→N decode shape), `sample_frame_images`
re-encodes sampled frames as PPM binaries so the entire IMAGE
pipeline (features, resize, quality stats, dedup) composes downstream
without a special frame type. Frame decode is sequential WITHIN one
media row (containers interleave frames), so parallelism is
rows-per-batch × batches — the axis that grows at corpus scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# --------------------------------------------------------------- y4m


def _y4m_params(line: bytes) -> dict:
    params = {}
    for tok in line.split(b" ")[1:]:
        if tok:
            params[chr(tok[0])] = tok[1:].decode("ascii", "replace")
    return params


_Y4M_CHROMA = {
    # EXACT supported tags → (x_div, y_div); the 420 variants share
    # plane geometry. Matched exactly, not by prefix: C420p10/C422p16
    # etc. are 2-bytes-per-sample streams that would misalign the
    # frame walk if treated as their 8-bit namesakes — they get the
    # unsupported-colorspace error instead of a misleading
    # bad-FRAME-marker one.
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "420": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
    "mono": None,
}


def _y4m_geometry(params: dict):
    w = int(params.get("W", 0))
    h = int(params.get("H", 0))
    if w <= 0 or h <= 0:
        raise ValueError(f"y4m dimensions W={w} H={h} invalid")
    interlace = params.get("I", "p")
    if interlace not in ("p", "?"):
        raise ValueError(
            f"y4m interlacing '{interlace}': only progressive decodes "
            "(deinterlacing needs field-aware filtering)"
        )
    cs = params.get("C", "420jpeg")
    sub = _Y4M_CHROMA.get(cs, False)
    if sub is False:
        raise ValueError(
            f"y4m colorspace C{cs} unsupported (8-bit "
            f"{'/'.join(sorted(_Y4M_CHROMA))} decode here)"
        )
    if sub is not None and (w % sub[0] or h % sub[1]):
        raise ValueError(
            f"y4m C{cs} needs dimensions divisible by {sub[0]}x{sub[1]},"
            f" got {w}x{h}"
        )
    num, _, den = params.get("F", "25:1").partition(":")
    fps = int(num) / max(int(den or 1), 1)
    return w, h, sub, fps, cs


def _yuv_to_rgb(y, u, v) -> np.ndarray:
    """BT.601 limited-range YCbCr → full-range RGB (the Y4M/studio
    convention: Y 16-235, C 16-240), clipped to uint8."""
    yf = (y.astype(np.float64) - 16.0) * (255.0 / 219.0)
    uf = u.astype(np.float64) - 128.0
    vf = v.astype(np.float64) - 128.0
    c = 255.0 / 224.0
    r = yf + c * 1.402 * vf
    g = yf - c * (1.402 * 0.299 / 0.587) * vf - c * (
        1.772 * 0.114 / 0.587
    ) * uf
    b = yf + c * 1.772 * uf
    return np.clip(
        np.stack([r, g, b], axis=-1), 0, 255
    ).astype(np.uint8)


def probe_y4m(raw: bytes) -> dict:
    """Y4M stream metadata without converting any pixels: counts
    frames by stepping over FRAME payloads (fixed size per stream)."""
    if not raw.startswith(b"YUV4MPEG2"):
        raise ValueError(f"not a y4m stream (leading {raw[:9]!r})")
    eol = raw.find(b"\x0a")
    if eol < 0:
        raise ValueError("y4m header line unterminated")
    params = _y4m_params(raw[:eol])
    w, h, sub, fps, cs = _y4m_geometry(params)
    frame_bytes = w * h
    if sub is not None:
        frame_bytes += 2 * (w // sub[0]) * (h // sub[1])
    n, pos = 0, eol + 1
    while pos < len(raw):
        feol = raw.find(b"\x0a", pos)
        if feol < 0 or not raw[pos:feol].startswith(b"FRAME"):
            raise ValueError(
                f"y4m frame {n}: bad FRAME marker at byte {pos}"
            )
        if feol + 1 + frame_bytes > len(raw):
            raise ValueError(
                f"y4m frame {n} truncated: wants {frame_bytes} bytes"
            )
        pos = feol + 1 + frame_bytes
        n += 1
    return {
        "major_brand": "y4m",
        "duration_s": round(n / fps, 6) if fps else None,
        "n_tracks": 1,
        "width": w,
        "height": h,
        "codecs": [f"rawvideo/C{cs}"],
    }


def decode_y4m(raw: bytes):
    """Y4M → (list of (h, w, 3) uint8 RGB frames, fps). Chroma
    upsampling is nearest-neighbor (siting differences between the
    420 variants are below its resolution, stated in the module
    note)."""
    if not raw.startswith(b"YUV4MPEG2"):
        raise ValueError(f"not a y4m stream (leading {raw[:9]!r})")
    eol = raw.find(b"\x0a")
    if eol < 0:
        raise ValueError("y4m header line unterminated")
    w, h, sub, fps, _cs = _y4m_geometry(_y4m_params(raw[:eol]))
    frames = []
    pos = eol + 1
    while pos < len(raw):
        feol = raw.find(b"\x0a", pos)
        if feol < 0 or not raw[pos:feol].startswith(b"FRAME"):
            raise ValueError(
                f"y4m frame {len(frames)}: bad FRAME marker at {pos}"
            )
        pos = feol + 1
        y = np.frombuffer(raw, np.uint8, w * h, pos).reshape(h, w)
        pos += w * h
        if sub is None:  # mono: replicate luma
            frames.append(_yuv_to_rgb(
                y, np.full((h, w), 128.0), np.full((h, w), 128.0)
            ))
            continue
        cw, ch = w // sub[0], h // sub[1]
        if pos + 2 * cw * ch > len(raw):
            raise ValueError(f"y4m frame {len(frames)} truncated")
        u = np.frombuffer(raw, np.uint8, cw * ch, pos).reshape(ch, cw)
        v = np.frombuffer(
            raw, np.uint8, cw * ch, pos + cw * ch
        ).reshape(ch, cw)
        pos += 2 * cw * ch
        u = u.repeat(sub[1], axis=0).repeat(sub[0], axis=1)
        v = v.repeat(sub[1], axis=0).repeat(sub[0], axis=1)
        frames.append(_yuv_to_rgb(y, u, v))
    return frames, fps


# --------------------------------------------------------------- avi


def _riff_chunks(raw: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end, list_type) over a RIFF
    chunk run; LIST chunks surface their list type so callers can
    recurse. Word-aligned per the RIFF spec."""
    pos = start
    while pos + 8 <= end:
        cid = raw[pos : pos + 4]
        size = int.from_bytes(raw[pos + 4 : pos + 8], "little")
        b0, b1 = pos + 8, pos + 8 + size
        if b1 > end:
            raise ValueError(
                f"riff chunk {cid!r} size {size} overruns its container"
            )
        if cid == b"LIST":
            yield cid, b0 + 4, b1, raw[b0 : b0 + 4]
        else:
            yield cid, b0, b1, None
        pos = b1 + (size & 1)


def _avi_header_info(raw: bytes):
    """(avih dict, [per-stream dicts]) from the hdrl list."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError(
            f"not a riff/avi (leading bytes {raw[:4]!r}/{raw[8:12]!r})"
        )
    avih, streams = None, []
    for cid, b0, b1, ltype in _riff_chunks(raw, 12, len(raw)):
        if cid == b"LIST" and ltype == b"hdrl":
            for c2, c0, c1, lt2 in _riff_chunks(raw, b0, b1):
                if c2 == b"avih":
                    avih = {
                        "usec_per_frame": int.from_bytes(
                            raw[c0 : c0 + 4], "little"
                        ),
                        "total_frames": int.from_bytes(
                            raw[c0 + 16 : c0 + 20], "little"
                        ),
                        "n_streams": int.from_bytes(
                            raw[c0 + 24 : c0 + 28], "little"
                        ),
                        "width": int.from_bytes(
                            raw[c0 + 32 : c0 + 36], "little"
                        ),
                        "height": int.from_bytes(
                            raw[c0 + 36 : c0 + 40], "little"
                        ),
                    }
                elif c2 == b"LIST" and lt2 == b"strl":
                    s = {}
                    for c3, d0, d1, _ in _riff_chunks(raw, c0, c1):
                        if c3 == b"strh":
                            s["type"] = raw[d0 : d0 + 4].decode(
                                "latin1"
                            )
                            s["handler"] = raw[d0 + 4 : d0 + 8].decode(
                                "latin1"
                            )
                            s["scale"] = int.from_bytes(
                                raw[d0 + 20 : d0 + 24], "little"
                            )
                            s["rate"] = int.from_bytes(
                                raw[d0 + 24 : d0 + 28], "little"
                            )
                            s["length"] = int.from_bytes(
                                raw[d0 + 32 : d0 + 36], "little"
                            )
                        elif c3 == b"strf" and s.get("type") == "vids":
                            s["width"] = int.from_bytes(
                                raw[d0 + 4 : d0 + 8], "little",
                                signed=True,
                            )
                            s["height"] = int.from_bytes(
                                raw[d0 + 8 : d0 + 12], "little",
                                signed=True,
                            )
                            s["bit_count"] = int.from_bytes(
                                raw[d0 + 14 : d0 + 16], "little"
                            )
                            comp = raw[d0 + 16 : d0 + 20]
                            s["compression"] = (
                                "DIB"
                                if comp == b"\x00\x00\x00\x00"
                                else comp.decode("latin1")
                            )
                    streams.append(s)
    if avih is None:
        raise ValueError("avi missing avih header chunk")
    return avih, streams


def probe_avi(raw: bytes) -> dict:
    """AVI container metadata without decoding frames — the triage
    twin of `media_codecs.probe_mp4`, same output keys."""
    avih, streams = _avi_header_info(raw)
    vids = next((s for s in streams if s.get("type") == "vids"), None)
    dur = None
    if vids and vids.get("rate"):
        dur = round(vids["length"] * vids["scale"] / vids["rate"], 6)
    elif avih["usec_per_frame"]:
        dur = round(
            avih["total_frames"] * avih["usec_per_frame"] / 1e6, 6
        )
    return {
        "major_brand": "avi",
        "duration_s": dur,
        "n_tracks": len(streams),
        "width": avih["width"] or (vids or {}).get("width"),
        "height": avih["height"] or (vids or {}).get("height"),
        "codecs": [
            s.get("compression") or s.get("handler", "")
            for s in streams
        ],
    }


def _movi_video_chunks(raw: bytes, stream_index: int):
    """Yield the video stream's frame chunk bodies from every movi
    list, descending into 'rec ' grouping sub-lists."""
    want = {
        f"{stream_index:02d}dc".encode(),
        f"{stream_index:02d}db".encode(),
    }

    def scan(start, end):
        for cid, b0, b1, ltype in _riff_chunks(raw, start, end):
            if cid == b"LIST" and ltype == b"rec ":
                yield from scan(b0, b1)
            elif cid in want and b1 > b0:
                yield raw[b0:b1]

    for cid, b0, b1, ltype in _riff_chunks(raw, 12, len(raw)):
        if cid == b"LIST" and ltype == b"movi":
            yield from scan(b0, b1)


# ITU T.81 Annex K.3 typical Huffman tables — the tables MJPEG frames
# omit by convention (the format's best-known quirk: decoders splice
# these in when a frame carries no DHT). (counts, symbols) per table.
_K_LUM_DC = (
    bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
_K_CHR_DC = (
    bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]),
    bytes(range(12)),
)
_K_LUM_AC = (
    bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]),
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ]),
)
_K_CHR_AC = (
    bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]),
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ]),
)


def _annex_k_dht() -> bytes:
    """One DHT segment carrying all four Annex K tables (lum DC→0,
    lum AC→0x10, chr DC→1, chr AC→0x11)."""
    body = b""
    for tc_th, (counts, syms) in (
        (0x00, _K_LUM_DC), (0x10, _K_LUM_AC),
        (0x01, _K_CHR_DC), (0x11, _K_CHR_AC),
    ):
        body += bytes([tc_th]) + counts + syms
    return b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body


def _ensure_jpeg_tables(frame: bytes) -> bytes:
    """Splice the Annex K DHT before SOS when an MJPEG frame carries
    no Huffman tables (the convention). Frames with their own DHT
    pass through untouched."""
    pos = 2
    sos_at = None
    while pos + 4 <= len(frame):
        if frame[pos] != 0xFF:
            break  # lost sync: let the real decoder raise loudly
        marker = frame[pos + 1]
        if marker == 0xC4:
            return frame  # has its own tables
        if marker == 0xDA:
            sos_at = pos
            break
        if 0xD0 <= marker <= 0xD9:
            pos += 2
            continue
        pos += 2 + int.from_bytes(frame[pos + 2 : pos + 4], "big")
    if sos_at is None:
        return frame
    return frame[:sos_at] + _annex_k_dht() + frame[sos_at:]


def _decode_dib_frame(body: bytes, w: int, h: int, bits: int) -> np.ndarray:
    """One uncompressed bottom-up 24-bit BGR DIB frame → RGB."""
    if bits != 24:
        raise ValueError(
            f"avi DIB bit_count={bits}: only 24-bit BI_RGB decodes"
        )
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if len(body) < stride * h:
        raise ValueError(
            f"avi DIB frame {len(body)} bytes, geometry wants "
            f"{stride * h}"
        )
    rows = np.frombuffer(body, np.uint8, stride * h).reshape(h, stride)
    rgb = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return rgb[::-1] if flip else rgb


def decode_avi_frames(raw: bytes):
    """AVI → (list of (h, w, 3) uint8 RGB frames from the FIRST video
    stream, fps). MJPG and uncompressed-DIB streams decode for real;
    other codecs raise naming the fourcc."""
    avih, streams = _avi_header_info(raw)
    vidx = next(
        (i for i, s in enumerate(streams) if s.get("type") == "vids"),
        None,
    )
    if vidx is None:
        raise ValueError("avi has no video stream")
    v = streams[vidx]
    comp = v.get("compression")
    if comp is None:  # strh said vids but no strf arrived
        raise ValueError(
            "avi vids stream has no strf format header (torn hdrl?)"
        )
    fps = (
        v["rate"] / v["scale"]
        if v.get("scale") and v.get("rate")
        else (1e6 / avih["usec_per_frame"] if avih["usec_per_frame"] else 0.0)
    )
    frames = []
    if comp == "MJPG":
        from .jpeg import decode_jpeg

        for chunk in _movi_video_chunks(raw, vidx):
            px = decode_jpeg(_ensure_jpeg_tables(bytes(chunk)))
            if px.dtype != np.uint8:
                # 12-bit MJPEG: essentially nonexistent in the wild,
                # and the frame pipeline is 8-bit — reject loudly
                # rather than wrap values mod 256 (doctrine: never
                # silently corrupt pixels)
                raise ValueError(
                    "avi MJPG frame decoded to 12-bit samples; the "
                    "8-bit frame pipeline does not rescale — inject "
                    "a frame_sampler that handles high-bit-depth"
                )
            if px.ndim == 2:
                px = px[:, :, None]
            if px.shape[-1] == 1:  # grayscale → 3-channel parity
                px = np.repeat(px, 3, axis=-1)
            frames.append(px)
    elif comp == "DIB":
        for chunk in _movi_video_chunks(raw, vidx):
            frames.append(
                _decode_dib_frame(
                    bytes(chunk), v["width"], v["height"],
                    v.get("bit_count", 24),
                )
            )
    else:
        raise ValueError(
            f"avi video codec {comp!r} needs an external decoder "
            "(this module decodes MJPG and uncompressed DIB)"
        )
    return frames, fps


# --------------------------------------------------- container dispatch


def sniff_video(raw: bytes) -> str | None:
    """'y4m' | 'avi' | 'mp4' | None by magic bytes — a projection."""
    if raw.startswith(b"YUV4MPEG2"):
        return "y4m"
    if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
        return "avi"
    if len(raw) >= 12 and raw[4:8] == b"ftyp":
        return "mp4"
    return None


def probe_video(raw: bytes) -> dict:
    """Container-dispatched metadata probe: MP4 boxes, AVI headers,
    or a Y4M stream scan — all without touching frame pixels."""
    kind = sniff_video(raw)
    if kind == "y4m":
        return probe_y4m(raw)
    if kind == "avi":
        return probe_avi(raw)
    from .media_codecs import probe_mp4

    return probe_mp4(raw)  # raises its own loud error on non-BMFF


def decode_video_frames(raw: bytes):
    """(frames, fps) for containers with tractable codecs; loud
    ValueError otherwise (MP4's H.264/H.265 payloads need external
    decoders — probe them with :func:`probe_video` instead)."""
    kind = sniff_video(raw)
    if kind == "y4m":
        return decode_y4m(raw)
    if kind == "avi":
        return decode_avi_frames(raw)
    raise ValueError(
        f"no NumPy frame decoder for container {kind or 'unknown'!r} "
        f"(leading bytes {raw[:8]!r}): y4m and avi (MJPG/DIB) decode "
        "here; mp4 payloads need an injected decoder"
    )


def frames_decodable(raw: bytes) -> bool:
    """True when :func:`decode_video_frames` would open this
    container's frames — mirroring its ACTUAL selection (the FIRST
    ``vids`` stream's compression for AVI, not any-stream fourcc:
    an XVID-first AVI with a later MJPG stream is NOT decodable
    here). Probe-cheap (headers only); never raises — unprobeable
    bytes are simply not decodable."""
    try:
        kind = sniff_video(raw)
        if kind == "y4m":
            _y4m_geometry(_y4m_params(raw[: raw.index(b"\x0a")]))
            return True
        if kind == "avi":
            _, streams = _avi_header_info(raw)
            v = next(
                (s for s in streams if s.get("type") == "vids"), None
            )
            return v is not None and v.get("compression") in (
                "MJPG", "DIB",
            )
    except ValueError:
        return False
    return False


def _stride_indices(n_frames: int, max_frames: int) -> range:
    stride = max(1, -(-n_frames // max_frames))  # ceil division
    return range(0, n_frames, stride)


def _iter_sampled_frames(batch: pd.DataFrame, max_frames: int):
    """The shared decode/stride walk both frame surfaces ride:
    yields (media_id, frame_index, n_frames, frame) with the
    media_id-naming error wrap — one place for the policy."""
    for media_id, media in zip(batch["media_id"], batch["media"]):
        raw = bytes(media) if media is not None else b""
        try:
            frames, _fps = decode_video_frames(raw)
        except ValueError as e:
            raise ValueError(f"media_id={media_id}: {e}") from e
        n = len(frames)
        for idx in _stride_indices(n, max_frames):
            yield media_id, idx, n, frames[idx]


def numpy_video_frame_sampler(
    batch: pd.DataFrame, max_frames: int
) -> pd.DataFrame:
    """A REAL `multimodal.sample_frames` frame_sampler: decode y4m/avi
    bytes, emit up to ``max_frames`` uniformly-strided frames per
    media row as FRAME_SCHEMA rows; frame_hash is the md5 of the
    decoded RGB pixel buffer (stable across containers encoding the
    same pixels). Raises naming the media id on undecodable bytes."""
    out = [
        {
            "media_id": media_id,
            "frame_index": idx,
            "n_frames": n,
            "frame_hash": hashlib.md5(
                np.ascontiguousarray(frame).tobytes()
            ).hexdigest(),
        }
        for media_id, idx, n, frame in _iter_sampled_frames(
            batch, max_frames
        )
    ]
    return pd.DataFrame(
        out,
        columns=["media_id", "frame_index", "n_frames", "frame_hash"],
    )


FRAME_IMAGE_SCHEMA_DDL = (
    "media_id long, frame_index int, n_frames int, frame_ppm binary"
)


def sample_frame_images(
    df,
    max_frames: int = 4,
    id_col: str = "media_id",
    media_col: str = "media",
):
    """Video → sampled frames AS PPM IMAGE BINARIES: the bridge from
    the video containers into the whole image pipeline — the emitted
    ``frame_ppm`` column feeds `multimodal.extract_media_features`
    with `media_codecs.numpy_image_decoder`, `numpy_resize_batch`,
    `image_quality_stats`, and frame-level dedup (dd1 on the ppm
    md5) with no special frame type. Same slim-projection
    ``mapInPandas`` plumbing as every media stage."""
    from pyspark.sql import functions as F

    from .media_codecs import encode_ppm

    slim = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(media_col).alias("media"),
    )

    def _frames(batch: pd.DataFrame) -> pd.DataFrame:
        out = [
            {
                "media_id": media_id,
                "frame_index": idx,
                "n_frames": n,
                "frame_ppm": encode_ppm(frame),
            }
            for media_id, idx, n, frame in _iter_sampled_frames(
                batch, max_frames
            )
        ]
        return pd.DataFrame(
            out,
            columns=[
                "media_id", "frame_index", "n_frames", "frame_ppm",
            ],
        )

    def run(batches):
        for batch in batches:
            if len(batch):
                yield _frames(batch)

    return slim.mapInPandas(run, FRAME_IMAGE_SCHEMA_DDL)


def numpy_video_decoder(batch: pd.DataFrame) -> pd.DataFrame:
    """A REAL `multimodal.BatchDecoder` for video: decode y4m/avi
    bytes into `multimodal.MEDIA_FEATURE_SCHEMA` rows — width/height
    from the first frame, n_frames the container's frame count, and
    an 8-dim feature (first and last frames' mean R,G,B in [0,1],
    then fps/100 and n_frames/100, 6-dp rounded — deterministic, so
    driver rows can pin it). Plugs into
    ``extract_media_features(decoder=numpy_video_decoder)`` exactly
    like the image/audio decoders; raises naming the media id."""
    out = []
    for media_id, media in zip(batch["media_id"], batch["media"]):
        raw = bytes(media) if media is not None else b""
        try:
            frames, fps = decode_video_frames(raw)
            if not frames:
                raise ValueError("video has no frames")
        except ValueError as e:
            raise ValueError(f"media_id={media_id}: {e}") from e
        first, last = frames[0], frames[-1]
        feat = [
            *(first.reshape(-1, 3).mean(axis=0) / 255.0),
            *(last.reshape(-1, 3).mean(axis=0) / 255.0),
            fps / 100.0,
            len(frames) / 100.0,
        ]
        out.append(
            {
                "media_id": media_id,
                "n_bytes": len(raw),
                "content_hash": hashlib.md5(raw).hexdigest(),
                "width": int(first.shape[1]),
                "height": int(first.shape[0]),
                "n_frames": len(frames),
                "feature": [round(float(x), 6) for x in feat],
            }
        )
    return pd.DataFrame(
        out,
        columns=[
            "media_id", "n_bytes", "content_hash", "width", "height",
            "n_frames", "feature",
        ],
    )
