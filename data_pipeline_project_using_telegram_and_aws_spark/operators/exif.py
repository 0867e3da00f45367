"""EXIF metadata over JPEG binaries — parse, privacy-scrub, and
orientation handling, pure stdlib struct walking (EXIF is a TIFF
structure embedded in a JPEG APP1 segment; no codec work involved).
The reference pipeline has no image surface; this is north-star
multimodal CURATION plumbing with a privacy edge: camera images
carry GPS coordinates and timestamps in EXIF, and a responsible
corpus build must at minimum KNOW which rows have them
(`extract_exif`'s ``has_gps``) and usually remove them
(`scrub_exif` — the image twin of the text pipeline's
`operators/redaction.py`).

What each piece does, exactly:

- :func:`parse_exif` — APP1 "Exif\\0\\0" → TIFF header (II/MM
  endianness both honored) → IFD0 + Exif sub-IFD + GPS IFD walk.
  Surfaced tags: orientation, make, model, software, datetime,
  datetime_original, and GPS latitude/longitude resolved to signed
  decimal degrees from the RATIONAL triplets + hemisphere refs.
  Unknown/corrupt structures raise ValueError naming the defect.
- :func:`scrub_exif` — byte-level removal of every APP1-Exif (and
  APP1-XMP) segment from the JPEG; entropy-coded data is untouched,
  so the scrub is LOSSLESS (pixels identical) and cheap — segment
  copy, no recode. Other APPn segments (JFIF APP0, ICC APP2) stay:
  they carry rendering info, not provenance.
- :func:`apply_exif_orientation` — the 8 TIFF orientation transforms
  as NumPy index flips/rotations, so decoded pixels can be
  normalized before hashing/featurization (perceptual hashes are NOT
  rotation-invariant; two bytewise-different rotations of one photo
  only dedup if orientation is applied first).

Spark shape: `extract_exif` / `scrub_exif_column` ride the standard
slim-projection ``mapInPandas`` (constant per-row header work — the
entropy stream is never parsed); everything downstream is plain
columns. Non-JPEG bytes and JPEGs without EXIF yield NULL-field rows
rather than errors (absence of metadata is data, not a defect).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

_IFD0_TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0131: "software",
    0x0132: "datetime",
}
_EXIF_TAGS = {0x9003: "datetime_original"}


def _read_value(data, endian, vtype, count, value_field, base):
    size = _TYPE_SIZES.get(vtype)
    if size is None:
        return None  # unknown type: skip the tag, not the file
    total = size * count
    if total <= 4:
        raw = value_field[:total]
    else:
        (off,) = struct.unpack(endian + "I", value_field)
        raw = data[base + off : base + off + total]
        if len(raw) < total:
            raise ValueError(
                f"exif value at offset {off} overruns the segment"
            )
    if vtype == 2:  # ASCII, NUL-terminated
        return raw.split(b"\x00", 1)[0].decode("latin-1").strip()
    if vtype == 3:
        return list(struct.unpack(endian + f"{count}H", raw))
    if vtype == 4:
        return list(struct.unpack(endian + f"{count}I", raw))
    if vtype == 9:
        return list(struct.unpack(endian + f"{count}i", raw))
    if vtype in (5, 10):
        code = "I" if vtype == 5 else "i"
        flat = struct.unpack(endian + f"{2 * count}{code}", raw)
        return [
            (flat[2 * i], flat[2 * i + 1]) for i in range(count)
        ]
    return raw  # BYTE / UNDEFINED


def _walk_ifd(data, endian, base, ifd_off, want):
    """One IFD → ({name: value}, {pointer_tag: offset})."""
    out, pointers = {}, {}
    if base + ifd_off + 2 > len(data):
        raise ValueError(f"exif ifd offset {ifd_off} out of range")
    (n,) = struct.unpack_from(endian + "H", data, base + ifd_off)
    pos = base + ifd_off + 2
    for _ in range(n):
        if pos + 12 > len(data):
            raise ValueError("exif ifd entry overruns the segment")
        tag, vtype, count = struct.unpack_from(
            endian + "HHI", data, pos
        )
        value_field = data[pos + 8 : pos + 12]
        if tag in (0x8769, 0x8825):  # Exif / GPS sub-IFD pointers
            (pointers[tag],) = struct.unpack(endian + "I", value_field)
        elif tag in want:
            out[want[tag]] = _read_value(
                data, endian, vtype, count, value_field, base
            )
        pos += 12
    return out, pointers


def _gps_degrees(triplet, ref):
    """RATIONAL (deg, min, sec) + hemisphere ref → signed decimal."""
    if not triplet or len(triplet) != 3:
        return None
    vals = []
    for num, den in triplet:
        if den == 0:
            return None
        vals.append(num / den)
    deg = vals[0] + vals[1] / 60.0 + vals[2] / 3600.0
    if ref and ref.upper() in ("S", "W"):
        deg = -deg
    return round(deg, 7)


def _iter_jpeg_segments(raw: bytes):
    """Yield (marker, seg_start, seg_end) for each marker segment up
    to SOS; seg bounds cover the full FF-marker-length-payload run."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError(f"not a jpeg (leading bytes {raw[:2]!r})")
    pos = 2
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"jpeg marker sync lost at byte {pos}")
        marker = raw[pos + 1]
        if marker == 0xDA:  # SOS: entropy data follows
            return
        if 0xD0 <= marker <= 0xD9:
            pos += 2
            continue
        size = int.from_bytes(raw[pos + 2 : pos + 4], "big")
        yield marker, pos, pos + 2 + size
        pos += 2 + size


def parse_exif(raw: bytes) -> dict:
    """EXIF fields from a JPEG's APP1 segment:
    ``{orientation, make, model, software, datetime,
    datetime_original, gps_latitude, gps_longitude}`` — every key
    present, NULL (None) when the tag is absent; ALL keys None when
    the JPEG has no EXIF at all. Raises ValueError on non-JPEG bytes
    or a structurally corrupt EXIF block (truncated IFDs, overrun
    offsets) — torn metadata should quarantine, not pass as
    metadata-free."""
    fields = dict.fromkeys(
        [
            "orientation", "make", "model", "software", "datetime",
            "datetime_original", "gps_latitude", "gps_longitude",
        ]
    )
    app1 = None
    for marker, s, e in _iter_jpeg_segments(raw):
        if marker == 0xE1 and raw[s + 4 : s + 10] == b"Exif\x00\x00":
            app1 = raw[s + 10 : e]
            break
    if app1 is None:
        return fields
    if len(app1) < 8:
        raise ValueError("exif tiff header truncated")
    if app1[:2] == b"II":
        endian = "<"
    elif app1[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError(f"exif endianness marker {app1[:2]!r}")
    (magic,) = struct.unpack_from(endian + "H", app1, 2)
    if magic != 42:
        raise ValueError(f"exif tiff magic {magic} != 42")
    (ifd0_off,) = struct.unpack_from(endian + "I", app1, 4)
    got, pointers = _walk_ifd(app1, endian, 0, ifd0_off, _IFD0_TAGS)
    for k, v in got.items():
        fields[k] = v[0] if k == "orientation" and isinstance(
            v, list
        ) else v
    if 0x8769 in pointers:
        sub, _ = _walk_ifd(
            app1, endian, 0, pointers[0x8769], _EXIF_TAGS
        )
        fields.update(sub)
    if 0x8825 in pointers:
        gps, _ = _walk_ifd(
            app1, endian, 0, pointers[0x8825],
            {0x0001: "lat_ref", 0x0002: "lat",
             0x0003: "lon_ref", 0x0004: "lon"},
        )
        fields["gps_latitude"] = _gps_degrees(
            gps.get("lat"), gps.get("lat_ref")
        )
        fields["gps_longitude"] = _gps_degrees(
            gps.get("lon"), gps.get("lon_ref")
        )
    return fields


def scrub_exif(raw: bytes) -> bytes:
    """The JPEG with every APP1 segment (EXIF and XMP both live
    there) removed — byte-level, lossless for pixels (the entropy
    stream is untouched). Idempotent; non-APP1 segments and
    everything from SOS on are copied verbatim."""
    drop = [
        (s, e) for marker, s, e in _iter_jpeg_segments(raw)
        if marker == 0xE1
    ]
    if not drop:
        return raw
    out, pos = bytearray(), 0
    for s, e in drop:
        out += raw[pos:s]
        pos = e
    out += raw[pos:]
    return bytes(out)


# TIFF orientation → (rot90 quarter-turns CCW, flip left-right first)
_ORIENT = {
    1: (0, False), 2: (0, True), 3: (2, False), 4: (2, True),
    5: (1, True), 6: (3, False), 7: (3, True), 8: (1, False),
}


def apply_exif_orientation(px: np.ndarray, orientation) -> np.ndarray:
    """Decoded pixels → upright pixels per the TIFF orientation tag
    (1-8; None/absent = already upright). The inverse transforms of
    how the camera stored the sensor data — normalize BEFORE
    perceptual hashing or featurization."""
    if orientation in (None, 1):
        return px
    try:
        turns, flip = _ORIENT[int(orientation)]
    except (KeyError, ValueError):
        raise ValueError(
            f"exif orientation {orientation!r} outside 1-8"
        ) from None
    if flip:
        px = px[:, ::-1]
    return np.rot90(px, turns) if turns else px


EXIF_SCHEMA_DDL = (
    "media_id long, orientation int, make string, model string, "
    "software string, datetime string, datetime_original string, "
    "gps_latitude double, gps_longitude double, has_gps boolean, "
    "exif_error string"
)


def extract_exif(df, id_col: str = "media_id", media_col: str = "media"):
    """Distributed EXIF triage: one typed row per image with the
    parsed fields, ``has_gps`` (the privacy gate column), and the
    front-door error contract — corrupt EXIF/non-JPEG bytes become
    (media_id, exif_error) rows, never task failures."""
    from pyspark.sql import functions as F

    slim = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(media_col).alias("media"),
    )
    cols = [
        "media_id", "orientation", "make", "model", "software",
        "datetime", "datetime_original", "gps_latitude",
        "gps_longitude", "has_gps", "exif_error",
    ]

    def _rows(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for media_id, media in zip(batch["media_id"], batch["media"]):
            raw = bytes(media) if media is not None else b""
            row = dict.fromkeys(cols)
            row["media_id"] = media_id
            try:
                fields = parse_exif(raw)
            except Exception as e:  # noqa: BLE001 — quarantine policy
                row["exif_error"] = f"{type(e).__name__}: {e}"[:200]
                out.append(row)
                continue
            row.update(fields)
            row["has_gps"] = (
                fields["gps_latitude"] is not None
                or fields["gps_longitude"] is not None
            )
            out.append(row)
        return pd.DataFrame(out, columns=cols)

    def run(batches):
        for batch in batches:
            if len(batch):
                yield _rows(batch)

    return slim.mapInPandas(run, EXIF_SCHEMA_DDL)


def scrub_exif_column(
    df, id_col: str = "media_id", media_col: str = "media"
):
    """(media_id, media) with APP1 segments removed from every JPEG —
    the bulk privacy scrub. Non-JPEG bytes pass through untouched
    (only JPEG carries APP1; refusing non-JPEG would make the
    operator unusable on mixed media columns). Stated limit: a JPEG
    whose marker stream is torn BEFORE its APP1 also passes through
    unmodified — if the no-EXIF guarantee must be absolute, run
    structurally corrupt rows through the media front door's
    quarantine first (`extract_exif`'s ``exif_error`` flags exactly
    these)."""
    from pyspark.sql import functions as F

    slim = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(media_col).alias("media"),
    )

    def _scrub(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for media_id, media in zip(batch["media_id"], batch["media"]):
            raw = bytes(media) if media is not None else b""
            if raw[:2] == b"\xff\xd8":
                try:
                    raw = scrub_exif(raw)
                except ValueError:
                    pass  # torn marker stream: leave bytes as-is
            out.append({"media_id": media_id, "media": raw})
        return pd.DataFrame(out, columns=["media_id", "media"])

    def run(batches):
        for batch in batches:
            if len(batch):
                yield _scrub(batch)

    return slim.mapInPandas(run, "media_id long, media binary")
