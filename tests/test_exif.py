"""EXIF parse / scrub / orientation (`operators/exif.py`) — APP1
segments built BY HAND here (an independent TIFF writer, both
endiannesses), spliced into the real-libjpeg fixture JPEG; GPS
rationals resolved against hand arithmetic; the scrub pinned
lossless by decoding before and after; orientations 1-8 pinned
against the TIFF 6.0 ground-truth transforms."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_pipeline_project_using_telegram_and_aws_spark.operators.exif import (
    apply_exif_orientation,
    extract_exif,
    parse_exif,
    scrub_exif,
    scrub_exif_column,
)
from data_pipeline_project_using_telegram_and_aws_spark.plans.multimodal_queries import (
    _REAL_FIXTURES,
)

# the 331-byte real-libjpeg baseline fixture (2x2): a REAL entropy
# stream for the scrub's losslessness check
_JPEG = bytes.fromhex(_REAL_FIXTURES[3][2])


def _entry(endian, tag, vtype, count, value_bytes):
    assert len(value_bytes) <= 4
    return struct.pack(
        endian + "HHI", tag, vtype, count
    ) + value_bytes.ljust(4, b"\x00")


def _tiff(endian="<", orientation=6, gps=True, make=b"TestCam Industries"):
    """Independent EXIF writer: IFD0 (make, orientation, pointers) +
    Exif sub-IFD (DateTimeOriginal) + GPS IFD (N 37;46;30  W 122;25;6)."""
    e = endian
    # layout: header(8) IFD0 at 8; data area after all IFDs.
    n0 = 2 + (2 if gps else 1)
    ifd0_off = 8
    ifd0_size = 2 + 12 * n0 + 4
    exif_off = ifd0_off + ifd0_size
    exif_size = 2 + 12 * 1 + 4
    gps_off = exif_off + exif_size
    gps_size = 2 + 12 * 4 + 4 if gps else 0
    data_off = gps_off + gps_size
    data = bytearray()

    def put(buf):
        nonlocal data
        off = data_off + len(data)
        data += buf
        return off

    make_b = make + b"\x00"
    make_off = put(make_b)
    dto = b"2021:07:04 12:30:00\x00"
    dto_off = put(dto)
    if gps:
        lat = struct.pack(e + "6I", 37, 1, 46, 1, 30, 1)
        lat_off = put(lat)
        lon = struct.pack(e + "6I", 122, 1, 25, 1, 6, 1)
        lon_off = put(lon)

    ifd0 = struct.pack(e + "H", n0)
    ifd0 += _entry(e, 0x010F, 2, len(make_b),
                   struct.pack(e + "I", make_off))
    ifd0 += _entry(e, 0x0112, 3, 1, struct.pack(e + "H", orientation))
    ifd0 += _entry(e, 0x8769, 4, 1, struct.pack(e + "I", exif_off))
    if gps:
        ifd0 += _entry(e, 0x8825, 4, 1, struct.pack(e + "I", gps_off))
    ifd0 += b"\x00" * 4  # next-IFD pointer

    exif_ifd = struct.pack(e + "H", 1)
    exif_ifd += _entry(e, 0x9003, 2, len(dto),
                       struct.pack(e + "I", dto_off))
    exif_ifd += b"\x00" * 4

    gps_ifd = b""
    if gps:
        gps_ifd = struct.pack(e + "H", 4)
        gps_ifd += _entry(e, 0x0001, 2, 2, b"N\x00")
        gps_ifd += _entry(e, 0x0002, 5, 3, struct.pack(e + "I", lat_off))
        gps_ifd += _entry(e, 0x0003, 2, 2, b"W\x00")
        gps_ifd += _entry(e, 0x0004, 5, 3, struct.pack(e + "I", lon_off))
        gps_ifd += b"\x00" * 4

    tiff = (
        (b"II" if e == "<" else b"MM")
        + struct.pack(e + "H", 42)
        + struct.pack(e + "I", ifd0_off)
        + ifd0 + exif_ifd + gps_ifd + bytes(data)
    )
    assert len(tiff) == data_off + len(data) - 0
    return tiff


def _with_exif(jpeg=_JPEG, **kw):
    body = b"Exif\x00\x00" + _tiff(**kw)
    app1 = b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body
    return jpeg[:2] + app1 + jpeg[2:]


@pytest.mark.parametrize("endian", ["<", ">"])
def test_parse_both_endians_and_gps_arithmetic(endian):
    f = parse_exif(_with_exif(endian=endian))
    assert f["make"] == "TestCam Industries"
    assert f["orientation"] == 6
    assert f["datetime_original"] == "2021:07:04 12:30:00"
    # 37 + 46/60 + 30/3600 = 37.775; W -> negative
    assert f["gps_latitude"] == pytest.approx(37.775, abs=1e-7)
    assert f["gps_longitude"] == pytest.approx(
        -(122 + 25 / 60 + 6 / 3600), abs=1e-7
    )


def test_no_exif_and_failures():
    f = parse_exif(_JPEG)
    assert all(v is None for v in f.values())
    with pytest.raises(ValueError, match="not a jpeg"):
        parse_exif(b"PNG not jpeg")
    # truncated TIFF header inside APP1 is loud, not metadata-free
    body = b"Exif\x00\x00II"
    app1 = b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body
    with pytest.raises(ValueError, match="truncated"):
        parse_exif(_JPEG[:2] + app1 + _JPEG[2:])
    # overrun value offset is loud: patch the ifd0 make entry's
    # value-offset field (ifd0 at tiff+8, first entry at +10, value
    # field 8 bytes into the entry) to point far past the segment
    raw = bytearray(_with_exif())
    tiff_start = raw.find(b"Exif\x00\x00") + 6
    struct.pack_into("<I", raw, tiff_start + 10 + 8, 2**24)
    with pytest.raises(ValueError, match="overruns"):
        parse_exif(bytes(raw))


def test_scrub_is_lossless_and_idempotent():
    from data_pipeline_project_using_telegram_and_aws_spark.operators.jpeg import (
        decode_jpeg,
    )

    tagged = _with_exif()
    assert parse_exif(tagged)["make"] is not None
    clean = scrub_exif(tagged)
    assert len(clean) < len(tagged)
    assert all(v is None for v in parse_exif(clean).values())
    # pixels identical: the entropy stream was untouched
    assert (decode_jpeg(clean) == decode_jpeg(_JPEG)).all()
    assert scrub_exif(clean) == clean  # idempotent
    assert scrub_exif(_JPEG) == _JPEG  # no-op without APP1


def test_orientations_match_tiff_ground_truth():
    px = np.arange(24).reshape(2, 4, 3)
    exp = {
        1: px, 2: px[:, ::-1], 3: px[::-1, ::-1], 4: px[::-1, :],
        5: px.transpose(1, 0, 2), 6: np.rot90(px, 3),
        7: px[::-1, ::-1].transpose(1, 0, 2), 8: np.rot90(px, 1),
    }
    for o, want in exp.items():
        got = apply_exif_orientation(px, o)
        assert got.shape == want.shape and (got == want).all(), o
    assert (apply_exif_orientation(px, None) == px).all()
    with pytest.raises(ValueError, match="orientation"):
        apply_exif_orientation(px, 9)


def test_extract_and_scrub_through_spark(spark):
    rows = [
        (1, bytearray(_with_exif())),                  # gps + exif
        (2, bytearray(_with_exif(gps=False, orientation=3))),
        (3, bytearray(_JPEG)),                         # no exif
        (4, bytearray(b"\x89PNG not a jpeg")),         # error row
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {r.media_id: r for r in extract_exif(df).collect()}
    assert got[1].has_gps and got[1].orientation == 6
    assert got[1].gps_latitude == pytest.approx(37.775, abs=1e-6)
    assert got[2].has_gps is False and got[2].orientation == 3
    assert got[3].has_gps is False and got[3].make is None
    assert got[4].exif_error and got[4].has_gps is None
    # bulk scrub: jpegs cleaned, non-jpeg passes through untouched
    clean = {
        r.media_id: bytes(r.media)
        for r in scrub_exif_column(df).collect()
    }
    assert all(
        v is None for v in parse_exif(clean[1]).values()
    )
    assert clean[3] == _JPEG
    assert clean[4] == bytes(rows[3][1])
    # privacy gate composition: has_gps filters before export
    risky = extract_exif(df).filter("has_gps").collect()
    assert [r.media_id for r in risky] == [1]
