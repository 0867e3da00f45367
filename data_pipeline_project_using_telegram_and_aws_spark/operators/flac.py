"""Pure-Python/NumPy FLAC decoder — audio parity with the image-codec
story: WAV covered raw PCM, this covers the lossless COMPRESSED format
real audio corpora actually ship. FLAC is rice-coded linear
prediction — integer arithmetic end to end, no DSP library needed —
so unlike JPEG the decode is EXACT and differential tests can demand
bit-identical samples.

Scope, stated exactly:
- Supported: "fLaC" container with STREAMINFO (other metadata blocks
  skipped), fixed-blocksize streams, 8/16/24-bit samples, up to 8
  independent channels plus the three stereo decorrelations
  (left/side, right/side, mid/side), all four subframe types
  (CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32), rice and
  rice2 residual methods with any partition order incl. escaped raw
  partitions, wasted-bits shifts, CRC-8 frame-header and CRC-16 frame
  verification.
- Rejected loudly: non-FLAC bytes, missing STREAMINFO, reserved
  codes, CRC mismatches, streams whose frames disagree with
  STREAMINFO's channel/depth promise.

Output matches `media_codecs.decode_wav`: (sample_rate,
(n_samples, n_channels) float64 in [-1, 1]), so every downstream
audio operator (features, frame energies) is container-agnostic.
"""

from __future__ import annotations

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _Bits:
    """MSB-first bit reader with a byte-position anchor (frames are
    byte-aligned; CRCs cover whole byte ranges)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, bytepos: int = 0):
        self.data = data
        self.bitpos = bytepos * 8

    def bytepos(self) -> int:
        return self.bitpos // 8

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) // 8 * 8

    def u(self, n: int) -> int:
        """n-bit unsigned."""
        end = self.bitpos + n
        if end > len(self.data) * 8:
            raise ValueError("flac bitstream truncated")
        v = 0
        pos = self.bitpos
        while n:
            byte = self.data[pos // 8]
            avail = 8 - pos % 8
            take = min(avail, n)
            v = (v << take) | (
                (byte >> (avail - take)) & ((1 << take) - 1)
            )
            pos += take
            n -= take
        self.bitpos = pos
        return v

    def s(self, n: int) -> int:
        """n-bit two's-complement signed."""
        v = self.u(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.u(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("flac unary run absurd (corrupt)")
        return q


def _coded_number(r: _Bits) -> int:
    """The UTF-8-style frame/sample number."""
    b0 = r.u(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError(f"flac coded number lead byte 0x{b0:02x}")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = r.u(8)
        if c >> 6 != 0b10:
            raise ValueError("flac coded number continuation byte")
        v = (v << 6) | (c & 0x3F)
    return v


def _residual(r: _Bits, blocksize: int, order: int) -> list[int]:
    method = r.u(2)
    if method not in (0, 1):
        raise ValueError(f"flac residual method {method} reserved")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = r.u(4)
    n_parts = 1 << part_order
    if blocksize % n_parts:
        raise ValueError(
            f"flac partition order {part_order} does not divide "
            f"blocksize {blocksize}"
        )
    out: list[int] = []
    for p in range(n_parts):
        n = blocksize // n_parts - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("flac predictor order exceeds partition")
        param = r.u(plen)
        if param == escape:
            raw_bits = r.u(5)
            out += [r.s(raw_bits) if raw_bits else 0 for _ in range(n)]
        else:
            for _ in range(n):
                q = r.unary()
                v = (q << param) | (r.u(param) if param else 0)
                out.append((v >> 1) ^ -(v & 1))  # zigzag → signed
    return out


def _subframe(r: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if r.u(1) != 0:
        raise ValueError("flac subframe pad bit set (corrupt)")
    stype = r.u(6)
    wasted = 0
    if r.u(1):  # wasted-bits flag: unary count - 1
        wasted = r.unary() + 1
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        out = np.full(blocksize, r.s(eff), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([r.s(eff) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [r.s(eff) for _ in range(order)]
        res = _residual(r, blocksize, order)
        coefs = _FIXED_COEFS[order]
        s = list(warm)
        for e in res:
            pred = sum(c * s[-j - 1] for j, c in enumerate(coefs))
            s.append(e + pred)
        out = np.array(s, dtype=np.int64)
    elif stype >= 32:  # LPC order = stype - 31
        order = stype - 31
        warm = [r.s(eff) for _ in range(order)]
        precision = r.u(4)
        if precision == 0xF:
            raise ValueError("flac lpc precision code 15 invalid")
        precision += 1
        shift = r.s(5)
        if shift < 0:
            raise ValueError("flac negative lpc shift invalid")
        coefs = [r.s(precision) for _ in range(order)]
        res = _residual(r, blocksize, order)
        s = list(warm)
        for e in res:
            acc = sum(c * s[-j - 1] for j, c in enumerate(coefs))
            s.append(e + (acc >> shift))
        out = np.array(s, dtype=np.int64)
    else:
        raise ValueError(f"flac subframe type {stype} reserved")
    return out << wasted


_BLOCKSIZE_CODES = {
    1: 192, **{i: 576 << (i - 2) for i in range(2, 6)},
    **{i: 256 << (i - 8) for i in range(8, 16)},
}
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_DEPTH_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_flac(raw: bytes):
    """FLAC bytes → (sample_rate, (n_samples, n_channels) float64 in
    [-1, 1]). Exact integer reconstruction; CRC-8 and CRC-16 verified
    per frame; raises ValueError naming any defect."""
    if raw[:4] != b"fLaC":
        raise ValueError(f"not a flac (leading bytes {raw[:4]!r})")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(raw):
            raise ValueError("flac metadata truncated")
        hdr = raw[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        blen = int.from_bytes(raw[pos + 1 : pos + 4], "big")
        body = raw[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("flac metadata block truncated")
        if btype == 0:  # STREAMINFO
            r = _Bits(body)
            r.u(16)  # min blocksize
            r.u(16)  # max blocksize
            r.u(24)
            r.u(24)
            rate = r.u(20)
            channels = r.u(3) + 1
            bps = r.u(5) + 1
            total = r.u(36)
            info = {
                "rate": rate, "channels": channels,
                "bps": bps, "total": total,
            }
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("flac missing STREAMINFO block")
    if info["bps"] not in (8, 16, 24):
        raise ValueError(
            f"flac {info['bps']}-bit samples unsupported (8/16/24)"
        )
    chunks: list[np.ndarray] = []
    got = 0
    while pos < len(raw) and (info["total"] == 0 or got < info["total"]):
        frame_start = pos
        r = _Bits(raw, pos)
        sync = r.u(14)
        if sync != 0b11111111111110:
            raise ValueError(
                f"flac frame sync not found at offset {pos}"
            )
        r.u(1)  # reserved
        r.u(1)  # blocking strategy
        bs_code = r.u(4)
        rate_code = r.u(4)
        chan_code = r.u(4)
        depth_code = r.u(3)
        r.u(1)  # reserved
        _coded_number(r)
        if bs_code == 0:
            raise ValueError("flac blocksize code 0 reserved")
        elif bs_code == 6:
            blocksize = r.u(8) + 1
        elif bs_code == 7:
            blocksize = r.u(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if rate_code == 12:
            r.u(8)
        elif rate_code in (13, 14):
            r.u(16)
        elif rate_code == 15:
            raise ValueError("flac sample rate code 15 invalid")
        if depth_code == 0:
            bps = info["bps"]
        elif depth_code in _DEPTH_CODES:
            bps = _DEPTH_CODES[depth_code]
        else:
            raise ValueError(f"flac sample depth code {depth_code}")
        header_bytes = raw[frame_start : r.bytepos()]
        if r.u(8) != _crc8(header_bytes):
            raise ValueError(
                f"flac frame header crc mismatch at offset {frame_start}"
            )
        if chan_code < 8:
            n_chan = chan_code + 1
            subs = [_subframe(r, blocksize, bps) for _ in range(n_chan)]
        elif chan_code in (8, 9, 10):
            n_chan = 2
            # the SIDE channel carries one extra bit
            if chan_code == 8:  # left/side
                left = _subframe(r, blocksize, bps)
                side = _subframe(r, blocksize, bps + 1)
                subs = [left, left - side]
            elif chan_code == 9:  # right/side
                side = _subframe(r, blocksize, bps + 1)
                right = _subframe(r, blocksize, bps)
                subs = [right + side, right]
            else:  # mid/side
                mid = _subframe(r, blocksize, bps)
                side = _subframe(r, blocksize, bps + 1)
                m2 = (mid << 1) | (side & 1)
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"flac channel assignment {chan_code} reserved")
        if n_chan != info["channels"]:
            raise ValueError(
                f"flac frame has {n_chan} channels, STREAMINFO promises "
                f"{info['channels']}"
            )
        r.align()
        frame_body = raw[frame_start : r.bytepos()]
        crc = r.u(16)
        if crc != _crc16(frame_body):
            raise ValueError(
                f"flac frame crc16 mismatch at offset {frame_start}"
            )
        pos = r.bytepos()
        chunks.append(np.stack(subs, axis=1))
        got += blocksize
    if not chunks:
        raise ValueError("flac has no audio frames")
    samples = np.concatenate(chunks, axis=0)
    if info["total"]:
        samples = samples[: info["total"]]
    scale = float(1 << (info["bps"] - 1))
    return info["rate"], samples.astype(np.float64) / scale
