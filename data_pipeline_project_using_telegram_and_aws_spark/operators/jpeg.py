"""Pure-NumPy JPEG decoder — baseline (SOF0) AND progressive (SOF2).
JPEG is Huffman coding + an 8×8 IDCT + chroma upsampling: no external
entropy libraries needed, just careful bit-level work. Progressive
uses the IDENTICAL Huffman entropy coding as baseline — only the scan
structure differs (spectral-selection bands and successive-
approximation bit planes accumulated across scans, T.81 Annex G) — so
it shares every primitive here. `media_codecs.sniff_format` dispatches
here so the shared `multimodal` injection points (features, resize)
read JPEGs like any other container.

Scope, stated exactly:
- Baseline DCT (SOF0) and extended sequential DCT (SOF1 — identical
  entropy coding, the standard carrier for 12-bit samples), 8- or
  12-bit precision (12-bit output is uint16 0..4095, level shift
  2048, 16-bit DQT entries honored), grayscale or 3-component
  YCbCr, component sampling factors 1-2 in each axis (4:4:4, 4:2:2,
  4:2:0 and friends), restart intervals (DRI/RSTn), stuffed 0xFF00
  bytes, multiple DQT/DHT segments, APPn/COM skipped.
- Progressive DCT (SOF2): multi-scan spectral selection (Ss..Se
  zigzag bands), successive approximation (Ah/Al bit planes) for both
  DC and AC, EOB runs, interleaved multi-component DC scans and the
  spec-mandated single-component AC scans, per-scan restart
  intervals; coefficients accumulate in per-component stores and the
  image reconstructs once at EOI through the same dequantize → IDCT →
  upsample tail as baseline.
- REJECTED loudly, never approximated: lossless/hierarchical and
  every other non-SOF0/1/2 frame type, arithmetic coding (DAC),
  4-component CMYK/Adobe transforms, sampling factors > 2.

Pipeline per scan: canonical Huffman tables from DHT (code lengths →
codes in count order), MSB-first bit reader over the de-stuffed
entropy stream, per-block DC-diff + AC run-length decode into zigzag
order, dequantize, de-zigzag, IDCT via two dense 8×8 matrix products
(``A.T @ block @ A`` with the orthonormal DCT-II basis — exact to
float64 round-off, no fast-IDCT integer approximations), +2^(P-1) level
shift, per-component planes assembled MCU by MCU, chroma replicated
up to full resolution (the nearest-neighbor choice is stated — JPEG
does not standardize the upsampling filter), BT.601 YCbCr→RGB.

Decode fidelity note: JPEG specifies the decoder DCT only within a
conformance tolerance (Annex A), so different decoders legitimately
differ by ±1 in a few pixels; tests therefore pin EXACT values where
the math is exact (flat DC-only blocks, which exercise every layer of
the pipeline except AC runs) and ±1-tolerance cosine fields vs an
independent closed-form oracle for AC coefficients.
"""

from __future__ import annotations

import numpy as np

# zigzag: zz[i] = (row, col) of the i-th coefficient in scan order.
# Generated algorithmically (diagonal walk); the tests pin it against
# the published literal table.
def _zigzag_order() -> list[tuple[int, int]]:
    order = []
    for s in range(15):  # anti-diagonals r+c = s
        rng = range(s + 1) if s % 2 else range(s, -1, -1)
        for r in rng:
            c = s - r
            if r < 8 and c < 8:
                order.append((r, c))
    return order


_ZIGZAG = _zigzag_order()
_ZZ_ROWS = np.array([rc[0] for rc in _ZIGZAG])
_ZZ_COLS = np.array([rc[1] for rc in _ZIGZAG])

# orthonormal DCT-II basis: A[u, x] = c(u) cos((2x+1)uπ/16) / 2
_DCT_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients → (n, 8, 8) float spatial
    samples (pre-level-shift): A.T @ F @ A batched."""
    return np.einsum("um,nuv,vp->nmp", _DCT_A, coefs, _DCT_A)


def _build_huffman(counts: bytes, symbols: bytes) -> dict:
    """Canonical Huffman per JPEG Annex C: 16 length counts + symbols
    in code order → {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if code >= (1 << length):
                # Kraft overflow: the counts assign more codes than a
                # prefix code of this length can hold — an invalid
                # table would otherwise decode WRONG silently
                raise ValueError(
                    "jpeg huffman table overfull (invalid code "
                    f"lengths: code {code} at length {length})"
                )
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, honoring
    0xFF00 byte stuffing; any other 0xFF-marker ends the current
    entropy segment (restart markers are consumed by `restart`)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg entropy stream truncated")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(
                self.data
            ) else None
            if nxt == 0x00:
                self.pos += 2  # stuffed literal 0xFF
            else:
                raise ValueError(
                    "jpeg entropy stream ended at marker "
                    f"0xff{nxt:02x}" if nxt is not None
                    else "jpeg entropy stream truncated at 0xff"
                )
        else:
            self.pos += 1
        self.acc = b
        self.nbits = 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self, expected_m: int) -> None:
        """Byte-align and consume the RSTm marker."""
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + expected_m
        ):
            got = self.data[self.pos : self.pos + 2].hex()
            raise ValueError(
                f"jpeg expected restart marker rst{expected_m}, "
                f"got bytes 0x{got}"
            )
        self.pos += 2


def _decode_huff(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg huffman code not in table (corrupt stream)")


def _receive_extend(r: _BitReader, t: int) -> int:
    if t == 0:
        return 0
    v = r.bits(t)
    if v < (1 << (t - 1)):  # negative branch of the EXTEND procedure
        v -= (1 << t) - 1
    return v


def _decode_block(r, dc_table, ac_table, pred: int):
    """One 8×8 block → (zigzag-order int coefficient array, new DC
    predictor)."""
    pred += _receive_extend(r, _decode_huff(r, dc_table))
    coef = np.zeros(64, dtype=np.int32)
    coef[0] = pred
    k = 1
    while k < 64:
        rs = _decode_huff(r, ac_table)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError(
                f"jpeg AC run overflows the block (k={k})"
            )
        coef[k] = _receive_extend(r, size)
        k += 1
    return coef, pred


def decode_jpeg(raw: bytes) -> np.ndarray:
    """JPEG → (h, w, 1) grayscale or (h, w, 3) RGB; uint8 for 8-bit
    precision, uint16 (0..4095) for 12-bit. Raises ValueError quoting
    exactly what it cannot honor (module docstring has the
    supported/rejected matrix)."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError(f"not a jpeg (leading bytes {raw[:2]!r})")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    restart_interval = 0
    out = None
    prog_store = None  # progressive: per-comp coefficient planes
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(
                f"jpeg marker expected at offset {pos}, got "
                f"0x{raw[pos]:02x}"
            )
        marker = raw[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(raw[pos + 2 : pos + 4], "big")
        body = raw[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError(f"jpeg segment 0x{marker:02x} truncated")
        if marker == 0xDB:  # DQT: one or more tables
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq not in (0, 1):
                    raise ValueError(
                        f"jpeg DQT element precision {pq} invalid"
                    )
                # pq=1: 16-bit big-endian entries (the 12-bit-sample
                # companion per T.81 B.2.4.1)
                width = 64 * (pq + 1)
                qbody = body[i + 1 : i + 1 + width]
                if len(qbody) < width:
                    raise ValueError("jpeg DQT segment truncated")
                qtables[tq] = np.frombuffer(
                    qbody, dtype=(">u2" if pq else np.uint8)
                ).astype(np.int32)
                i += 1 + width
        elif marker == 0xC4:  # DHT: one or more tables
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                counts = body[i + 1 : i + 17]
                if len(counts) < 16:
                    raise ValueError("jpeg DHT segment truncated")
                n = sum(counts)
                symbols = body[i + 17 : i + 17 + n]
                if len(symbols) < n:
                    # the counts promise more symbols than the segment
                    # ships — without this check _build_huffman would
                    # IndexError past the quarantine contract
                    raise ValueError(
                        "jpeg DHT segment truncated: counts promise "
                        f"{n} symbols, {len(symbols)} present"
                    )
                htables[(tc, th)] = _build_huffman(counts, symbols)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended sequential (the 12-bit
            # carrier, same entropy coding) / SOF2 progressive
            if frame is not None:
                raise ValueError("jpeg has multiple SOF frame headers")
            precision = body[0]
            if precision not in (8, 12):
                raise ValueError(
                    f"jpeg precision {precision} unsupported (8/12 only)"
                )
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError(
                    f"jpeg {ncomp}-component images unsupported "
                    "(grayscale / YCbCr only)"
                )
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise ValueError(
                        f"jpeg sampling factors {hs}x{vs} unsupported"
                    )
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = {
                "h": h, "w": w, "comps": comps, "precision": precision,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg SOF 0x{marker:02x} unsupported - baseline "
                "(SOF0), extended sequential (SOF1) and progressive "
                "(SOF2) only"
            )
        elif marker == 0xCC:
            raise ValueError("jpeg arithmetic coding unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg SOS before SOF frame header")
            if frame["progressive"]:
                if prog_store is None:
                    prog_store = _alloc_coef_store(frame)
                pos = _decode_progressive_scan(
                    raw, pos, seg_len, body, frame, prog_store,
                    htables, restart_interval,
                )
                continue
            ns = body[0]
            if ns != len(frame["comps"]):
                raise ValueError(
                    "jpeg partial/interleaved-subset scans unsupported"
                )
            scan_tabs = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(
                    (x for x in frame["comps"] if x["id"] == cs), None
                )
                if comp is None:
                    raise ValueError(
                        f"jpeg scan names unknown component {cs}"
                    )
                td, ta = tt >> 4, tt & 0x0F
                if (0, td) not in htables or (1, ta) not in htables:
                    raise ValueError(
                        f"jpeg scan references missing huffman table "
                        f"(dc={td}, ac={ta})"
                    )
                scan_tabs.append(
                    (comp, htables[(0, td)], htables[(1, ta)])
                )
            out = _decode_scan(
                raw, pos + 2 + seg_len, frame, scan_tabs, qtables,
                restart_interval,
            )
            break
        # APPn (E0-EF), COM (FE), others: skip
        pos += 2 + seg_len
    if out is None and prog_store is not None:
        out = _reconstruct(frame, prog_store, qtables)
    if out is None:
        raise ValueError("jpeg has no decodable scan (missing SOS)")
    return out


def _geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _alloc_coef_store(frame):
    """Per-component zigzag coefficient planes sized to the full MCU
    grid (non-interleaved scans cover the ≤-sized cbw×cbh block grid;
    padding blocks stay zero and are cropped at reconstruction)."""
    _, _, mcux, mcuy = _geometry(frame)
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    ]


def _decode_scan(
    raw, pos, frame, scan_tabs, qtables, restart_interval
) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if h < 1 or w < 1:
        raise ValueError(f"jpeg dimensions {w}x{h} invalid")
    _, _, mcux, mcuy = _geometry(frame)
    coef_store = _alloc_coef_store(frame)
    reader = _BitReader(raw, pos)
    preds = [0] * len(comps)
    rst_m = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            reader.restart(rst_m)
            rst_m = (rst_m + 1) % 8
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (comp, dc_t, ac_t) in enumerate(scan_tabs):
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    coef, preds[ci] = _decode_block(
                        reader, dc_t, ac_t, preds[ci]
                    )
                    coef_store[ci][
                        my * comp["v"] + by, mx * comp["h"] + bx
                    ] = coef
    return _reconstruct(frame, coef_store, qtables)


def _reconstruct(frame, coef_store, qtables) -> np.ndarray:
    """Dequantize + de-zigzag + IDCT per component (batched), assemble
    planes, upsample chroma, color-convert — shared by the baseline
    single-scan path and the progressive at-EOI reconstruction."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if h < 1 or w < 1:
        raise ValueError(f"jpeg dimensions {w}x{h} invalid")
    hmax, vmax, mcux, mcuy = _geometry(frame)
    # level shift / range / output dtype follow the sample precision
    # (T.81 A.3.1: shift by 2^(P-1)); 12-bit output is uint16 0..4095
    prec = frame.get("precision", 8)
    mid = 1 << (prec - 1)
    top = (1 << prec) - 1
    dtype = np.uint8 if prec == 8 else np.uint16
    for c in comps:
        if c["tq"] not in qtables:
            raise ValueError(
                f"jpeg component references missing quant table "
                f"{c['tq']}"
            )
    planes = []
    for ci, c in enumerate(comps):
        zz = coef_store[ci].reshape(-1, 64) * qtables[c["tq"]][None, :]
        blocks = np.zeros((zz.shape[0], 8, 8), dtype=np.float64)
        blocks[:, _ZZ_ROWS, _ZZ_COLS] = zz
        spatial = _idct_blocks(blocks) + float(mid)
        by, bx = mcuy * c["v"], mcux * c["h"]
        plane = (
            spatial.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # replicate chroma up to full MCU-grid resolution, then crop
        plane = np.repeat(
            np.repeat(plane, hmax // c["h"], axis=1),
            vmax // c["v"],
            axis=0,
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, top).astype(dtype)
        return y[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - float(mid))
    g = y - 0.344136 * (cb - float(mid)) - 0.714136 * (cr - float(mid))
    b = y + 1.772 * (cb - float(mid))
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, top).astype(dtype)


# --------------------------------------------------- progressive (SOF2)
# T.81 Annex G: the same canonical-Huffman entropy coding as baseline,
# organized as multiple scans that each carry one spectral band
# (zigzag indices Ss..Se) at one successive-approximation bit plane
# (Ah = prior point transform, Al = this scan's). Coefficients
# accumulate in the persistent per-component stores; reconstruction
# happens once, at EOI, through the shared `_reconstruct` tail.


def _next_marker(raw: bytes, pos: int) -> int:
    """Offset of the next real marker at/after pos: skips entropy
    bytes, 0xFF00 stuffing, RST markers, and 0xFF fill bytes."""
    i = pos
    n = len(raw)
    while i + 1 < n:
        if raw[i] != 0xFF:
            i += 1
            continue
        nxt = raw[i + 1]
        if nxt == 0x00:  # stuffed literal
            i += 2
        elif nxt == 0xFF:  # fill byte
            i += 1
        elif 0xD0 <= nxt <= 0xD7:  # stray RST: not a segment marker
            i += 2
        else:
            return i
    raise ValueError("jpeg truncated: no marker after scan data")


def _dc_first(reader, dc_table, coef, pred: int, al: int) -> int:
    diff = _receive_extend(reader, _decode_huff(reader, dc_table))
    pred += diff
    coef[0] = pred << al
    return pred


def _dc_refine(reader, coef, al: int) -> None:
    # one raw bit per block, no Huffman; bitwise OR on the stored
    # two's-complement value reproduces the encoder's arithmetic
    # shifts exactly (negative DC included)
    if reader.bit():
        coef[0] = int(coef[0]) | (1 << al)


def _ac_first(reader, ac_table, coef, ss, se, al, eobrun: int) -> int:
    """First pass over band Ss..Se: run-length + EXTEND, values landing
    at bit plane Al; EOB runs (EOBn codes) skip whole blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(reader, ac_table)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1
            if run:
                eobrun += reader.bits(run)
            break
        k += run
        if k > se:
            raise ValueError(
                f"jpeg progressive AC run overflows band (k={k}>{se})"
            )
        coef[k] = _receive_extend(reader, size) << al
        k += 1
    return eobrun


def _ac_refine(reader, ac_table, coef, ss, se, al, eobrun: int) -> int:
    """Refinement pass (Ah>0): one correction bit per already-nonzero
    coefficient in the band; newly-nonzero coefficients arrive as
    ±(1<<Al) positioned by zero-history runs (T.81 G.1.2.3)."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k: int) -> None:
        c = int(coef[k])
        if reader.bit() and (c & p1) == 0:
            coef[k] = c + (p1 if c >= 0 else m1)

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(reader, ac_table)
            run, size = rs >> 4, rs & 0x0F
            val = 0
            if size == 0:
                if run < 15:  # EOBn: run of end-of-bands
                    eobrun = 1 << run
                    if run:
                        eobrun += reader.bits(run)
                    break
                # run == 15: ZRL skips 16 zero-HISTORY coefficients
            else:
                if size != 1:
                    raise ValueError(
                        "jpeg AC refinement magnitude must be 1 bit"
                    )
                val = p1 if reader.bit() else m1
            # advance over `run` zero-history positions, appending
            # correction bits to every nonzero coefficient passed
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        # inside an EOB run: the band still carries correction bits
        # for its nonzero history
        while k <= se:
            if coef[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    raw, pos, seg_len, body, frame, store, htables, restart_interval
) -> int:
    """Decode one SOS of a progressive frame into the persistent
    stores; returns the offset of the next marker after the scan's
    entropy data."""
    comps = frame["comps"]
    ns = body[0]
    if len(body) < 4 + 2 * ns:
        raise ValueError("jpeg SOS header truncated")
    scan = []  # (comp_index, td, ta)
    for c in range(ns):
        cs, tt = body[1 + 2 * c], body[2 + 2 * c]
        ci = next(
            (i for i, x in enumerate(comps) if x["id"] == cs), None
        )
        if ci is None:
            raise ValueError(f"jpeg scan names unknown component {cs}")
        scan.append((ci, tt >> 4, tt & 0x0F))
    ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
    ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
    if ss == 0:
        if se != 0:
            raise ValueError("jpeg progressive DC scan with Se != 0")
    else:
        if ns != 1:
            raise ValueError(
                "jpeg progressive AC scan must be single-component"
            )
        if not ss <= se <= 63:
            raise ValueError(f"jpeg spectral band {ss}..{se} invalid")
    dc_first, dc_refine = ss == 0 and ah == 0, ss == 0 and ah != 0
    # table presence: DC-first needs its DC table; AC scans their AC
    # table; DC refinement reads raw bits only
    for ci, td, ta in scan:
        if dc_first and (0, td) not in htables:
            raise ValueError(f"jpeg scan references missing huffman "
                             f"table (dc={td})")
        if ss > 0 and (1, ta) not in htables:
            raise ValueError(f"jpeg scan references missing huffman "
                             f"table (ac={ta})")
    hmax, vmax, mcux, mcuy = _geometry(frame)
    reader = _BitReader(raw, pos + 2 + seg_len)
    preds = [0] * ns
    eobrun = 0
    rst_m = 0
    if ns == 1:
        ci = scan[0][0]
        c = comps[ci]
        # non-interleaved: the block grid of THIS component's samples
        cbw = -(-(-(-frame["w"] * c["h"] // hmax)) // 8)
        cbh = -(-(-(-frame["h"] * c["v"] // vmax)) // 8)
        n_units = cbw * cbh
    else:
        n_units = mcux * mcuy
    for m in range(n_units):
        if restart_interval and m and m % restart_interval == 0:
            reader.restart(rst_m)
            rst_m = (rst_m + 1) % 8
            preds = [0] * ns
            eobrun = 0
        if ns == 1:
            by, bx = divmod(m, cbw)
            blocks = [(0, by, bx)]
        else:
            my, mx = divmod(m, mcux)
            blocks = [
                (si, my * comps[ci_]["v"] + by, mx * comps[ci_]["h"] + bx)
                for si, (ci_, _, _) in enumerate(scan)
                for by in range(comps[ci_]["v"])
                for bx in range(comps[ci_]["h"])
            ]
        for si, by, bx in blocks:
            ci_, td, ta = scan[si]
            coef = store[ci_][by, bx]
            if dc_first:
                preds[si] = _dc_first(
                    reader, htables[(0, td)], coef, preds[si], al
                )
            elif dc_refine:
                _dc_refine(reader, coef, al)
            elif ah == 0:
                eobrun = _ac_first(
                    reader, htables[(1, ta)], coef, ss, se, al, eobrun
                )
            else:
                eobrun = _ac_refine(
                    reader, htables[(1, ta)], coef, ss, se, al, eobrun
                )
    return _next_marker(raw, reader.pos)
