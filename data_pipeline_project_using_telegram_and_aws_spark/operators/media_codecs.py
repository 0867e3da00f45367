"""Pure-NumPy media codecs — the real decoders this container CAN run:
binary PPM (P6), 24-bit uncompressed BMP, RIFF/WAVE integer PCM,
8- and 16-bit PNG (grayscale / gray+alpha / RGB / RGBA /
palette+tRNS, both interlace methods — PNG's only compression is DEFLATE, which
stdlib ``zlib`` speaks), GIF87a/89a including ANIMATED multi-frame
GIFs (GIF's only compression is LZW, implemented here; compositing
applies frame rects, transparency, interlace, and disposal methods),
and BASELINE JPEG (`operators/jpeg.py`: canonical Huffman + exact
matrix IDCT + chroma upsampling — see that module for the
supported/rejected matrix). No PIL/ffmpeg needed. They plug into
`multimodal.py`'s injection points
(``extract_media_features(decoder=numpy_image_decoder)``,
``resize_media(resizer=numpy_resize_batch)``,
``sample_frames(frame_sampler=numpy_gif_frame_sampler)`` — the 1→N
multi-frame shape now has a REAL decoder), upgrading that module's
story from "deterministic fake, real plumbing" to "real decode for
the common image containers, library-injection for the rest" — the
environment gate now covers MP3/AAC audio and the compressed video
bitstreams (H.264/H.265/VP9) only — progressive JPEG decodes for
real since round 10, 12-bit sequential/extended JPEG since round 11
(`operators/jpeg.py`); WAV now covers G.711 μ-law/A-law, IMA ADPCM,
float and 24/32-bit PCM alongside FLAC; Y4M and AVI (MJPG/DIB)
video frames decode for real in `operators/video.py`.

Formats, exactly as published:
- PPM P6 (Netpbm): ASCII header ``P6 <w> <h> <maxval>`` with
  ``#``-comments, one whitespace after maxval, then ``w·h·3`` raw RGB
  bytes (maxval ≤ 255 supported here).
- BMP (Windows V3+): 14-byte file header (``BM``, pixel-array offset at
  byte 10) + BITMAPINFOHEADER (width/height/bpp/compression at fixed
  offsets); 24 bpp, BI_RGB (uncompressed) only; rows bottom-up, BGR,
  padded to 4-byte boundaries.
- PNG (RFC 2083): 8-byte signature, then length/type/data/CRC32
  chunks; IHDR geometry, IDAT chunks concatenate into ONE zlib stream
  of ``h`` scanlines, each a filter-type byte + ``w·channels·bps``
  filtered bytes (filter types 0-4: None/Sub/Up/Average/Paeth —
  byte-oriented regardless of depth). Bit depths 8 and 16 (16-bit
  samples big-endian → uint16 output), color types 0/2/3/4/6 (palette
  via PLTE lookup after unfiltering, tRNS palette transparency
  widening to RGBA; palette is 8-bit-only per spec), both interlace
  methods (Adam7's seven passes unfilter independently and scatter
  back by origin/stride).

Failure stance: decoders RAISE naming the media id and the leading
bytes — a corrupt or unsupported container in a curation pipeline is a
data defect to surface, not a row to silently null (`contracts.py`
doctrine). Callers wanting quarantine semantics filter on
``sniff_format`` first — that is a projection, not a decode.

Features (the 8-dim vector, matching MEDIA_FEATURE_SCHEMA): per-channel
mean and std over the decoded pixels (6), luma mean (Rec.601), and
aspect ratio — all rounded to 6 dp so feature hashes reproduce across
runs, engines, and BLAS builds.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd

from .multimodal import MEDIA_FEATURE_SCHEMA, RESIZED_SCHEMA

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_format(raw: bytes) -> str | None:
    """'ppm' | 'bmp' | 'png' | 'gif' | None — magic-byte dispatch,
    no decode."""
    if raw[:2] == b"P6":
        return "ppm"
    if raw[:2] == b"BM":
        return "bmp"
    if raw[:8] == _PNG_MAGIC:
        return "png"
    if raw[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if raw[:2] == b"\xff\xd8":
        return "jpeg"
    return None


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM bytes (the inverse of
    :func:`decode_ppm`; what :func:`numpy_resize_batch` re-encodes
    with, so resized payloads stay self-describing)."""
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_ppm(raw: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Raises ValueError on any
    header/payload defect, quoting what it saw."""
    if raw[:2] != b"P6":
        raise ValueError(f"not a P6 ppm (leading bytes {raw[:2]!r})")
    # header = three ASCII fields with #-comments; exactly one
    # whitespace byte separates maxval from the pixel payload
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        if i >= len(raw):
            raise ValueError("ppm header truncated")
        c = raw[i : i + 1]
        if c == b"#":
            while i < len(raw) and raw[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(raw) and raw[j : j + 1].isdigit():
                j += 1
            fields.append(int(raw[i:j]))
            i = j
        else:
            raise ValueError(f"bad ppm header byte {c!r} at offset {i}")
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError(f"ppm maxval {maxval} > 255 unsupported")
    i += 1  # the single whitespace after maxval
    need = w * h * 3
    pixels = raw[i : i + need]
    if len(pixels) != need:
        raise ValueError(
            f"ppm payload {len(pixels)} bytes, header promises {need}"
        )
    return np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, 3)


def decode_bmp(raw: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB (rows un-flipped,
    BGR→RGB). Raises ValueError for compressed/other-depth BMPs."""
    if raw[:2] != b"BM":
        raise ValueError(f"not a bmp (leading bytes {raw[:2]!r})")
    if len(raw) < 54:
        raise ValueError("bmp header truncated")
    offset = int.from_bytes(raw[10:14], "little")
    w = int.from_bytes(raw[18:22], "little", signed=True)
    h = int.from_bytes(raw[22:26], "little", signed=True)
    bpp = int.from_bytes(raw[28:30], "little")
    compression = int.from_bytes(raw[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"bmp bpp={bpp} compression={compression}: only 24-bit "
            "BI_RGB is decodable without external codecs"
        )
    if w <= 0 or h == 0:
        raise ValueError(f"bmp dimensions {w}x{h} unsupported")
    flip = h > 0  # positive height = bottom-up rows, the common case
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    need = stride * h
    body = raw[offset : offset + need]
    if len(body) != need:
        raise ValueError(
            f"bmp pixel array {len(body)} bytes, header promises {need}"
        )
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if flip else rgb


# ---------------------------------------------------------------- png

# IHDR color type → channels per pixel IN THE SCANLINE STREAM (type 3
# palette pixels are 1-byte indices; the PLTE lookup happens after
# unfiltering, and a tRNS chunk widens the output to RGBA so
# transparency is never silently dropped)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w) or (h, w, c∈{1,2,3,4}) uint8 → depth-8 (or uint16 →
    depth-16, big-endian samples per spec) PNG bytes (non-interlaced,
    every scanline filter type 0, one IDAT). The inverse of
    :func:`decode_png` — what fixtures and round-trip tests build
    with; real encoders may pick smarter per-row filters, which
    :func:`decode_png` handles regardless."""
    px = np.asarray(pixels)
    if px.dtype == np.uint16:
        depth = 16
        px = px.astype(">u2")  # network byte order, the spec's layout
    else:
        depth = 8
        px = px.astype(np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"encode_png: {c} channels unsupported")
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([depth, color_type, 0, 0, 0])
    )
    scanlines = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + crc.to_bytes(4, "big")
        )

    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def _paeth_unfilter(row, prev, bpp, filt_type):
    """Sequential unfilter for Average (3) and Paeth (4): each byte
    depends on the byte ``bpp`` to its LEFT in the same reconstructed
    row, so the x-axis is an inherent data dependence — pure-Python
    ints here, NumPy would pay per-element dispatch for no
    vectorization. Rows stay independent of everything but ``prev``."""
    out = [0] * len(row)
    if filt_type == 3:
        for x in range(len(row)):
            a = out[x - bpp] if x >= bpp else 0
            out[x] = (row[x] + (a + prev[x]) // 2) % 256
    else:  # 4
        for x in range(len(row)):
            a = out[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out[x] = (row[x] + pr) % 256
    return out


# Adam7: pass p covers pixels (x0 + i·dx, y0 + j·dy)
_ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _adam7_pass_dims(w: int, h: int, p: int) -> tuple[int, int]:
    x0, y0, dx, dy = _ADAM7_PASSES[p]
    return max(0, -(-(w - x0) // dx)), max(0, -(-(h - y0) // dy))


def _png_unfilter(
    body: bytes, h: int, w: int, channels: int, bps: int = 1
) -> np.ndarray:
    """``h`` scanlines of (filter byte + w·channels·bps filtered
    bytes) → (h, w·channels·bps) reconstructed uint8. The spec's
    filters operate on BYTES regardless of sample depth — depth 16
    just doubles ``bps`` (bytes per sample) and therefore ``bpp``.
    None/Up/Sub vectorized (Sub is a mod-256 cumulative sum over bpp
    lanes); Average/Paeth sequential by data dependence. The unit of
    filtering — each Adam7 pass, or the whole non-interlaced image,
    resets ``prev`` here."""
    rowbytes = w * channels * bps
    scan = np.frombuffer(body, dtype=np.uint8).reshape(h, 1 + rowbytes)
    filt_types = scan[:, 0]
    rows = scan[:, 1:].astype(np.int64)
    bpp = channels * bps  # bytes per pixel
    recon = np.empty((h, rowbytes), dtype=np.uint8)
    prev = np.zeros(rowbytes, dtype=np.int64)
    for y in range(h):
        t = int(filt_types[y])
        row = rows[y]
        if t == 0:
            cur = row
        elif t == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp]
            cur = np.cumsum(row.reshape(w, bpp), axis=0).reshape(-1) % 256
        elif t == 2:  # Up: recon[x] = filt[x] + prev[x]
            cur = (row + prev) % 256
        elif t in (3, 4):
            cur = np.array(
                _paeth_unfilter(row.tolist(), prev.tolist(), bpp, t),
                dtype=np.int64,
            )
        else:
            raise ValueError(f"png filter type {t} at scanline {y}")
        recon[y] = cur
        prev = cur
    return recon


def decode_png(raw: bytes) -> np.ndarray:
    """8-bit PNG → (h, w, channels) uint8, 16-bit PNG → uint16 (channels
    1/2/3/4 for grayscale / gray+alpha / RGB(+palette) / RGBA(+palette
    with tRNS)). Pure stdlib ``zlib`` + NumPy: chunk walk with
    per-chunk CRC32 verification, one ``zlib.decompress`` over the
    concatenated IDAT stream, per-scanline unfiltering (None/Up/Sub
    vectorized — Sub is a mod-256 cumulative sum over ``bpp`` lanes;
    Average/Paeth are sequential by data dependence), then for palette
    images one PLTE lookup (tRNS widens to RGBA so transparency is
    never dropped). Adam7-interlaced images decode too (each pass is
    its own filtered sub-image, scattered back by origin/stride).
    Raises ValueError quoting exactly what it cannot honor: bad
    signature, truncated or CRC-corrupt chunks, depths other than
    8/16, 16-bit palette, missing/short PLTE, out-of-range palette indices, bad inflate,
    scanline-count mismatch, unknown filter types."""
    if raw[:8] != _PNG_MAGIC:
        raise ValueError(f"not a png (leading bytes {raw[:8]!r})")
    pos, ihdr, idat, saw_iend = 8, None, [], False
    plte, trns = None, None
    while pos + 8 <= len(raw):
        size = int.from_bytes(raw[pos : pos + 4], "big")
        ctype = raw[pos + 4 : pos + 8]
        end = pos + 12 + size
        if end > len(raw):
            raise ValueError(
                f"png {ctype!r} chunk truncated at offset {pos}"
            )
        data = raw[pos + 8 : pos + 8 + size]
        crc = int.from_bytes(raw[pos + 8 + size : end], "big")
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(
                f"png {ctype!r} chunk crc mismatch at offset {pos}"
            )
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IEND":
            saw_iend = True
            break
        pos = end
    if not saw_iend:  # the spec-mandated terminator: absent = truncated
        raise ValueError("png truncated: no IEND chunk")
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("png missing or malformed IHDR chunk")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color_type, compression, filter_method, interlace = ihdr[8:13]
    if interlace not in (0, 1):
        raise ValueError(f"png interlace method {interlace} unknown")
    if depth not in (8, 16):
        raise ValueError(
            f"png bit depth {depth} unsupported (8 and 16 only)"
        )
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None:
        raise ValueError(f"png color type {color_type} does not exist")
    if color_type == 3:
        if depth == 16:
            # the spec caps palette indices at 8 bits
            raise ValueError("png palette images cannot be 16-bit")
        if plte is None or len(plte) % 3 or not plte:
            raise ValueError(
                "png palette image without a well-formed PLTE chunk"
            )
    elif trns is not None:
        # tRNS for gray (type 0) / RGB (type 2) names ONE fully
        # transparent color, stored as 2-byte big-endian samples
        # regardless of depth (spec §11.3.2); alpha types 4/6 must
        # not carry it
        if color_type not in (0, 2):
            raise ValueError(
                f"png tRNS with color type {color_type} is invalid "
                "(alpha channel already present)"
            )
        if len(trns) != 2 * channels:
            raise ValueError(
                f"png tRNS for color type {color_type} must be "
                f"{2 * channels} bytes, got {len(trns)}"
            )
    if compression != 0 or filter_method != 0:
        raise ValueError(
            f"png compression={compression} filter_method="
            f"{filter_method}: only 0/0 exist in the spec"
        )
    if w < 1 or h < 1:
        raise ValueError(f"png dimensions {w}x{h} invalid")
    if not idat:
        raise ValueError("png has no IDAT chunk")
    try:
        body = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"png idat inflate failed: {e}") from e
    bps = depth // 8  # bytes per sample; filters are byte-oriented
    if interlace == 0:
        rowbytes = w * channels * bps
        if len(body) != h * (1 + rowbytes):
            raise ValueError(
                f"png scanlines {len(body)} bytes, header promises "
                f"{h * (1 + rowbytes)}"
            )
        out = _png_unfilter(body, h, w, channels, bps).reshape(
            h, w, channels * bps
        )
    else:  # Adam7: seven independently-filtered sub-images, scattered
        # back onto the full grid by each pass's origin and stride
        need = sum(
            ph * (1 + pw * channels * bps)
            for pw, ph in (_adam7_pass_dims(w, h, p) for p in range(7))
            if pw and ph
        )
        if len(body) != need:
            raise ValueError(
                f"png interlaced scanlines {len(body)} bytes, header "
                f"promises {need}"
            )
        out = np.empty((h, w, channels * bps), dtype=np.uint8)
        pos = 0
        for p, (x0, y0, dx, dy) in enumerate(_ADAM7_PASSES):
            pw, ph = _adam7_pass_dims(w, h, p)
            if not pw or not ph:
                continue
            size = ph * (1 + pw * channels * bps)
            sub = _png_unfilter(
                body[pos : pos + size], ph, pw, channels, bps
            ).reshape(ph, pw, channels * bps)
            pos += size
            out[y0::dy, x0::dx] = sub
    if bps == 2:
        # big-endian sample pairs → uint16 (depth 16 excludes palette)
        pairs = out.reshape(h, w, channels, 2).astype(np.uint16)
        img16 = (pairs[..., 0] << 8) | pairs[..., 1]
        if trns is not None:
            return _png_color_key_alpha(img16, trns, channels)
        return img16
    if color_type == 3:  # palette lookup AFTER unfiltering (the spec's
        # filters run over index bytes, not colors)
        n_entries = len(plte) // 3
        idx = out[:, :, 0]
        if int(idx.max(initial=0)) >= n_entries:
            raise ValueError(
                f"png palette index {int(idx.max())} out of range "
                f"(PLTE has {n_entries} entries)"
            )
        lut = np.frombuffer(plte, dtype=np.uint8).reshape(n_entries, 3)
        rgb = lut[idx]
        if trns is None:
            return rgb
        if len(trns) > n_entries:
            raise ValueError(
                f"png tRNS has {len(trns)} entries, PLTE only "
                f"{n_entries}"
            )
        alpha = np.full(n_entries, 255, dtype=np.uint8)
        alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
        return np.dstack([rgb, alpha[idx]])
    if trns is not None:  # color-key transparency, gray/RGB at depth 8
        return _png_color_key_alpha(out, trns, channels)
    return out


def _png_color_key_alpha(
    img: np.ndarray, trns: bytes, channels: int
) -> np.ndarray:
    """Widen a gray/RGB image with the tRNS color key: pixels equal to
    the named color (2-byte big-endian samples in the chunk, spec
    §11.3.2) get alpha 0, everything else full opacity — transparency
    is never silently dropped (the palette path's doctrine)."""
    key = np.array(
        [
            int.from_bytes(trns[2 * i : 2 * i + 2], "big")
            for i in range(channels)
        ],
        dtype=np.int64,
    )
    # compare in int64: a depth-8 image can never equal a key > 255,
    # and the comparison must not wrap
    match = np.all(
        img.astype(np.int64) == key.reshape(1, 1, channels), axis=2
    )
    opaque = np.iinfo(img.dtype).max
    alpha = np.where(match, 0, opaque).astype(img.dtype)
    return np.dstack([img, alpha])


# ---------------------------------------------------------------- gif
# GIF87a/89a: the other compressed container stdlib can honestly carry
# — its only compression is LZW, a few dozen lines of table-building,
# no entropy-coding tables to ship. This is the module's one REAL
# multi-frame decoder, so `sample_frames`' 1→N shape gets a non-fake
# implementation (numpy_gif_frame_sampler below).

_GIF_MAX_CODE = 4096


def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """GIF-variant LZW → index bytes. Variable-width codes packed
    LSB-first; width grows when the table reaches 2**width (and caps
    at 12 bits / 4096 entries until a clear code). Raises on codes
    beyond the table (corrupt stream) and on streams that end before
    yielding ``n_pixels`` indices."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"gif lzw min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev = None
    bitpos, total_bits = 0, len(data) * 8
    while len(out) < n_pixels:
        if bitpos + width > total_bits:
            raise ValueError(
                f"gif lzw stream ended at {len(out)}/{n_pixels} pixels"
            )
        i = bitpos // 8
        code = (
            int.from_bytes(data[i : i + 3], "little") >> (bitpos % 8)
        ) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            raise ValueError(
                f"gif lzw end code at {len(out)}/{n_pixels} pixels"
            )
        if prev is None:  # first code after a clear must be a literal
            if code >= clear:
                raise ValueError(f"gif lzw first code {code} not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
        else:
            raise ValueError(
                f"gif lzw code {code} beyond table size {len(table)}"
            )
        out += entry
        if prev is not None and len(table) < _GIF_MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_pixels])


def _gif_subblocks(raw: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate size-prefixed data sub-blocks from ``pos`` through
    the 0-size terminator; returns (data, position after terminator)."""
    parts = []
    while True:
        if pos >= len(raw):
            raise ValueError("gif sub-blocks truncated")
        size = raw[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        if pos + size > len(raw):
            raise ValueError("gif sub-block payload truncated")
        parts.append(raw[pos : pos + size])
        pos += size


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(raw: bytes) -> tuple[list[np.ndarray], list[int]]:
    """GIF87a/89a → (frames, delays): COMPOSITED full-canvas RGBA
    frames (what a frame sampler actually wants — per-frame rects,
    transparency, and disposal methods 0-3 are applied, not returned
    raw) plus each frame's delay in centiseconds. Pure stdlib + NumPy:
    header/LSD parse, global+local color tables, graphic control
    extensions, Adam-style 4-pass interlace row reorder, and the LZW
    decode above. Raises ValueError naming any defect: bad signature,
    truncated blocks, a frame rect outside the canvas, missing color
    table, corrupt LZW, unknown block introducers, a file with no
    image data, or a missing trailer."""
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a gif (leading bytes {raw[:6]!r})")
    if len(raw) < 13:
        raise ValueError("gif logical screen descriptor truncated")
    w = int.from_bytes(raw[6:8], "little")
    h = int.from_bytes(raw[8:10], "little")
    packed = raw[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = raw[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("gif global color table truncated")
        pos += 3 * n
    if w < 1 or h < 1:
        raise ValueError(f"gif dimensions {w}x{h} invalid")
    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic-control state for the NEXT image block
    transparent, delay_cs, disposal = None, 0, 0
    saw_trailer = False
    while pos < len(raw):
        introducer = raw[pos]
        if introducer == 0x3B:  # trailer
            saw_trailer = True
            break
        if introducer == 0x21:  # extension
            if pos + 2 > len(raw):
                raise ValueError("gif extension truncated")
            label = raw[pos + 1]
            body, pos = _gif_subblocks(raw, pos + 2)
            if label == 0xF9:  # graphic control
                if len(body) < 4:
                    raise ValueError("gif graphic control truncated")
                transparent = body[3] if body[0] & 0x01 else None
                delay_cs = int.from_bytes(body[1:3], "little")
                disposal = (body[0] >> 2) & 0x07
            continue
        if introducer != 0x2C:
            raise ValueError(
                f"gif unknown block introducer 0x{introducer:02x} "
                f"at offset {pos}"
            )
        if pos + 10 > len(raw):
            raise ValueError("gif image descriptor truncated")
        left = int.from_bytes(raw[pos + 1 : pos + 3], "little")
        top = int.from_bytes(raw[pos + 3 : pos + 5], "little")
        fw = int.from_bytes(raw[pos + 5 : pos + 7], "little")
        fh = int.from_bytes(raw[pos + 7 : pos + 9], "little")
        ipacked = raw[pos + 9]
        pos += 10
        if left + fw > w or top + fh > h or fw < 1 or fh < 1:
            raise ValueError(
                f"gif frame rect {fw}x{fh}@({left},{top}) outside "
                f"{w}x{h} canvas"
            )
        pal = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            pal = raw[pos : pos + 3 * n]
            if len(pal) != 3 * n:
                raise ValueError("gif local color table truncated")
            pos += 3 * n
        if pal is None:
            raise ValueError("gif frame has neither local nor global "
                             "color table")
        if pos >= len(raw):
            raise ValueError("gif image data truncated")
        min_code = raw[pos]
        data, pos = _gif_subblocks(raw, pos + 1)
        idx = np.frombuffer(
            _gif_lzw_decode(min_code, data, fw * fh), dtype=np.uint8
        ).reshape(fh, fw)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            order = np.concatenate(
                [np.arange(start, fh, step)
                 for start, step in _GIF_INTERLACE_PASSES]
            )
            deinter = np.empty_like(idx)
            deinter[order] = idx
            idx = deinter
        n_pal = len(pal) // 3
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError(
                f"gif pixel index {int(idx.max())} out of range "
                f"(palette has {n_pal} entries)"
            )
        lut = np.frombuffer(pal, dtype=np.uint8).reshape(n_pal, 3)
        rect = canvas[top : top + fh, left : left + fw]
        saved = rect.copy() if disposal == 3 else None
        mask = (
            np.ones((fh, fw), dtype=bool)
            if transparent is None
            else idx != transparent
        )
        rect[mask, :3] = lut[idx][mask]
        rect[mask, 3] = 255
        frames.append(canvas.copy())
        delays.append(delay_cs)
        if disposal == 2:  # restore to background = clear the rect
            rect[:] = 0
        elif disposal == 3 and saved is not None:
            rect[:] = saved
        transparent, delay_cs, disposal = None, 0, 0
    if not saw_trailer:
        raise ValueError("gif truncated: no trailer byte")
    if not frames:
        raise ValueError("gif has no image data")
    return frames, delays


def encode_gif(
    frames, delays_cs: int | list[int] = 0, transparent: int | None = None
) -> bytes:
    """Uint8 index frames (each (h, w), full-canvas) + one shared
    256-entry-max RGB palette inferred from the GLOBAL max index →
    GIF89a bytes. The LZW stream uses the valid-but-naive clear-before
    -every-code form (no dictionary growth), so this is a fixture
    builder and inverse for round-trip tests — real encoders compress
    properly, which :func:`decode_gif` handles regardless (the tests
    pin it against an independent real compressor). ``palette`` is
    synthesized as (i, 2i, 3i) mod 256 per entry — deterministic and
    collision-free for testing."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape
    if isinstance(delays_cs, int):
        delays_cs = [delays_cs] * len(frames)
    n_pal = 1 << max(2, int(max(int(f.max()) for f in frames)).bit_length())
    pal = bytes(
        b for i in range(n_pal) for b in (i % 256, (2 * i) % 256, (3 * i) % 256)
    )
    gct_bits = n_pal.bit_length() - 2  # 2^(bits+1) = n_pal
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | gct_bits, 0, 0]) + pal
    min_code = max(2, n_pal.bit_length() - 1)
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    for f, d in zip(frames, delays_cs):
        if f.shape != (h, w):
            raise ValueError("encode_gif: frames must share the canvas")
        tflag = 0 if transparent is None else 1
        out += bytes([0x21, 0xF9, 4, (tflag), d & 0xFF, d >> 8,
                      transparent or 0, 0])
        out += bytes([0x2C]) + b"\x00\x00\x00\x00"
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0, min_code])
        codes: list[int] = []
        for v in f.reshape(-1).tolist():
            codes += [clear, v]
        codes.append(end)
        bits = bytearray()
        acc, nbits = 0, 0
        for c in codes:
            acc |= c << nbits
            nbits += width
            while nbits >= 8:
                bits.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            bits.append(acc & 0xFF)
        for i in range(0, len(bits), 255):
            chunk = bits[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def to_rgb(px: np.ndarray) -> np.ndarray:
    """Normalize any decoded pixel array to (h, w, 3) RGB: grayscale
    replicates, alpha is DROPPED (a channel-projection policy, stated
    here once — compositing against a background is an upstream
    transform, not a decode concern)."""
    if px.ndim == 2:
        px = px[:, :, None]
    c = px.shape[2]
    if c == 3:
        return px
    if c == 4:
        return px[:, :, :3]
    if c == 1:
        return np.repeat(px, 3, axis=2)
    if c == 2:
        return np.repeat(px[:, :, :1], 3, axis=2)
    raise ValueError(f"pixel array with {c} channels unsupported")


def _decode(raw: bytes):
    kind = sniff_format(raw)
    if kind == "ppm":
        return decode_ppm(raw)
    if kind == "bmp":
        return decode_bmp(raw)
    if kind == "png":
        return decode_png(raw)
    if kind == "gif":  # still-image view: the first composited frame
        return decode_gif(raw)[0][0]
    if kind == "jpeg":
        from .jpeg import decode_jpeg

        return decode_jpeg(raw)
    raise ValueError(
        f"undecodable container (leading bytes {raw[:8]!r}): this "
        "environment decodes ppm/bmp/png/gif/jpeg (baseline, "
        "progressive, 12-bit extended sequential) only - inject a "
        "PIL/ffmpeg decoder for other formats"
    )


def numpy_image_decoder(batch: pd.DataFrame) -> pd.DataFrame:
    """A REAL `multimodal.BatchDecoder`: decode ppm/bmp/png bytes and
    emit MEDIA_FEATURE_SCHEMA rows (per-channel mean/std, luma, aspect
    — module docstring). Features are computed in RGB via
    :func:`to_rgb` (grayscale replicates, alpha dropped) so the same
    image reads identically across containers. Raises on the first
    undecodable row, naming it."""
    out = []
    for media_id, media in zip(batch["media_id"], batch["media"]):
        raw = bytes(media) if media is not None else b""
        try:
            n_frames = 1
            kind = sniff_format(raw)
            if kind == "gif":  # features from frame 0,
                # but report the REAL frame count (1→N metadata)
                frames, _delays = decode_gif(raw)
                n_frames = len(frames)
                px = to_rgb(frames[0])
            else:
                px = to_rgb(_decode(raw))
        except ValueError as e:
            raise ValueError(f"media_id={media_id}: {e}") from e
        h, w = px.shape[:2]
        # normalize by the CONTAINER's sample range so an image reads
        # the same features at every precision: 12-bit JPEG decodes
        # to uint16 0..4095, 16-bit PNG to uint16 0..65535, everything
        # else 8-bit — the dtype alone cannot distinguish the first
        # two, the container can
        if px.dtype == np.uint16:
            full = 4095.0 if kind == "jpeg" else 65535.0
        else:
            full = 255.0
        f = px.reshape(-1, 3).astype(np.float64) / full
        means, stds = f.mean(axis=0), f.std(axis=0)
        luma = 0.299 * means[0] + 0.587 * means[1] + 0.114 * means[2]
        feature = [
            *(float(m) for m in means),
            *(float(s) for s in stds),
            float(luma),
            float(w) / float(h),
        ]
        out.append(
            {
                "media_id": media_id,
                "n_bytes": len(raw),
                "content_hash": hashlib.md5(raw).hexdigest(),
                "width": int(w),
                "height": int(h),
                "n_frames": int(n_frames),
                "feature": [round(x, 6) for x in feature],
            }
        )
    return pd.DataFrame(
        out, columns=[f.name for f in MEDIA_FEATURE_SCHEMA.fields]
    )


def numpy_resize_batch(
    batch: pd.DataFrame, width: int, height: int
) -> pd.DataFrame:
    """A REAL `multimodal` resizer: nearest-neighbor resample (pure
    index arithmetic — deterministic, no interpolation-kernel variance
    across BLAS builds) re-encoded as PPM, so the resized payload is
    itself decodable by this module. Inputs are normalized to RGB via
    :func:`to_rgb` first (PPM is RGB-only). RESIZED_SCHEMA rows."""
    out = []
    for media_id, media in zip(batch["media_id"], batch["media"]):
        raw = bytes(media) if media is not None else b""
        try:
            px = to_rgb(_decode(raw))
        except ValueError as e:
            raise ValueError(f"media_id={media_id}: {e}") from e
        h, w = px.shape[:2]
        # nearest-neighbor: pixel centers mapped back to source grid
        ys = np.minimum(
            ((np.arange(height) + 0.5) * h / height).astype(np.int64),
            h - 1,
        )
        xs = np.minimum(
            ((np.arange(width) + 0.5) * w / width).astype(np.int64),
            w - 1,
        )
        resized = px[ys][:, xs]
        out.append(
            {
                "media_id": media_id,
                "width": int(width),
                "height": int(height),
                "resized": encode_ppm(resized),
            }
        )
    return pd.DataFrame(
        out, columns=[f.name for f in RESIZED_SCHEMA.fields]
    )


def numpy_gif_frame_sampler(
    batch: pd.DataFrame, max_frames: int
) -> pd.DataFrame:
    """A REAL `multimodal.sample_frames` frame sampler: decode each
    GIF's composited frames and emit FRAME_SCHEMA rows at a uniform
    stride so at most ``max_frames`` frames emit per media row;
    ``frame_hash`` = md5 of the composited RGBA canvas bytes (frame
    identity that survives re-encoding the container). Raises naming
    the media id on undecodable bytes."""
    import hashlib as _hl

    out = []
    for media_id, media in zip(batch["media_id"], batch["media"]):
        raw = bytes(media) if media is not None else b""
        try:
            frames, _delays = decode_gif(raw)
        except ValueError as e:
            raise ValueError(f"media_id={media_id}: {e}") from e
        n_frames = len(frames)
        stride = max(1, -(-n_frames // max_frames))  # ceil division
        for idx in range(0, n_frames, stride):
            out.append(
                {
                    "media_id": media_id,
                    "frame_index": idx,
                    "n_frames": n_frames,
                    "frame_hash": _hl.md5(
                        frames[idx].tobytes()
                    ).hexdigest(),
                }
            )
    from .multimodal import FRAME_SCHEMA

    return pd.DataFrame(
        out, columns=[f.name for f in FRAME_SCHEMA.fields]
    )


IMAGE_QUALITY_SCHEMA_DDL = (
    "media_id long, width int, height int, brightness double, "
    "contrast double, saturation double, sharpness double, "
    "extreme_frac double"
)


def image_quality_stats(
    df, id_col: str = "media_id", media_col: str = "media"
):
    """Per-image quality signals for multimodal CURATION — the image
    twin of the text quality heuristics (`operators/curation.py`'s
    length/punct gates): decode via the real codecs above, emit one
    row per image, and let policy be a plain downstream FILTER
    (blank/blurry/washed-out images are dropped by thresholding these
    columns, never inside the decoder). Signals, all on [0,1]-ish
    scales, 6 dp:

    - brightness: mean luma / 255.
    - contrast: luma std / 255 (near-0 = blank or single-color).
    - saturation: mean (max-min)/max over RGB channels (0 = grayscale
      content regardless of container).
    - sharpness: variance of the 4-neighbor Laplacian of luma,
      normalized by 255² — the classic blur detector (near-0 = blurry
      or flat).
    - extreme_frac: fraction of pixels with luma ≤ 2 or ≥ 253 —
      over/under-exposure and letterboxing mass.

    Same slim-projection ``mapInPandas`` plumbing as every decoder
    stage; raises naming the media id on undecodable bytes."""
    from pyspark.sql import functions as F

    def _stats(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for media_id, media in zip(batch["media_id"], batch["media"]):
            raw = bytes(media) if media is not None else b""
            try:
                px = to_rgb(_decode(raw)).astype(np.float64)
            except ValueError as e:
                raise ValueError(f"media_id={media_id}: {e}") from e
            h, w = px.shape[:2]
            luma = (
                0.299 * px[:, :, 0]
                + 0.587 * px[:, :, 1]
                + 0.114 * px[:, :, 2]
            )
            mx = px.max(axis=2)
            mn = px.min(axis=2)
            sat = float(np.where(mx > 0, (mx - mn) / np.maximum(mx, 1), 0).mean())
            if h >= 3 and w >= 3:
                lap = (
                    4 * luma[1:-1, 1:-1]
                    - luma[:-2, 1:-1]
                    - luma[2:, 1:-1]
                    - luma[1:-1, :-2]
                    - luma[1:-1, 2:]
                )
                sharp = float(lap.var()) / (255.0**2)
            else:
                sharp = 0.0
            out.append(
                {
                    "media_id": media_id,
                    "width": int(w),
                    "height": int(h),
                    "brightness": round(float(luma.mean()) / 255.0, 6),
                    "contrast": round(float(luma.std()) / 255.0, 6),
                    "saturation": round(sat, 6),
                    "sharpness": round(sharp, 6),
                    "extreme_frac": round(
                        float(((luma <= 2) | (luma >= 253)).mean()), 6
                    ),
                }
            )
        return pd.DataFrame(
            out,
            columns=[
                "media_id", "width", "height", "brightness",
                "contrast", "saturation", "sharpness", "extreme_frac",
            ],
        )

    slim = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(media_col).alias("media"),
    )

    def run(batches):
        for batch in batches:
            if len(batch):
                yield _stats(batch)

    return slim.mapInPandas(run, IMAGE_QUALITY_SCHEMA_DDL)


# ---------------------------------------------------------------- mp4
# ISO-BMFF (MP4/MOV) box-structure parsing: the CONTAINER is plain
# big-endian struct walking — no codec needed to read duration,
# dimensions, and per-track codec identity, which is what a corpus
# triage stage actually filters on (decode of the frames themselves
# stays injection-only; H.264/H.265 entropy decode genuinely needs
# external codecs).

VIDEO_META_SCHEMA_DDL = (
    "media_id long, n_bytes long, content_hash string, "
    "major_brand string, duration_s double, n_tracks int, "
    "width int, height int, codecs array<string>"
)


def _mp4_boxes(raw: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for the boxes in
    raw[start:end]; handles 64-bit largesize boxes."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(raw[pos : pos + 4], "big")
        btype = raw[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("mp4 largesize box truncated")
            size = int.from_bytes(raw[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:  # box extends to the end of the enclosure
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(
                f"mp4 box {btype!r} size {size} overruns its container"
            )
        yield btype, body, pos + size
        pos += size


def probe_mp4(raw: bytes) -> dict:
    """MP4/MOV container metadata WITHOUT decoding any frames:
    {major_brand, duration_s, n_tracks, width, height, codecs}.
    Dimensions come from the first video track's tkhd (16.16 fixed
    point); codecs are the sample-entry fourccs (avc1/hev1/mp4a/…).
    Raises ValueError on non-BMFF bytes or malformed box sizes."""
    ftyp = None
    for btype, b0, _b1 in _mp4_boxes(raw, 0, len(raw)):
        if btype == b"ftyp":
            ftyp = raw[b0 : b0 + 4].decode("latin1")
        break
    if ftyp is None:
        raise ValueError(
            f"not an mp4 (first box {raw[4:8]!r}, expected ftyp)"
        )
    duration_s, n_tracks, width, height = None, 0, None, None
    codecs: list[str] = []

    def walk(start: int, end: int, path: tuple) -> None:
        nonlocal duration_s, n_tracks, width, height
        for btype, b0, b1 in _mp4_boxes(raw, start, end):
            t = btype.decode("latin1", "replace")
            if t == "moov":
                walk(b0, b1, path + (t,))
            elif t == "mvhd" and path == ("moov",):
                version = raw[b0]
                if version == 1:
                    scale = int.from_bytes(raw[b0 + 20 : b0 + 24], "big")
                    dur = int.from_bytes(raw[b0 + 24 : b0 + 32], "big")
                else:
                    scale = int.from_bytes(raw[b0 + 12 : b0 + 16], "big")
                    dur = int.from_bytes(raw[b0 + 16 : b0 + 20], "big")
                if scale:
                    duration_s = round(dur / scale, 6)
            elif t == "trak" and path == ("moov",):
                n_tracks += 1
                walk(b0, b1, path + (t,))
            elif t == "tkhd" and path == ("moov", "trak"):
                version = raw[b0]
                off = b0 + (96 if version == 1 else 84)
                tw = int.from_bytes(raw[off - 8 : off - 4], "big") >> 16
                th = int.from_bytes(raw[off - 4 : off], "big") >> 16
                if tw and th and width is None:
                    width, height = tw, th
            elif t in ("mdia", "minf", "stbl") and path and path[-1] in (
                "trak", "mdia", "minf",
            ):
                walk(b0, b1, path + (t,))
            elif t == "stsd" and path and path[-1] == "stbl":
                n_entries = int.from_bytes(raw[b0 + 4 : b0 + 8], "big")
                pos = b0 + 8
                for _ in range(n_entries):
                    if pos + 8 > b1:
                        break
                    esize = int.from_bytes(raw[pos : pos + 4], "big")
                    codecs.append(
                        raw[pos + 4 : pos + 8].decode("latin1", "replace")
                    )
                    pos += max(esize, 8)

    walk(0, len(raw), ())
    return {
        "major_brand": ftyp,
        "duration_s": duration_s,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "codecs": codecs,
    }


def extract_video_metadata(
    df, id_col: str = "media_id", media_col: str = "media"
):
    """Distributed video metadata triage — the video twin of
    `extract_audio_features`: same slim-projection ``mapInPandas``
    plumbing, VIDEO_META_SCHEMA_DDL rows, raises naming the media id
    on unrecognized bytes. Container-dispatched (MP4 boxes, AVI
    headers, Y4M stream scan — `operators/video.py probe_video`);
    frame PIXELS are never touched here — this is the filter stage
    before any codec-backed work (y4m/avi frames then decode for
    real via `video.decode_video_frames`)."""
    from pyspark.sql import functions as F

    from .video import probe_video

    slim = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(media_col).alias("media"),
    )

    def run(batches):
        for batch in batches:
            if not len(batch):
                continue
            out = []
            for media_id, media in zip(batch["media_id"], batch["media"]):
                raw = bytes(media) if media is not None else b""
                try:
                    meta = probe_video(raw)
                except ValueError as e:
                    raise ValueError(f"media_id={media_id}: {e}") from e
                out.append(
                    {
                        "media_id": media_id,
                        "n_bytes": len(raw),
                        "content_hash": hashlib.md5(raw).hexdigest(),
                        **meta,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_bytes", "content_hash",
                    "major_brand", "duration_s", "n_tracks",
                    "width", "height", "codecs",
                ],
            )

    return slim.mapInPandas(run, VIDEO_META_SCHEMA_DDL)


# --------------------------------------------------------------- audio

AUDIO_FEATURE_SCHEMA_DDL = (
    "media_id long, n_bytes long, content_hash string, "
    "sample_rate int, n_channels int, n_samples long, "
    "duration_s double, feature array<float>"
)


# G.711 companded byte → linear LUTs, built once from the spec
# formulas (the published decode tables are exactly these expansions).
_ULAW_LUT = None
_ALAW_LUT = None


def _g711_luts():
    global _ULAW_LUT, _ALAW_LUT
    if _ULAW_LUT is not None:
        return _ULAW_LUT, _ALAW_LUT
    b = np.arange(256, dtype=np.int32)
    # μ-law (G.711 §4.2): complement, then BIAS-shifted exponent expand
    u = ~b & 0xFF
    mag = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    _ULAW_LUT = np.where(u & 0x80, 0x84 - mag, mag - 0x84).astype(
        np.float64
    ) / 32768.0
    # A-law (G.711 §4.1): XOR 0x55, segment 0 is linear, sign bit SET
    # means positive (the opposite convention from μ-law)
    a = b ^ 0x55
    seg = (a >> 4) & 0x07
    t = ((a & 0x0F) << 4) + np.where(seg == 0, 8, 0x108)
    mag = t << np.maximum(seg - 1, 0)
    _ALAW_LUT = np.where(a & 0x80, mag, -mag).astype(np.float64) / 32768.0
    return _ULAW_LUT, _ALAW_LUT


# IMA/DVI ADPCM tables (IMA ADPCM reference algorithm): 89-entry step
# sizes and the per-nibble step-index adjustment (sign bit irrelevant).
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)
_IMA_INDEX_ADJ = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)


def _decode_ima_adpcm(
    data: bytes,
    channels: int,
    block_align: int,
    samples_per_block: int,
    fact_samples: int | None,
) -> np.ndarray:
    """IMA ADPCM (WAVE format tag 0x11) → (n, channels) int32 PCM.
    Block layout per the IMA WAV mapping: each ``block_align`` block
    carries a 4-byte header per channel (int16 predictor = sample 0,
    uint8 step index, reserved), then 4-byte-per-channel interleaved
    groups of 8 low-nibble-first 4-bit codes. The nibble recurrence
    is sequential WITHIN a block, so the loop runs over the ≤~500
    in-block sample positions while every block (and channel) decodes
    in one vectorized lane — the axis that grows with data size."""
    if block_align < 4 * channels + 4 * channels:
        raise ValueError(
            f"ima adpcm block_align={block_align} cannot hold "
            f"{channels}-channel headers + one sample group"
        )
    n_blocks = len(data) // block_align
    if n_blocks == 0:
        raise ValueError(
            f"ima adpcm data ({len(data)} bytes) shorter than one "
            f"block (block_align={block_align})"
        )
    blocks = np.frombuffer(
        data[: n_blocks * block_align], dtype=np.uint8
    ).reshape(n_blocks, block_align)
    hdr = blocks[:, : 4 * channels].reshape(n_blocks, channels, 4)
    pred = (
        (hdr[:, :, 0].astype(np.int32) | (hdr[:, :, 1].astype(np.int32) << 8))
        .astype(np.uint16)
        .astype(np.int16)
        .astype(np.int32)
    )
    index = np.clip(hdr[:, :, 2].astype(np.int32), 0, 88)
    body = blocks[:, 4 * channels :]
    n_groups = body.shape[1] // (4 * channels)
    body = body[:, : n_groups * 4 * channels].reshape(
        n_blocks, n_groups, channels, 4
    )
    nib = np.empty((n_blocks, n_groups, channels, 8), dtype=np.uint8)
    nib[..., 0::2] = body & 0x0F
    nib[..., 1::2] = body >> 4
    nib = nib.transpose(0, 2, 1, 3).reshape(
        n_blocks, channels, n_groups * 8
    )
    capacity = 1 + n_groups * 8
    out = np.empty((n_blocks, channels, capacity), dtype=np.int32)
    out[:, :, 0] = pred
    for t in range(n_groups * 8):
        n = nib[:, :, t].astype(np.int32)
        step = _IMA_STEPS[index]
        diff = (
            (step >> 3)
            + np.where(n & 1, step >> 2, 0)
            + np.where(n & 2, step >> 1, 0)
            + np.where(n & 4, step, 0)
        )
        pred = np.clip(
            pred + np.where(n & 8, -diff, diff), -32768, 32767
        )
        index = np.clip(index + _IMA_INDEX_ADJ[n & 7], 0, 88)
        out[:, :, t + 1] = pred
    if 0 < samples_per_block < capacity:
        out = out[:, :, :samples_per_block]
    samples = out.transpose(0, 2, 1).reshape(-1, channels)
    if fact_samples is not None and 0 < fact_samples <= samples.shape[0]:
        samples = samples[:fact_samples]
    return samples


# the fixed 14-byte tail every WAVE_FORMAT_EXTENSIBLE SubFormat GUID
# shares (KSDATAFORMAT_SUBTYPE_*): the leading 2 bytes are the tag
_WAVE_EXT_GUID_TAIL = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


def decode_wav(raw: bytes):
    """RIFF/WAVE → (sample_rate, (n_samples, n_channels) float64 in
    [-1, 1]). Chunk-walks the container properly (fmt /data may be
    preceded by LIST/fact chunks). Decodes, pure NumPy:

    - tag 1 integer PCM at 8 (unsigned), 16, 24, 32 bits;
    - tag 3 IEEE float at 32/64 bits (clipped to [-1, 1] — float WAV
      may legally overshoot);
    - tag 6/7 G.711 A-law/μ-law (LUT expansion per the spec formulas);
    - tag 0x11 IMA/DVI ADPCM (block-vectorized, see
      :func:`_decode_ima_adpcm`), honoring the fact chunk's sample
      count and the fmt extension's wSamplesPerBlock;
    - tag 0xFFFE WAVE_FORMAT_EXTENSIBLE, unwrapped to its SubFormat
      tag (GUID tail validated).

    Raises ValueError naming anything else (MP3-in-WAV and other
    codec tags need external decoders, not this module)."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError(f"not a riff/wave (leading bytes {raw[:4]!r})")
    pos, fmt, data, fact = 12, None, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = int.from_bytes(raw[pos + 4 : pos + 8], "little")
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            fact = int.from_bytes(body[:4], "little")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("wave missing fmt /data chunk")
    tag = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    block_align = int.from_bytes(fmt[12:14], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if channels < 1 or rate < 1:
        raise ValueError(f"wave channels={channels} rate={rate} invalid")
    if tag == 0xFFFE:
        if len(fmt) < 40:
            raise ValueError("wave extensible fmt chunk truncated")
        if fmt[26:40] != _WAVE_EXT_GUID_TAIL:
            raise ValueError(
                f"wave extensible SubFormat GUID {fmt[24:40].hex()} "
                "is not a KSDATAFORMAT subtype"
            )
        tag = int.from_bytes(fmt[24:26], "little")
    if tag == 0x11:  # IMA ADPCM: bits is 4 (the code width), not PCM
        spb = (
            int.from_bytes(fmt[18:20], "little") if len(fmt) >= 20 else 0
        )
        samples = _decode_ima_adpcm(
            data, channels, block_align, spb, fact
        ).astype(np.float64) / 32768.0
        return rate, samples
    if tag in (6, 7):
        if bits != 8:
            raise ValueError(f"wave g711 tag={tag} bits={bits}: want 8")
        ulaw, alaw = _g711_luts()
        lut = ulaw if tag == 7 else alaw
        n = len(data) // channels
        codes = np.frombuffer(data[: n * channels], dtype=np.uint8)
        return rate, lut[codes].reshape(n, channels)
    if tag == 3:
        if bits not in (32, 64):
            raise ValueError(f"wave float bits={bits}: want 32/64")
        dtype = "<f4" if bits == 32 else "<f8"
        width = bits // 8
        n = len(data) // (width * channels)
        samples = np.frombuffer(
            data[: n * width * channels], dtype=dtype
        ).astype(np.float64)
        return rate, np.clip(samples, -1.0, 1.0).reshape(n, channels)
    if tag != 1 or bits not in (8, 16, 24, 32):
        raise ValueError(
            f"wave format tag={tag} bits={bits}: only PCM "
            "8/16/24/32-bit, float, G.711, and IMA ADPCM decode "
            "without external codecs"
        )
    width = bits // 8
    n = len(data) // (width * channels)
    data = data[: n * width * channels]
    if bits == 16:
        samples = (
            np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        )
    elif bits == 32:
        samples = (
            np.frombuffer(data, dtype="<i4").astype(np.float64)
            / 2147483648.0
        )
    elif bits == 24:
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(
            np.int32
        )
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v -= (v & 0x800000) << 1  # sign-extend bit 23
        samples = v.astype(np.float64) / 8388608.0
    else:  # 8-bit wav is UNSIGNED, midpoint 128
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    return rate, samples.reshape(n, channels)


def _decode_audio(raw: bytes):
    """Container dispatch for audio: RIFF/WAVE PCM or FLAC
    (`operators/flac.py` — exact lossless reconstruction), both
    normalized to (rate, (n, channels) float64 in [-1, 1]) so every
    downstream audio operator is container-agnostic."""
    if raw[:4] == b"fLaC":
        from .flac import decode_flac

        return decode_flac(raw)
    return decode_wav(raw)


def numpy_audio_decoder(batch: pd.DataFrame) -> pd.DataFrame:
    """Real WAV decode → AUDIO_FEATURE_SCHEMA_DDL rows. Features
    (8-dim, 6-dp rounded): rms, peak, mean zero-crossing rate, and DC
    offset, each channel-averaged, then duration, channel count,
    sample rate (kHz), and a silence fraction (|x| < 1e-3)."""
    out = []
    for media_id, media in zip(batch["media_id"], batch["media"]):
        raw = bytes(media) if media is not None else b""
        try:
            rate, x = _decode_audio(raw)
        except ValueError as e:
            raise ValueError(f"media_id={media_id}: {e}") from e
        n = x.shape[0]
        if n == 0:
            raise ValueError(f"media_id={media_id}: wave has no samples")
        rms = float(np.sqrt((x**2).mean()))
        peak = float(np.abs(x).max())
        zcr = float(
            (np.sign(x[1:]) != np.sign(x[:-1])).mean()
        ) if n > 1 else 0.0
        dc = float(x.mean())
        silence = float((np.abs(x) < 1e-3).mean())
        duration = n / rate
        feature = [
            rms, peak, zcr, dc,
            duration, float(x.shape[1]), rate / 1000.0, silence,
        ]
        out.append(
            {
                "media_id": media_id,
                "n_bytes": len(raw),
                "content_hash": hashlib.md5(raw).hexdigest(),
                "sample_rate": int(rate),
                "n_channels": int(x.shape[1]),
                "n_samples": int(n),
                "duration_s": round(duration, 6),
                "feature": [round(v, 6) for v in feature],
            }
        )
    return pd.DataFrame(
        out,
        columns=[
            "media_id", "n_bytes", "content_hash", "sample_rate",
            "n_channels", "n_samples", "duration_s", "feature",
        ],
    )


def extract_audio_features(
    df, id_col: str = "media_id", media_col: str = "media"
):
    """Distributed WAV feature extraction — the audio twin of
    `multimodal.extract_media_features`, same slim-projection
    ``mapInPandas`` plumbing (only (id, bytes) enters Python; bytes
    never touch the driver), emitting AUDIO_FEATURE_SCHEMA_DDL rows."""
    from pyspark.sql import functions as F

    slim = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(media_col).alias("media"),
    )

    def run(batches):
        for batch in batches:
            if len(batch):
                yield numpy_audio_decoder(batch)

    return slim.mapInPandas(run, AUDIO_FEATURE_SCHEMA_DDL)


AUDIO_FRAME_SCHEMA_DDL = (
    "media_id long, frame_index int, n_frames int, "
    "start_s double, rms double, peak double"
)


def audio_frame_energies(
    df,
    frame_ms: int = 25,
    id_col: str = "media_id",
    media_col: str = "media",
):
    """Per-frame energy rows over WAV binaries — the audio twin of
    `multimodal.sample_frames`'s 1→N decode shape: each media row
    yields one row per non-overlapping ``frame_ms`` window (final
    partial window kept) with rms and peak over the window,
    channel-pooled, 6-dp rounded. Silence trimming / voice-activity
    gating is then a plain FILTER on these rows (rms below a floor),
    composing with every downstream operator instead of hiding a
    policy inside the decoder. Same slim-projection ``mapInPandas``
    plumbing; raises naming the media id on undecodable bytes."""
    from pyspark.sql import functions as F

    if frame_ms <= 0:
        raise ValueError(f"audio_frame_energies: frame_ms={frame_ms}")

    def _frames(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for media_id, media in zip(batch["media_id"], batch["media"]):
            raw = bytes(media) if media is not None else b""
            try:
                rate, x = _decode_audio(raw)
            except ValueError as e:
                raise ValueError(f"media_id={media_id}: {e}") from e
            hop = max(1, rate * frame_ms // 1000)
            n = x.shape[0]
            n_frames = max(1, -(-n // hop))
            for i in range(n_frames):
                seg = x[i * hop : (i + 1) * hop]
                out.append(
                    {
                        "media_id": media_id,
                        "frame_index": i,
                        "n_frames": n_frames,
                        "start_s": round(i * hop / rate, 6),
                        "rms": round(
                            float(np.sqrt((seg**2).mean())), 6
                        ),
                        "peak": round(float(np.abs(seg).max()), 6),
                    }
                )
        return pd.DataFrame(
            out,
            columns=[
                "media_id", "frame_index", "n_frames",
                "start_s", "rms", "peak",
            ],
        )

    slim = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(media_col).alias("media"),
    )

    def run(batches):
        for batch in batches:
            if len(batch):
                yield _frames(batch)

    return slim.mapInPandas(run, AUDIO_FRAME_SCHEMA_DDL)


AUDIO_SPECTRAL_SCHEMA_DDL = (
    "media_id long, frame_index int, n_frames int, start_s double, "
    "spectral_centroid_hz double, spectral_bandwidth_hz double, "
    "spectral_rolloff_hz double, spectral_flatness double"
)


def audio_spectral_features(
    df,
    frame_ms: int = 25,
    rolloff: float = 0.85,
    id_col: str = "media_id",
    media_col: str = "media",
):
    """Per-frame SPECTRAL rows over audio binaries — the frequency-
    domain companion to :func:`audio_frame_energies` (same 1→N
    decode shape, same non-overlapping ``frame_ms`` windows, final
    partial window kept, channel-pooled by averaging before the
    transform). Per window, from the real FFT magnitude spectrum
    (DC bin excluded — it is the frame's mean, not spectral shape):

    - ``spectral_centroid_hz`` — magnitude-weighted mean frequency
      (the classic brightness measure);
    - ``spectral_bandwidth_hz`` — magnitude-weighted standard
      deviation around the centroid;
    - ``spectral_rolloff_hz`` — the lowest frequency below which
      ``rolloff`` (default 85%) of the total magnitude lies;
    - ``spectral_flatness`` — geometric/arithmetic mean ratio of the
      POWER spectrum in (0, 1]: →1 for noise, →0 for pure tones
      (computed in log space for stability; zero-magnitude bins
      floored at 1e-12).

    A silent frame (all-zero spectrum) reports NULL centroid/
    bandwidth/rolloff and flatness 1.0 — stated contract: silence
    has no spectral shape, and NULL-vs-0 Hz keeps it filterable.
    All values 6-dp rounded. Same slim-projection ``mapInPandas``
    plumbing; raises naming the media id on undecodable bytes."""
    from pyspark.sql import functions as F

    if frame_ms <= 0:
        raise ValueError(f"audio_spectral_features: frame_ms={frame_ms}")
    if not 0 < rolloff <= 1:
        raise ValueError(f"audio_spectral_features: rolloff={rolloff}")

    def _frames(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        cols = [
            "media_id", "frame_index", "n_frames", "start_s",
            "spectral_centroid_hz", "spectral_bandwidth_hz",
            "spectral_rolloff_hz", "spectral_flatness",
        ]
        for media_id, media in zip(batch["media_id"], batch["media"]):
            raw = bytes(media) if media is not None else b""
            try:
                rate, x = _decode_audio(raw)
            except ValueError as e:
                raise ValueError(f"media_id={media_id}: {e}") from e
            mono = x.mean(axis=1)
            hop = max(1, rate * frame_ms // 1000)
            n = mono.shape[0]
            n_frames = max(1, -(-n // hop))
            for i in range(n_frames):
                seg = mono[i * hop : (i + 1) * hop]
                mag = np.abs(np.fft.rfft(seg))[1:]  # DC excluded
                freqs = np.fft.rfftfreq(seg.shape[0], 1.0 / rate)[1:]
                row = {
                    "media_id": media_id,
                    "frame_index": i,
                    "n_frames": n_frames,
                    "start_s": round(i * hop / rate, 6),
                    "spectral_centroid_hz": None,
                    "spectral_bandwidth_hz": None,
                    "spectral_rolloff_hz": None,
                    "spectral_flatness": 1.0,
                }
                total = mag.sum()
                if mag.size and total > 0:
                    centroid = float((freqs * mag).sum() / total)
                    bw = float(
                        np.sqrt(
                            ((freqs - centroid) ** 2 * mag).sum()
                            / total
                        )
                    )
                    cum = np.cumsum(mag)
                    ro = float(
                        freqs[np.searchsorted(
                            cum, rolloff * total
                        ).clip(0, mag.size - 1)]
                    )
                    power = np.maximum(mag**2, 1e-12)
                    flat = float(
                        np.exp(np.log(power).mean()) / power.mean()
                    )
                    row.update(
                        spectral_centroid_hz=round(centroid, 6),
                        spectral_bandwidth_hz=round(bw, 6),
                        spectral_rolloff_hz=round(ro, 6),
                        spectral_flatness=round(min(flat, 1.0), 6),
                    )
                out.append(row)
        return pd.DataFrame(out, columns=cols)

    slim = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(media_col).alias("media"),
    )

    def run(batches):
        for batch in batches:
            if len(batch):
                yield _frames(batch)

    return slim.mapInPandas(run, AUDIO_SPECTRAL_SCHEMA_DDL)
