"""Unified document front door — one ``binary`` column in, one text
row out, for every document container the engine can open: PDF
(`operators/pdf.py`), DOCX/PPTX/XLSX/ODF/EPUB (`operators/office.py`),
RTF (`operators/rtf.py`), LaTeX (`operators/latex.py`), SRT/WebVTT
(`operators/subtitles.py`).

The reference pipeline's front door accepts exactly one shape
(Telegram message JSON); a corpus front door meets arbitrary bytes.
This module is the dispatch layer: magic-byte routing (``%PDF-`` /
``PK`` / ``{\\rtf`` / ``WEBVTT`` / TeX control words / the SRT head
shape, all BOM-tolerant) into the per-format extractors, all inside
ONE ``mapInPandas`` Arrow stage, with the standard quarantine
contract — a row that cannot be opened lands with ``error`` set and
every other field NULL, |input| == |output| always.

Unified schema notes:

- ``n_units`` is the format's natural size unit (PDF pages, DOCX/RTF
  lines, PPTX slides, XLSX sheets, EPUB chapters, LaTeX sections,
  subtitle cues) — the auditable size signal a quota/quality gate
  thresholds on.
- ``n_unmapped`` is PDF-only (glyph codes with no Unicode meaning);
  0 for formats whose text is stored as text.
- ``is_markup`` marks rows whose ``text`` still needs a JVM
  resolution step — EPUB chapters (``html_to_text``), LaTeX source
  (``latex_to_text``), subtitle sources (cue parse + join) — which
  :func:`document_plain_text` applies as column expressions keyed on
  ``format``, so markup→text costs no second Python stage.
- ``creator`` carries PDF ``/Author``, OPC ``dc:creator`` and RTF
  ``\\author`` — the same role under all names.
"""

from __future__ import annotations

import re

from collections.abc import Iterator

import pandas as pd

from .office import _EXTRACTORS as _OFFICE_EXTRACTORS
from .office import sniff_office
from .pdf import extract_pdf
from .rtf import extract_rtf

__all__ = [
    "sniff_document",
    "extract_document",
    "extract_documents",
    "document_plain_text",
    "DOCUMENT_TEXT_DDL",
]

DOCUMENT_TEXT_DDL = (
    "doc_id long, format string, text string, is_markup boolean, "
    "title string, creator string, created string, modified string, "
    "language string, n_units int, n_unmapped int, error string"
)


_TEX_MARKERS = (b"\\documentclass", b"\\begin{document}",
                b"\\section{", b"\\usepackage")

_SRT_HEAD = re.compile(
    rb"\A\s*\d+\s*\r?\n\d{1,4}:\d{2}:\d{2},\d{3}[ \t]*-->"
)

# one timing line per cue — the auditable cue count (a '-->' inside a
# NOTE comment or dialog text must not inflate n_units)
_TIMING_LINE = re.compile(
    r"(?m)^[ \t]*(?:\d{1,4}:)?\d{2}:\d{2}[.,]\d{3}[ \t]*-->"
)


def _strip_bom(raw: bytes) -> bytes:
    return raw[3:] if raw[:3] == b"\xef\xbb\xbf" else raw


def _decode_text(raw: bytes) -> str:
    """Text-shaped formats (tex/srt/vtt): UTF-8 with BOM tolerance,
    latin-1 fallback (these formats predate mandatory UTF-8)."""
    try:
        return raw.decode("utf-8-sig")
    except UnicodeDecodeError:
        return _strip_bom(raw).decode("latin-1")


def sniff_document(raw: bytes) -> str:
    """``pdf | rtf | docx | pptx | xlsx | odf | epub | tex | srt |
    vtt | zip | unknown`` from the leading bytes (zip subtypes via
    the central directory; LaTeX by its unmistakable control words
    in the first 4 KB of an otherwise text-shaped buffer; WebVTT by
    its header magic, SRT by the index + timestamp head shape)."""
    if raw[:5] == b"%PDF-":
        return "pdf"
    if raw.lstrip()[:5].startswith(b"{\\rtf"):
        return "rtf"
    text_head = _strip_bom(raw)  # the VTT spec permits a leading BOM
    if text_head.lstrip()[:6].startswith(b"WEBVTT"):
        return "vtt"
    if _SRT_HEAD.match(text_head):
        return "srt"
    got = sniff_office(raw)
    if got != "not-zip":
        return got
    head = text_head[:4096]
    if any(m in head for m in _TEX_MARKERS) and b"\x00" not in head:
        return "tex"
    return "unknown"


def extract_document(raw: bytes) -> dict:
    """One document's unified row (sans doc_id/error) — raises
    ValueError on unsupported containers and structural defects."""
    fmt = sniff_document(raw)
    out = {
        "format": fmt, "text": None, "is_markup": False,
        "title": None, "creator": None, "created": None,
        "modified": None, "language": None, "n_units": None,
        "n_unmapped": 0,
    }
    if fmt == "pdf":
        got = extract_pdf(raw)
        out.update(
            text=got["text"], title=got["title"], creator=got["author"],
            created=got["created"], modified=got["modified"],
            n_units=got["n_pages"], n_unmapped=got["n_unmapped"],
        )
        return out
    if fmt == "rtf":
        got = extract_rtf(raw)
        out.update(text=got["text"], n_units=got["n_parts"],
                   title=got["title"], creator=got["creator"])
        return out
    if fmt in ("srt", "vtt"):
        # raw subtitle source rides `text` with is_markup set — the
        # JVM `operators/subtitles.py` cue parser resolves it in
        # :func:`document_plain_text` (the tex/EPUB pattern);
        # n_units = cue count (TIMING LINES, not raw '-->' hits — a
        # '-->' inside a NOTE comment must not inflate the audit)
        source = _decode_text(raw)
        out.update(text=source, is_markup=True,
                   n_units=len(_TIMING_LINE.findall(source)))
        return out
    if fmt == "tex":
        # raw LaTeX source rides `text` with is_markup set — the JVM
        # `operators/latex.py latex_to_text` resolves it in
        # :func:`document_plain_text`, exactly the EPUB pattern
        source = _decode_text(raw)
        out.update(text=source, is_markup=True,
                   n_units=1 + source.count("\\section{"))
        return out
    extractor = _OFFICE_EXTRACTORS.get(fmt)
    if extractor is None:
        raise ValueError(f"unsupported container: {fmt}")
    got = extractor(raw)
    out["is_markup"] = fmt == "epub"
    out["text"] = got["text"]
    out["n_units"] = got["n_parts"]
    for k in ("title", "creator", "created", "modified", "language"):
        if got.get(k) is not None:
            out[k] = got[k]
    return out


def _document_rows(batch_iter) -> Iterator[pd.DataFrame]:
    cols = [f.split()[0] for f in DOCUMENT_TEXT_DDL.split(", ")]
    for batch in batch_iter:
        out = []
        for doc_id, raw in zip(batch["doc_id"], batch["doc"]):
            data = bytes(raw) if raw is not None else b""
            row = dict.fromkeys(cols)
            row["doc_id"] = doc_id
            try:
                row.update(extract_document(data))
            except Exception as e:  # noqa: BLE001 — quarantine IS the
                # stated policy for ANY extraction failure (front-door
                # doctrine: a parser bug on malformed bytes must land
                # the row, not fail the batch)
                row["format"] = sniff_document(data)
                row["error"] = f"{type(e).__name__}: {e}"[:200]
            out.append(row)
        yield pd.DataFrame(out, columns=cols)


def extract_documents(
    df,
    id_col: str = "doc_id",
    doc_col: str = "doc",
    partitions: int | None = None,
):
    """Distributed unified extraction via ``mapInPandas`` — the slim
    (id, bytes) projection from `multimodal.py`; one Python stage for
    every format. See module docstring for the schema contract."""
    from pyspark.sql import functions as F

    slim = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(doc_col).alias("doc"),
    )
    if partitions:
        slim = slim.repartition(partitions, "doc_id")
    return slim.mapInPandas(_document_rows, schema=DOCUMENT_TEXT_DDL)


def document_plain_text(df):
    """Resolve ``is_markup`` rows to visible text JVM-side — EPUB
    through `operators.html.html_to_text`, LaTeX through
    `operators.latex.latex_to_text` — no extra Python stage. Adds
    ``plain_text``; other columns pass through."""
    from pyspark.sql import functions as F

    from .html import html_to_text
    from .latex import latex_to_text

    from .subtitles import parse_srt_cues, parse_vtt_cues, subtitle_text

    return df.withColumn(
        "plain_text",
        F.when(F.col("format") == F.lit("tex"),
               latex_to_text(F.col("text")))
        .when(F.col("format") == F.lit("srt"),
              subtitle_text(parse_srt_cues(F.col("text"))))
        .when(F.col("format") == F.lit("vtt"),
              subtitle_text(parse_vtt_cues(F.col("text"))))
        .when(F.col("is_markup"), html_to_text(F.col("text")))
        .otherwise(F.col("text")),
    )
