"""Document-surface driver row: PDF + DOCX + EPUB front door,
hash-checked end-to-end (the wc1/mm2 real-fixture play).

The sf_dir tables carry no document bytes, so the row embeds FIXED
fixtures built in-module, independently of the extractors under test
(raw PDF object assembly with computed xref offsets + stdlib zlib;
stdlib zipfile with pinned ZipInfo dates and STORED compression so
the bytes are deterministic), runs the REAL unified front door
(`operators/documents.py extract_documents` → `document_plain_text`),
and the oracle pins format routing, metadata, unit counts, extracted
text (including the EPUB markup → `operators/html.py` composition)
and quarantine behavior as AUTHORING-TIME literals hand-derived from
the fixture content — not echoed from the extractors.

A break anywhere in the chain — PDF xref/object parsing, Flate
decode, content-stream interpretation, WinAnsi font decode, OOXML
paragraph/table walking, OPC core properties, EPUB container/spine
walk, HTML entity/text extraction, magic-byte dispatch, quarantine
routing — turns the driver row red.

Fixture coverage (reference: the reference pipeline ingests one JSON
message per webhook call, ipynb cell 21; this is the same front-door
role for document corpora):

- doc 1  two-page PDF: Flate-compressed page 1, raw page 2 with
         cp1252 bytes (é, €) through the WinAnsi decode path, /Info
         title+author, page join = form feed;
- doc 2  DOCX: paragraphs + a 2×2 table (TAB-joined cells) +
         docProps/core.xml title/creator/language;
- doc 3  EPUB: OPF metadata + two spine chapters; ``is_markup``
         rows resolve through the JVM html_to_text composition;
- doc 4  arbitrary bytes → quarantine (unsupported container);
- doc 5  DRM EPUB (META-INF/encryption.xml) → quarantine;
- doc 6  LaTeX source: sniffed by control words, raw source rides
         ``text`` and the JVM `operators/latex.py` pipeline resolves
         it (section heading, \\emph unwrap, --- and \\$ escapes);
- doc 7  SRT subtitles (CRLF, styling tag): cue texts newline-joined;
- doc 8  WebVTT (NOTE block skipped, voice tag → 'Ada: ' prefix).

Cost note (measured, the wc1 pattern): ~30 s cold at the oracle gate,
nearly all PLAN cost — Python-worker spin-up plus Catalyst constant-
folding of the html_to_text entity maps AND the ~100-fold latex
regexp chain (which janino refuses past the method limit, so the
fallback interpreter path compiles those regexes instead), not data
(six rows). At corpus scale the same plan compiles once and the
per-row work is the measured-linear document path (BENCH_NOTES
round-11 fourth pass).
"""

from __future__ import annotations

import io
import zipfile
import zlib

from pyspark.sql import functions as F

from ..operators.documents import document_plain_text, extract_documents

# ---------------------------------------------------------------------------
# fixtures (independent construction — see module docstring)

_PDF_PAGE1 = b"BT /F1 12 Tf 72 720 Td (Drip brewing, page one.) Tj ET"
_PDF_PAGE2 = "BT /F1 12 Tf 72 720 Td (Caf\xe9 pricing: €3.) Tj ET" \
    .encode("cp1252")


def _fixture_pdf() -> bytes:
    """Two-page PDF, classic xref, computed offsets; page 1 content
    Flate-compressed, page 2 raw cp1252 (WinAnsi)."""
    z1 = zlib.compress(_PDF_PAGE1)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R"
            b" /Resources << /Font << /F1 7 0 R >> >> >>"),
        4: (b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R"
            b" /Resources << /Font << /F1 7 0 R >> >> >>"),
        5: (b"<< /Length " + str(len(z1)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + z1
            + b"\nendstream"),
        6: (b"<< /Length " + str(len(_PDF_PAGE2)).encode()
            + b" >>\nstream\n" + _PDF_PAGE2 + b"\nendstream"),
        7: (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /WinAnsiEncoding >>"),
        8: b"<< /Title (Fixture PDF) /Author (Ada) >>",
    }
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += (str(num).encode() + b" 0 obj\n" + objs[num]
                + b"\nendobj\n")
    xref_at = len(out)
    out += b"xref\n0 9\n0000000000 65535 f \n"
    for num in range(1, 9):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size 9 /Root 1 0 R /Info 8 0 R >>\n"
            b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n")
    return bytes(out)


def _zip_fixed(parts: dict[str, bytes]) -> bytes:
    """Deterministic zip: pinned date, STORED (no codec variance)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, data in parts.items():
            zf.writestr(
                zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0)),
                data,
            )
    return buf.getvalue()


_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

_DOCX_DOCUMENT = f"""<?xml version="1.0"?>
<w:document xmlns:w="{_W}"><w:body>
<w:p><w:r><w:t>Quarterly report overview.</w:t></w:r></w:p>
<w:tbl>
<w:tr><w:tc><w:p><w:r><w:t>Region</w:t></w:r></w:p></w:tc>
<w:tc><w:p><w:r><w:t>Sales</w:t></w:r></w:p></w:tc></w:tr>
<w:tr><w:tc><w:p><w:r><w:t>North</w:t></w:r></w:p></w:tc>
<w:tc><w:p><w:r><w:t>125</w:t></w:r></w:p></w:tc></w:tr>
</w:tbl>
<w:p><w:r><w:t>End of report.</w:t></w:r></w:p>
</w:body></w:document>""".encode()

_DOCX_CORE = b"""<?xml version="1.0"?>
<cp:coreProperties
 xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties"
 xmlns:dc="http://purl.org/dc/elements/1.1/">
<dc:title>Q Report</dc:title><dc:creator>Bo</dc:creator>
<dc:language>en-US</dc:language>
</cp:coreProperties>"""


def _fixture_docx() -> bytes:
    return _zip_fixed({
        "word/document.xml": _DOCX_DOCUMENT,
        "docProps/core.xml": _DOCX_CORE,
    })


_EPUB_CONTAINER = b"""<?xml version="1.0"?>
<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
<rootfiles><rootfile full-path="OEBPS/content.opf"
 media-type="application/oebps-package+xml"/></rootfiles></container>"""

_EPUB_OPF = b"""<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf"
 xmlns:dc="http://purl.org/dc/elements/1.1/">
<metadata><dc:title>A Book</dc:title><dc:creator>Cy</dc:creator>
<dc:language>en</dc:language></metadata>
<manifest>
<item id="c1" href="ch1.xhtml" media-type="application/xhtml+xml"/>
<item id="c2" href="ch2.xhtml" media-type="application/xhtml+xml"/>
</manifest>
<spine><itemref idref="c1"/><itemref idref="c2"/></spine>
</package>"""

_EPUB_CH1 = (b"<html><body><p>Chapter one: coffee cultivation"
             b" spread from Ethiopia.</p></body></html>")
_EPUB_CH2 = (b"<html><body><p>Chapter two: roasting styles"
             b" &amp; brewing.</p></body></html>")


def _fixture_epub(encrypted: bool = False) -> bytes:
    parts = {
        "mimetype": b"application/epub+zip",
        "META-INF/container.xml": _EPUB_CONTAINER,
        "OEBPS/content.opf": _EPUB_OPF,
        "OEBPS/ch1.xhtml": _EPUB_CH1,
        "OEBPS/ch2.xhtml": _EPUB_CH2,
    }
    if encrypted:
        parts["META-INF/encryption.xml"] = b"<enc/>"
    return _zip_fixed(parts)


_TEX_SOURCE = r"""\documentclass{article}
\title{Notes}
\begin{document}
\section{Brewing}
Pour over is \emph{simple} --- and \$5 cheap.
\end{document}
"""


_SRT_SOURCE = ("1\r\n"
               "00:00:01,000 --> 00:00:02,000\r\n"
               "Hello from cue one.\r\n"
               "\r\n"
               "2\r\n"
               "00:00:03,000 --> 00:00:04,500\r\n"
               "<i>Cue two styled.</i>\r\n")

_VTT_SOURCE = ("WEBVTT\n"
               "\n"
               "NOTE authoring comment, not a cue\n"
               "\n"
               "00:01.000 --> 00:02.000\n"
               "<v Ada>Welcome back</v>\n")


def dx1_document_extract(spark, sf_dir):
    """The document front door as one hash-checked row (module
    docstring): magic-byte dispatch → per-format extraction →
    markup resolution — one Python stage (the extraction), the
    EPUB html→text step a JVM column, the production shape at
    5-row scale."""
    rows = [
        (1, _fixture_pdf()),
        (2, _fixture_docx()),
        (3, _fixture_epub()),
        (4, b"\x89PNG not a document container"),
        (5, _fixture_epub(encrypted=True)),
        (6, _TEX_SOURCE.encode()),
        (7, _SRT_SOURCE.encode()),
        (8, _VTT_SOURCE.encode()),
    ]
    df = spark.createDataFrame(rows, "doc_id long, doc binary")
    out = document_plain_text(extract_documents(df))
    return out.select(
        "doc_id",
        "format",
        F.split("error", ":").getItem(0).alias("error_kind"),
        "n_units",
        "title",
        "creator",
        "language",
        "plain_text",
    ).orderBy("doc_id")


QUERIES = {
    "dx1_document_extract": dx1_document_extract,
}

# Expected values are HAND-DERIVED from the fixture literals above —
# the mm2/wc1 discipline: construction constants and hand-derivations
# (page join = \n\x0c\n, DOCX cells TAB-joined, html_to_text joins
# <p> blocks with a blank line), confirmed once against a run.
_PDF_TEXT = ("Drip brewing, page one.{nl}\x0c{nl}"
             "Caf\xe9 pricing: €3.")
_DOCX_TEXT = ("Quarterly report overview.{nl}Region\tSales{nl}"
              "North\t125{nl}End of report.")
_EPUB_TEXT = ("Chapter one: coffee cultivation spread from Ethiopia."
              "{nl}{nl}Chapter two: roasting styles & brewing.")
# latex contract: body cut, \section -> own line (blank-separated by
# the source newlines), \emph unwraps, --- is an em dash, \$ restores
_TEX_TEXT = "Brewing{nl}{nl}Pour over is simple — and $5 cheap."
# subtitle contract: cue texts newline-joined, styling tags stripped,
# voice tag speaker kept as the 'Name: ' prefix
_SRT_TEXT = "Hello from cue one.{nl}Cue two styled."
_VTT_TEXT = "Ada: Welcome back"


def _sqlq(s: str) -> str:
    """Python literal → DuckDB string expr (newlines via chr(10))."""
    return "'" + s.replace("'", "''").format(nl="' || chr(10) || '") + "'"


ORACLE = {
    "dx1_document_extract": f"""
        SELECT * FROM (VALUES
            (CAST(1 AS BIGINT), 'pdf', CAST(NULL AS VARCHAR),
             CAST(2 AS INTEGER), 'Fixture PDF', 'Ada',
             CAST(NULL AS VARCHAR), {_sqlq(_PDF_TEXT)}),
            (CAST(2 AS BIGINT), 'docx', CAST(NULL AS VARCHAR),
             CAST(4 AS INTEGER), 'Q Report', 'Bo', 'en-US',
             {_sqlq(_DOCX_TEXT)}),
            (CAST(3 AS BIGINT), 'epub', CAST(NULL AS VARCHAR),
             CAST(2 AS INTEGER), 'A Book', 'Cy', 'en',
             {_sqlq(_EPUB_TEXT)}),
            (CAST(4 AS BIGINT), 'unknown', 'ValueError',
             CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR),
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
             CAST(NULL AS VARCHAR)),
            (CAST(5 AS BIGINT), 'epub', 'ValueError',
             CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR),
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
             CAST(NULL AS VARCHAR)),
            (CAST(6 AS BIGINT), 'tex', CAST(NULL AS VARCHAR),
             CAST(2 AS INTEGER), CAST(NULL AS VARCHAR),
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
             {_sqlq(_TEX_TEXT)}),
            (CAST(7 AS BIGINT), 'srt', CAST(NULL AS VARCHAR),
             CAST(2 AS INTEGER), CAST(NULL AS VARCHAR),
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
             {_sqlq(_SRT_TEXT)}),
            (CAST(8 AS BIGINT), 'vtt', CAST(NULL AS VARCHAR),
             CAST(1 AS INTEGER), CAST(NULL AS VARCHAR),
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
             {_sqlq(_VTT_TEXT)})
        ) AS t(doc_id, format, error_kind, n_units, title, creator,
               language, plain_text)
        ORDER BY doc_id
    """,
}
