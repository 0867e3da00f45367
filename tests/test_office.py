"""Office/ebook extraction (`operators/office.py`) — fixtures built
in-test with stdlib ``zipfile`` against hand-authored XML (the
independent-producer oracle pattern from the JPEG/FLAC work: the
extractor never sees bytes it produced itself)."""

from __future__ import annotations

import io
import zipfile

import pytest

from data_pipeline_project_using_telegram_and_aws_spark.operators.office import (
    extract_docx,
    extract_epub,
    extract_office_text,
    extract_pptx,
    extract_xlsx,
    sniff_office,
)

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
W_STRICT_NS = "http://purl.oclc.org/ooxml/wordprocessingml/main"
A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
S_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
CP_NS = ("http://schemas.openxmlformats.org/package/2006/metadata/"
         "core-properties")
DC_NS = "http://purl.org/dc/elements/1.1/"


def _zip_bytes(parts: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in parts.items():
            zf.writestr(name, data)
    return buf.getvalue()


def _docx(document_xml: str, extra: dict[str, bytes] | None = None,
          ns: str = W_NS) -> bytes:
    parts = {"word/document.xml":
             document_xml.replace("{W}", ns).encode()}
    if extra:
        parts.update(extra)
    return _zip_bytes(parts)


BASIC_DOC = """<?xml version="1.0"?>
<w:document xmlns:w="{W}"><w:body>
<w:p><w:r><w:t>Hello </w:t></w:r><w:r><w:t>world</w:t></w:r></w:p>
<w:p><w:r><w:t xml:space="preserve">  indented</w:t></w:r>
<w:r><w:tab/><w:t>after tab</w:t></w:r></w:p>
<w:p><w:r><w:t>line one</w:t><w:br/><w:t>line two</w:t></w:r></w:p>
</w:body></w:document>"""


class TestDocx:
    def test_paragraphs_runs_tabs_breaks(self):
        got = extract_docx(_docx(BASIC_DOC))
        assert got["text"] == (
            "Hello world\n  indented\tafter tab\nline one\nline two"
        )
        assert got["n_parts"] == 3

    def test_strict_namespace_same_result(self):
        # strict OOXML uses a different namespace URI, identical
        # local structure — localname matching accepts both
        assert extract_docx(_docx(BASIC_DOC, ns=W_STRICT_NS))["text"] \
            == extract_docx(_docx(BASIC_DOC))["text"]

    def test_table_rows_tab_joined(self):
        doc = """<?xml version="1.0"?>
<w:document xmlns:w="{W}"><w:body>
<w:p><w:r><w:t>before</w:t></w:r></w:p>
<w:tbl>
 <w:tr><w:tc><w:p><w:r><w:t>a1</w:t></w:r></w:p></w:tc>
       <w:tc><w:p><w:r><w:t>b1</w:t></w:r></w:p>
             <w:p><w:r><w:t>b1b</w:t></w:r></w:p></w:tc></w:tr>
 <w:tr><w:tc><w:p><w:r><w:t>a2</w:t></w:r></w:p></w:tc>
       <w:tc><w:p><w:r><w:t>b2</w:t></w:r></w:p></w:tc></w:tr>
</w:tbl>
<w:p><w:r><w:t>after</w:t></w:r></w:p>
</w:body></w:document>"""
        got = extract_docx(_docx(doc))
        assert got["text"] == "before\na1\tb1 b1b\na2\tb2\nafter"

    def test_footnotes_appended(self):
        notes = """<?xml version="1.0"?>
<w:footnotes xmlns:w="{W}">
<w:footnote><w:p/></w:footnote>
<w:footnote><w:p><w:r><w:t>see also X</w:t></w:r></w:p></w:footnote>
</w:footnotes>""".replace("{W}", W_NS).encode()
        got = extract_docx(
            _docx(BASIC_DOC, extra={"word/footnotes.xml": notes})
        )
        assert got["text"].endswith("line two\nsee also X")

    def test_core_properties(self):
        core = f"""<?xml version="1.0"?>
<cp:coreProperties xmlns:cp="{CP_NS}" xmlns:dc="{DC_NS}">
<dc:title>My Title</dc:title><dc:creator>Ada</dc:creator>
<dc:language>en-US</dc:language>
</cp:coreProperties>""".encode()
        got = extract_docx(
            _docx(BASIC_DOC, extra={"docProps/core.xml": core})
        )
        assert (got["title"], got["creator"], got["language"]) == (
            "My Title", "Ada", "en-US")

    def test_sdt_content_recursed(self):
        doc = """<?xml version="1.0"?>
<w:document xmlns:w="{W}"><w:body>
<w:sdt><w:sdtPr/><w:sdtContent>
<w:p><w:r><w:t>inside sdt</w:t></w:r></w:p>
</w:sdtContent></w:sdt>
</w:body></w:document>"""
        assert extract_docx(_docx(doc))["text"] == "inside sdt"

    def test_missing_document_part_raises(self):
        raw = _zip_bytes({"word/other.xml": b"<x/>"})
        with pytest.raises(ValueError, match="word/document.xml"):
            extract_docx(raw)

    def test_malformed_xml_raises(self):
        raw = _zip_bytes({"word/document.xml": b"<w:document"})
        with pytest.raises(ValueError, match="XML parse error"):
            extract_docx(raw)

    def test_not_a_zip_raises(self):
        with pytest.raises(ValueError, match="bad zip"):
            extract_docx(b"%PDF-1.4 not a zip at all")


def _slide(lines: list[str]) -> bytes:
    ps = "".join(
        f"<a:p><a:r><a:t>{line}</a:t></a:r></a:p>" for line in lines
    )
    return (f'<?xml version="1.0"?><p:sld xmlns:p="x:p" '
            f'xmlns:a="{A_NS}"><p:cSld>{ps}</p:cSld></p:sld>').encode()


class TestPptx:
    def test_slides_numeric_order(self):
        # slide10 must come after slide2 (numeric, not lexicographic)
        raw = _zip_bytes({
            "ppt/presentation.xml": b"<p/>",
            "ppt/slides/slide10.xml": _slide(["third"]),
            "ppt/slides/slide1.xml": _slide(["first", "second"]),
            "ppt/slides/slide2.xml": _slide(["between"]),
        })
        got = extract_pptx(raw)
        assert got["text"] == "first\nsecond\n\nbetween\n\nthird"
        assert got["n_parts"] == 3

    def test_a_br_is_newline(self):
        sld = (f'<?xml version="1.0"?><p:sld xmlns:p="x:p" '
               f'xmlns:a="{A_NS}"><a:p><a:r><a:t>top</a:t></a:r>'
               f'<a:br/><a:r><a:t>bottom</a:t></a:r></a:p>'
               f'</p:sld>').encode()
        raw = _zip_bytes({"ppt/presentation.xml": b"<p/>",
                          "ppt/slides/slide1.xml": sld})
        assert extract_pptx(raw)["text"] == "top\nbottom"

    def test_missing_presentation_raises(self):
        raw = _zip_bytes({"ppt/slides/slide1.xml": _slide(["x"])})
        with pytest.raises(ValueError, match="ppt/presentation.xml"):
            extract_pptx(raw)


SHARED = (f'<?xml version="1.0"?><sst xmlns="{S_NS}">'
          '<si><t>plain</t></si>'
          '<si><r><t>rich </t></r><r><t>text</t></r></si>'
          '</sst>').encode()


def _sheet(rows: list[list[str]]) -> bytes:
    body = "".join(
        "<row>" + "".join(cells) + "</row>" for cells in rows
    )
    return (f'<?xml version="1.0"?><worksheet xmlns="{S_NS}">'
            f'<sheetData>{body}</sheetData></worksheet>').encode()


class TestXlsx:
    def test_shared_inline_and_literal_cells(self):
        sheet = _sheet([
            ['<c t="s"><v>0</v></c>', '<c t="s"><v>1</v></c>'],
            ['<c><v>42.5</v></c>',
             '<c t="inlineStr"><is><t>inline</t></is></c>',
             "<c/>"],
        ])
        raw = _zip_bytes({"xl/workbook.xml": b"<w/>",
                          "xl/sharedStrings.xml": SHARED,
                          "xl/worksheets/sheet1.xml": sheet})
        got = extract_xlsx(raw)
        assert got["text"] == "plain\trich text\n42.5\tinline\t"
        assert got["n_parts"] == 1

    def test_two_sheets_numeric_order(self):
        raw = _zip_bytes({
            "xl/workbook.xml": b"<w/>",
            "xl/worksheets/sheet2.xml": _sheet([['<c><v>2</v></c>']]),
            "xl/worksheets/sheet1.xml": _sheet([['<c><v>1</v></c>']]),
        })
        assert extract_xlsx(raw)["text"] == "1\n\n2"

    def test_shared_index_out_of_range_raises(self):
        sheet = _sheet([['<c t="s"><v>99</v></c>']])
        raw = _zip_bytes({"xl/workbook.xml": b"<w/>",
                          "xl/sharedStrings.xml": SHARED,
                          "xl/worksheets/sheet1.xml": sheet})
        with pytest.raises(ValueError, match="out of range"):
            extract_xlsx(raw)


CONTAINER = b"""<?xml version="1.0"?>
<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
<rootfiles><rootfile full-path="OEBPS/content.opf"
 media-type="application/oebps-package+xml"/></rootfiles></container>"""

OPF = b"""<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf"
 xmlns:dc="http://purl.org/dc/elements/1.1/">
<metadata><dc:title>A Book</dc:title><dc:creator>Bo</dc:creator>
<dc:language>fr</dc:language></metadata>
<manifest>
 <item id="c2" href="text/ch2.xhtml" media-type="application/xhtml+xml"/>
 <item id="c1" href="text/ch1.xhtml" media-type="application/xhtml+xml"/>
</manifest>
<spine><itemref idref="c1"/><itemref idref="c2"/></spine>
</package>"""

CH1 = b"<html><body><p>Chapter one body.</p></body></html>"
CH2 = b"<html><body><p>Chapter two body.</p></body></html>"


def _epub(extra: dict[str, bytes] | None = None) -> bytes:
    parts = {
        "mimetype": b"application/epub+zip",
        "META-INF/container.xml": CONTAINER,
        "OEBPS/content.opf": OPF,
        "OEBPS/text/ch1.xhtml": CH1,
        "OEBPS/text/ch2.xhtml": CH2,
    }
    if extra:
        parts.update(extra)
    return _zip_bytes(parts)


class TestEpub:
    def test_spine_order_and_metadata(self):
        got = extract_epub(_epub())
        # spine order (c1 before c2) wins over manifest order (c2
        # listed first); hrefs resolve relative to the OPF directory
        assert got["text"] == CH1.decode() + "\n" + CH2.decode()
        assert got["n_parts"] == 2
        assert (got["title"], got["creator"], got["language"]) == (
            "A Book", "Bo", "fr")

    def test_encryption_raises(self):
        raw = _epub({"META-INF/encryption.xml": b"<enc/>"})
        with pytest.raises(ValueError, match="encrypted epub"):
            extract_epub(raw)

    def test_spine_idref_not_in_manifest_raises(self):
        bad = OPF.replace(b'idref="c2"', b'idref="missing"')
        raw = _epub({"OEBPS/content.opf": bad})
        with pytest.raises(ValueError, match="missing"):
            extract_epub(raw)

    def test_non_utf8_chapter_raises(self):
        raw = _epub({"OEBPS/text/ch2.xhtml": b"\xff\xfe broken"})
        with pytest.raises(ValueError, match="not UTF-8"):
            extract_epub(raw)


class TestSniff:
    def test_all_formats(self):
        assert sniff_office(_docx(BASIC_DOC)) == "docx"
        assert sniff_office(_epub()) == "epub"
        assert sniff_office(_zip_bytes({"a.txt": b"x"})) == "zip"
        assert sniff_office(b"%PDF-1.7 ...") == "not-zip"
        assert sniff_office(b"") == "not-zip"
        # torn zip: magic present, central directory unreadable
        assert sniff_office(b"PK\x03\x04" + b"\x00" * 8) == "not-zip"

    def test_mimetype_bomb_not_decompressed(self):
        """A DEFLATE 'mimetype' member declaring a large body cannot
        be a real EPUB (OCF: stored, ~20 bytes) — the sniff must fall
        through to 'zip' WITHOUT decompressing it (r12 advisor
        finding: a ~1000:1 crafted member turned the cheap pre-gate
        into a decompression-bomb vector)."""
        bomb = _zip_bytes({"mimetype": b"\x00" * 4_000_000})
        # the crafted member compresses ~1000:1; the gate reads only
        # the central-directory metadata, never inflates
        assert len(bomb) < 10_000
        assert sniff_office(bomb) == "zip"
        # tolerance intact: a small DEFLATED mimetype with the real
        # OCF body still sniffs as epub (_zip_bytes deflates all
        # members, so test_all_formats' _epub() already rides it)
        small = _zip_bytes({"mimetype": b"application/epub+zip"})
        assert sniff_office(small) == "epub"

    def test_mimetype_member_must_be_epub_mimetype(self):
        # a zip merely CONTAINING a member named 'mimetype' is not an
        # EPUB (OCF requires its bytes to be application/epub+zip);
        # it must dispatch as plain zip, not quarantine as broken epub
        assert sniff_office(
            _zip_bytes({"mimetype": b"text/plain", "a.txt": b"x"})
        ) == "zip"
        # the real OCF mimetype alone (container.xml torn away) still
        # identifies the format — the extractor then reports exactly
        # which required part is missing
        assert sniff_office(
            _zip_bytes({"mimetype": b"application/epub+zip"})
        ) == "epub"


class TestSpark:
    def test_mixed_batch_conservation_and_composition(self, spark):
        rows = [
            (1, _docx(BASIC_DOC)),
            (2, _epub()),
            (3, b"not a document at all"),
            (4, _zip_bytes({"random.bin": b"\x00"})),
        ]
        df = spark.createDataFrame(rows, "doc_id long, doc binary")
        out = extract_office_text(df).orderBy("doc_id").collect()
        assert len(out) == len(rows)  # conservation: every row lands
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[1]["format"] == "docx"
        assert by_id[1]["error"] is None
        assert by_id[1]["text"].startswith("Hello world")
        assert by_id[2]["format"] == "epub"
        assert "Chapter one body." in by_id[2]["text"]
        assert by_id[3]["error"].startswith("unsupported container")
        assert by_id[4]["error"].startswith("unsupported container")

        # EPUB rows return markup; the EXISTING html surface is the
        # text engine — compose and pin the visible text
        from data_pipeline_project_using_telegram_and_aws_spark.operators.html import (
            html_to_text,
        )
        from pyspark.sql import functions as F

        epub_txt = (
            extract_office_text(df)
            .where(F.col("format") == "epub")
            .select(html_to_text(F.col("text")).alias("t"))
            .collect()[0]["t"]
        )
        assert "Chapter one body." in epub_txt
        assert "Chapter two body." in epub_txt
        assert "<p>" not in epub_txt


TEXT_NS = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
OFFICE_NS = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
TABLE_NS = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
META_NS = "urn:oasis:names:tc:opendocument:xmlns:meta:1.0"


def _odf(body: str, meta: str | None = None,
         encrypted: bool = False) -> bytes:
    content = (f'<?xml version="1.0"?>'
               f'<office:document-content xmlns:office="{OFFICE_NS}"'
               f' xmlns:text="{TEXT_NS}" xmlns:table="{TABLE_NS}">'
               f"<office:body>{body}</office:body>"
               f"</office:document-content>").encode()
    manifest = b'<manifest:manifest xmlns:manifest="m"/>'
    if encrypted:
        manifest = (b'<manifest:manifest xmlns:manifest="m">'
                    b'<manifest:encryption-data/></manifest:manifest>')
    parts = {
        "mimetype": b"application/vnd.oasis.opendocument.text",
        "META-INF/manifest.xml": manifest,
        "content.xml": content,
    }
    if meta:
        parts["meta.xml"] = meta.encode()
    return _zip_bytes(parts)


class TestOdf:
    def test_odt_paragraphs_tabs_breaks_spaces(self):
        from data_pipeline_project_using_telegram_and_aws_spark.operators.office import (
            extract_odf,
        )

        body = ("<office:text>"
                "<text:h>Title here</text:h>"
                "<text:p>before<text:tab/>after"
                "<text:line-break/>next</text:p>"
                '<text:p>a<text:s text:c="3"/>b</text:p>'
                "<text:p>run <text:span>styled</text:span> tail</text:p>"
                "</office:text>")
        got = extract_odf(_odf(body))
        assert got["text"] == (
            "Title here\nbefore\tafter\nnext\na   b\nrun styled tail"
        )
        assert got["n_parts"] == 4

    def test_ods_rows_tab_joined(self):
        from data_pipeline_project_using_telegram_and_aws_spark.operators.office import (
            extract_odf,
        )

        body = ("<office:spreadsheet><table:table>"
                "<table:table-row>"
                "<table:table-cell><text:p>Region</text:p></table:table-cell>"
                "<table:table-cell><text:p>Sales</text:p></table:table-cell>"
                "</table:table-row>"
                "<table:table-row>"
                "<table:table-cell><text:p>North</text:p></table:table-cell>"
                "<table:table-cell><text:p>125</text:p></table:table-cell>"
                "</table:table-row>"
                "</table:table></office:spreadsheet>")
        got = extract_odf(_odf(body))
        assert got["text"] == "Region\tSales\nNorth\t125"

    def test_odp_pages_blank_line_separated(self):
        from data_pipeline_project_using_telegram_and_aws_spark.operators.office import (
            extract_odf,
        )

        # draw:page localname is "page"
        body = ('<office:presentation xmlns:draw="d">'
                "<draw:page><text:p>slide one</text:p></draw:page>"
                "<draw:page><text:p>slide two</text:p></draw:page>"
                "</office:presentation>")
        got = extract_odf(_odf(body))
        assert got["text"] == "slide one\n\nslide two"

    def test_meta_xml(self):
        from data_pipeline_project_using_telegram_and_aws_spark.operators.office import (
            extract_odf,
        )

        meta = (f'<?xml version="1.0"?>'
                f'<office:document-meta xmlns:office="{OFFICE_NS}"'
                f' xmlns:dc="{DC_NS}" xmlns:meta="{META_NS}">'
                f"<office:meta><dc:title>Doc T</dc:title>"
                f"<dc:creator>Di</dc:creator>"
                f"<dc:language>de</dc:language>"
                f"<meta:creation-date>2026-01-01</meta:creation-date>"
                f"</office:meta></office:document-meta>")
        got = extract_odf(
            _odf("<office:text><text:p>x</text:p></office:text>",
                 meta=meta))
        assert (got["title"], got["creator"], got["language"],
                got["created"]) == ("Doc T", "Di", "de", "2026-01-01")

    def test_encrypted_raises(self):
        from data_pipeline_project_using_telegram_and_aws_spark.operators.office import (
            extract_odf,
        )

        with pytest.raises(ValueError, match="encrypted odf"):
            extract_odf(_odf(
                "<office:text><text:p>x</text:p></office:text>",
                encrypted=True))

    def test_sniff_and_dispatch(self):
        from data_pipeline_project_using_telegram_and_aws_spark.operators.documents import (
            extract_document,
            sniff_document,
        )

        raw = _odf("<office:text><text:p>hello odf</text:p></office:text>")
        assert sniff_office(raw) == "odf"
        assert sniff_document(raw) == "odf"
        got = extract_document(raw)
        assert got["text"] == "hello odf"
        assert got["is_markup"] is False


class TestEpubHrefRegressions:
    """Round-11 self-review finding: OPF hrefs are URIs — percent
    escapes decode and fragments drop before member lookup."""

    def test_percent_encoded_href_and_fragment(self):
        opf = OPF.replace(b'href="text/ch1.xhtml"',
                          b'href="text/ch%201.xhtml"') \
                 .replace(b'href="text/ch2.xhtml"',
                          b'href="text/ch2.xhtml#start"')
        raw = _epub({"OEBPS/content.opf": opf,
                     "OEBPS/text/ch 1.xhtml": CH1})
        got = extract_epub(raw)
        assert got["n_parts"] == 2
        assert "Chapter one body." in got["text"]
        assert "Chapter two body." in got["text"]
