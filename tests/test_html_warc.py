"""WARC ingestion (sources/warc.py) + HTML extraction
(operators/html.py): round trips against an independent test-side
writer, corrupt-record quarantine rows, HTML strip/entities/metadata
against hand-expected values and a stdlib html.parser differential
model, anchor-density boilerplate gating, and the crawl-to-corpus
recipe end-to-end (WARC → text → quality columns)."""

from __future__ import annotations

import gzip

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.html import (
    extract_main_text,
    html_metadata,
    html_to_text,
)
from data_pipeline_project_using_telegram_and_aws_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc_responses,
)

PAGE = """<!DOCTYPE html><html lang="en-GB"><head>
<title>The &amp; Title</title>
<meta name="description" content="A test &quot;page&quot;">
<link rel="canonical" href="http://ex.com/page">
<style>body { color: red }</style>
<script>var x = "<p>not text</p>";</script>
</head><body>
<!-- a comment with <p>tags</p> inside -->
<h1>Heading</h1>
<p>First paragraph with <b>bold</b> and an
<a href="/x">inline link</a> inside prose that runs long enough.</p>
<div>Second block &mdash; with entities: 3 &lt; 5 &amp;&amp; 7 &gt; 2.</div>
</body></html>"""


def test_html_to_text_strips_and_decodes(spark):
    df = spark.createDataFrame([(PAGE,), (None,), ("plain text",)],
                               ["html"])
    got = [
        r["t"]
        for r in df.select(html_to_text("html").alias("t")).collect()
    ]
    text = got[0]
    assert "Heading" in text and "First paragraph" in text
    assert "not text" not in text  # script content gone
    assert "color: red" not in text  # style content gone
    assert "a comment" not in text  # comments gone
    assert "inline link" in text  # anchor TEXT preserved
    assert "3 < 5 && 7 > 2" in text  # entities decoded
    assert "— with entities" in text  # &mdash;
    assert "<" not in text.replace("3 < 5", "")  # no tags left
    assert "\n" in text  # block tags became newlines
    assert got[1] is None
    assert got[2] == "plain text"
    # plan: pure JVM projection — no Python stage
    plan = (
        df.select(html_to_text("html"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("BatchEvalPython", "ArrowEval", "MapInPandas"):
        assert node not in plan


def test_html_metadata_fields(spark):
    df = spark.createDataFrame([(PAGE,), ("<p>no head</p>",)], ["html"])
    rows = df.select(html_metadata("html").alias("m")).collect()
    m = rows[0]["m"]
    assert m["title"] == "The & Title"
    assert m["description"] == 'A test "page"'
    assert m["lang"] == "en-GB"
    assert m["canonical"] == "http://ex.com/page"
    empty = rows[1]["m"]
    assert all(empty[k] is None for k in
               ("title", "description", "lang", "canonical"))


def test_extract_main_text_drops_link_farms(spark):
    nav = "".join(
        f'<li><a href="/{i}">Section number {i} link</a></li>'
        for i in range(8)
    )
    prose = (
        "This is the actual article body, a long and link-sparse "
        "paragraph that any boilerplate heuristic must keep intact."
    )
    page = (
        f"<html><body><nav><ul>{nav}</ul></nav>"
        f"<p>{prose} See <a href='/ref'>one reference</a> here, "
        f"which stays well under the anchor-density bar.</p>"
        f"<footer><a href='/about'>About</a> | "
        f"<a href='/tos'>Terms</a></footer></body></html>"
    )
    df = spark.createDataFrame([(page,)], ["html"])
    out = extract_main_text(df).collect()[0]["main_text"]
    assert prose in out
    assert "Section number 3" not in out  # nav block dropped
    assert "Terms" not in out  # footer dropped
    assert "one reference" in out  # inline anchor text kept
    # a page that is ALL boilerplate extracts to NULL, not ""
    allnav = f"<html><body><nav>{nav}</nav></body></html>"
    df2 = spark.createDataFrame([(allnav,)], ["html"])
    assert extract_main_text(df2).collect()[0]["main_text"] is None


class _RefExtractor:
    """Independent text extractor on stdlib html.parser — the
    differential model for the regexp pipeline."""

    def text(self, html: str) -> str:
        from html.parser import HTMLParser

        drop = {"script", "style", "noscript", "svg", "head",
                "template"}
        block = set(
            "p div br li ul ol h1 h2 h3 h4 h5 h6 tr table section "
            "article header footer nav aside blockquote pre figure "
            "figcaption hr".split()
        )
        out = []
        depth = {"n": 0}

        class P(HTMLParser):
            def handle_starttag(self, tag, attrs):
                if tag in drop:
                    depth["n"] += 1
                if tag in block:
                    out.append("\n")

            def handle_endtag(self, tag):
                if tag in drop:
                    depth["n"] = max(0, depth["n"] - 1)
                if tag in block:
                    out.append("\n")

            def handle_data(self, data):
                if depth["n"] == 0:
                    out.append(data)

        P(convert_charrefs=True).feed(html)
        import re

        t = "".join(out)
        t = re.sub(r"[ \t\x0b\f\r]+", " ", t)
        t = re.sub(r" ?\n ?", "\n", t)
        t = re.sub(r"\n{2,}", "\n\n", t)
        return t.strip()


_words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "Straße", "héllo", "42"]),
    min_size=1, max_size=5,
).map(" ".join)


@st.composite
def _html_doc(draw):
    parts = []
    for _ in range(draw(st.integers(1, 4))):
        kind = draw(st.sampled_from(["p", "div", "h2", "li", "span"]))
        body = draw(_words)
        if draw(st.booleans()):
            body += draw(st.sampled_from([
                " &amp; more &lt;stuff&gt;",
                " &mdash; dash &Delta;&delta;",
                " &#8212; num &#x1F680; astral",
                " &nosuchentity; stays &#999999999; too-big",
                " tail&copy;",
            ]))
        parts.append(f"<{kind} class='c'>{body}</{kind}>")
    if draw(st.booleans()):
        parts.insert(0, "<script>ignored()</script>")
    if draw(st.booleans()):
        parts.append("<!-- note -->")
    return "<html><body>" + "".join(parts) + "</body></html>"


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(st.lists(_html_doc(), min_size=1, max_size=4))
def test_html_to_text_matches_stdlib_parser_model(spark, docs):
    df = spark.createDataFrame([(d,) for d in docs], ["html"])
    got = [
        r["t"]
        for r in df.select(html_to_text("html").alias("t")).collect()
    ]
    ref = _RefExtractor()
    assert got == [ref.text(d) for d in docs], docs


# ------------------------------------------------------------------ WARC


def _fixture_rows():
    return [
        ("http://ex.com/a", 200, "text/html; charset=utf-8",
         b"<html><body><p>Doc A body text</p></body></html>"),
        ("http://ex.com/img", 200, "image/x-portable-pixmap",
         b"P6\n1 1\n255\n\xff\x00\x00"),
        ("http://ex.com/gone", 404, "text/html", b"<p>not found</p>"),
    ]


def test_warc_roundtrip_and_quarantine(spark, tmp_path):
    p = str(tmp_path / "f.warc.gz")
    write_warc_responses(_fixture_rows(), p)
    rows = {
        r.target_uri: r for r in read_warc(spark, p).collect()
    }
    assert len(rows) == 3
    a = rows["http://ex.com/a"]
    assert a.warc_type == "response" and a.http_status == 200
    assert a.http_content_type.startswith("text/html")
    assert bytes(a.payload) == _fixture_rows()[0][3]
    assert a.parse_error is None
    assert rows["http://ex.com/gone"].http_status == 404
    # plain (non-gz) warc parses identically — rebuild the plain bytes
    # with an INDEPENDENT member walk (zlib directly, not the module's
    # splitter)
    raw = open(p, "rb").read()
    plain_parts = []
    import zlib as _z

    rest = raw
    while rest[:2] == b"\x1f\x8b":
        d = _z.decompressobj(wbits=47)
        plain_parts.append(d.decompress(rest))
        rest = d.unused_data
    pp = str(tmp_path / "f.warc")
    open(pp, "wb").write(b"".join(plain_parts))
    rows2 = {r.target_uri: r for r in read_warc(spark, pp).collect()}
    assert {
        u: bytes(r.payload) for u, r in rows2.items()
    } == {u: bytes(r.payload) for u, r in rows.items()}

    # corrupt one gzip member: that FILE degrades to an error row
    # (framing lost), never a task failure
    bad = bytearray(raw)
    bad[len(bad) // 2] ^= 0xFF
    pb = str(tmp_path / "bad.warc.gz")
    open(pb, "wb").write(bytes(bad))
    got = read_warc(spark, pb).collect()
    assert any(r.parse_error for r in got)

    # a record with a lying Content-Length quarantines as truncated
    torn = (
        b"WARC/1.0\r\nWARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:uuid:t>\r\nContent-Length: 999\r\n\r\n"
        b"short"
    )
    out = list(parse_warc_bytes(torn, "t"))
    assert len(out) == 1 and "truncated" in out[0]["parse_error"]


def test_html_metadata_attribute_order_and_quoting(spark):
    """r10 ADVICE: attribute order must not matter and unquoted values
    are legal HTML5 — <meta content="..." name="description"> counts."""
    pages = [
        # content BEFORE name, single quotes
        "<html><head><meta content='swapped order' "
        "name='description'></head></html>",
        # unquoted values both sides
        "<html><head><meta content=unquoted name=description>"
        "</head></html>",
        # canonical with href before rel
        "<html><head><link href='http://c.com/x' rel='canonical'>"
        "</head></html>",
        # data-name must NOT satisfy name=
        "<html><head><meta data-name='description' "
        "content='decoy'></head></html>",
        # lang unquoted on the html tag
        "<html lang=fr-CA><body>x</body></html>",
    ]
    df = spark.createDataFrame([(p,) for p in pages], ["html"])
    ms = [r["m"] for r in
          df.select(html_metadata("html").alias("m")).collect()]
    assert ms[0]["description"] == "swapped order"
    assert ms[1]["description"] == "unquoted"
    assert ms[2]["canonical"] == "http://c.com/x"
    assert ms[3]["description"] is None
    assert ms[4]["lang"] == "fr-CA"


def test_robots_noindex_attribute_order_and_quoting(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.html import (
        robots_noindex,
    )

    rows = [
        # content precedes name
        ("<meta content='noindex' name='robots'>", True),
        # unquoted everywhere
        ("<meta content=noindex,nofollow name=robots>", True),
        # the robots meta is NOT the first meta on the page
        ("<meta name='viewport' content='width=device-width'>"
         "<meta charset='utf-8'>"
         "<meta content='none' name='googlebot'>", True),
        # name=description with noindex-looking content: not a gate
        ("<meta content='noindex' name='description'>", False),
        # data-name decoy
        ("<meta data-name='robots' content='noindex'>", False),
    ]
    df = spark.createDataFrame(
        [(f"<html><head>{h}</head></html>",) for h, _ in rows], ["html"]
    )
    got = [r["n"] for r in
           df.select(robots_noindex("html").alias("n")).collect()]
    assert got == [w for _, w in rows]


def test_numeric_refs_surrogates_and_nul(spark):
    """r10 ADVICE: surrogate code points and &#0; must decode to a
    single U+FFFD (HTML5), not an invalid UTF-8 byte sequence."""
    df = spark.createDataFrame(
        [("a&#xD800;b&#0;c&#x10FFFF;d&#x110000;e",)], ["html"]
    )
    got = df.select(html_to_text("html").alias("t")).collect()[0]["t"]
    assert got == "a�b�c\U0010ffffd�e"


def test_http_payload_normalization(spark, tmp_path):
    """r10 ADVICE: chunked Transfer-Encoding, gzip Content-Encoding,
    and legacy charsets must be decoded (or quarantined), not cast
    blindly as UTF-8."""
    import gzip as _gz

    html_latin = "<p>Caf\xe9 cr\xe8me</p>".encode("iso-8859-1")
    html_plain = b"<p>chunked body</p>"
    chunked = (
        b"7\r\n<p>chun\r\n"
        + b"C\r\nked body</p>\r\n"
        + b"0\r\n\r\n"
    )
    gz_body = _gz.compress(b"<p>gzipped page</p>")
    bad_utf8 = b"<p>bad \xff byte</p>"

    def http(status, hdrs, body):
        h = "".join(f"{k}: {v}\r\n" for k, v in hdrs)
        return (
            f"HTTP/1.1 {status} OK\r\n{h}\r\n".encode() + body
        )

    msgs = {
        "latin1": http(200, [("Content-Type",
                              "text/html; charset=iso-8859-1")],
                       html_latin),
        "chunked": http(200, [("Content-Type", "text/html"),
                              ("Transfer-Encoding", "chunked")],
                        chunked),
        "gzipped": http(200, [("Content-Type", "text/html"),
                              ("Content-Encoding", "gzip")],
                        gz_body),
        "bad": http(200, [("Content-Type",
                           "text/html; charset=utf-8")], bad_utf8),
        "bom16": http(200, [("Content-Type", "text/html")],
                      "<p>utf16 page</p>".encode("utf-16")),
        "binary_gz": http(200, [("Content-Type",
                                 "application/octet-stream"),
                                ("Content-Encoding", "gzip")],
                          _gz.compress(b"\x00\x01binary")),
    }
    from data_pipeline_project_using_telegram_and_aws_spark.sources.warc import _split_http

    st_, ct, body, err = _split_http(msgs["latin1"])
    assert err is None and body.decode() == "<p>Café crème</p>"
    assert "iso-8859-1" in ct  # raw header preserved
    st_, ct, body, err = _split_http(msgs["chunked"])
    assert err is None and body == html_plain
    st_, ct, body, err = _split_http(msgs["gzipped"])
    assert err is None and body == b"<p>gzipped page</p>"
    st_, ct, body, err = _split_http(msgs["bad"])
    assert body is None and "undecodable" in err
    st_, ct, body, err = _split_http(msgs["bom16"])
    assert err is None and body.decode() == "<p>utf16 page</p>"
    st_, ct, body, err = _split_http(msgs["binary_gz"])
    assert err is None and body == b"\x00\x01binary"  # not transcoded

    # HTML5 prescan: charset declared ONLY in-document (no header
    # parameter) — both the <meta charset> and the http-equiv forms
    meta_page = ("<html><head><meta charset='iso-8859-1'></head>"
                 "<body><p>pr\xe9scan</p></body></html>"
                 ).encode("iso-8859-1")
    st_, ct, body, err = _split_http(
        http(200, [("Content-Type", "text/html")], meta_page))
    assert err is None and "préscan" in body.decode()
    equiv_page = ('<html><head><meta http-equiv="Content-Type" '
                  'content="text/html; charset=iso-8859-1"></head>'
                  "<body><p>\xe9quiv</p></body></html>"
                  ).encode("iso-8859-1")
    st_, ct, body, err = _split_http(
        http(200, [("Content-Type", "text/html")], equiv_page))
    assert err is None and "équiv" in body.decode()
    # the header parameter WINS over the in-document declaration
    st_, ct, body, err = _split_http(
        http(200, [("Content-Type", "text/html; charset=utf-8")],
             "<html><head><meta charset='iso-8859-1'></head>"
             "<body><p>héader wins</p></body></html>".encode()))
    assert err is None and "héader wins" in body.decode()

    # end-to-end through the streaming front door: the latin-1 page
    # lands in good with correct text; the bad-byte page quarantines
    from data_pipeline_project_using_telegram_and_aws_spark.streaming.crawl_ingest import (
        start_crawl_ingest_stream,
    )

    src = tmp_path / "landing"
    src.mkdir()
    write_warc_responses(
        [("http://l1.com/", 200, "text/html; charset=iso-8859-1",
          html_latin),
         ("http://bad.com/", 200, "text/html; charset=utf-8",
          bad_utf8)],
        str(src / "b.warc.gz"),
    )
    good, other, quar = (
        str(tmp_path / z) for z in ("good", "other", "quar")
    )
    start_crawl_ingest_stream(
        spark, str(src), good, other, quar, str(tmp_path / "ck")
    ).awaitTermination(120)
    g = spark.read.parquet(good).collect()
    q = spark.read.parquet(quar).collect()
    assert [r.url for r in g] == ["http://l1.com/"]
    assert g[0].text == "Café crème"
    assert len(q) == 1 and "undecodable" in q[0].reason


def test_warc_gz_record_offset_is_compressed_member_offset(tmp_path):
    """r10 ADVICE: for .warc.gz, record_offset must be the COMPRESSED
    member offset (the CDX seek convention): gzip-seeking to it and
    decompressing must yield exactly that record."""
    import zlib as _z

    p = str(tmp_path / "f.warc.gz")
    write_warc_responses(_fixture_rows(), p)
    raw = open(p, "rb").read()
    recs = list(parse_warc_bytes(raw, "f"))
    assert len(recs) == 3
    assert recs[0]["record_offset"] == 0
    for r in recs:
        off = r["record_offset"]
        assert raw[off : off + 2] == b"\x1f\x8b"  # member boundary
        d = _z.decompressobj(wbits=47)
        member = d.decompress(raw[off:])
        assert r["record_id"].encode() in member
    # plain .warc: offsets are the records' own byte positions
    plain = b""
    bounds = []
    rest = raw
    while rest[:2] == b"\x1f\x8b":
        d = _z.decompressobj(wbits=47)
        bounds.append(len(plain))
        plain += d.decompress(rest)
        rest = d.unused_data
    recs_plain = list(parse_warc_bytes(plain, "f"))
    assert [r["record_offset"] for r in recs_plain] == bounds


# ------------------------------------------- fuzz axis 18: WARC container
#
# The markup differential (axes above / test_differential_fuzz) covers
# the TEXT layer; this axis fuzzes the CONTAINER layer: random record
# mixes (charsets, content-encodings, chunked bodies, binary, non-200,
# non-response records), random packaging (one member per record — the
# spec layout —, all records in one member, plain .warc), and random
# truncation cuts. The model is built from the inputs we constructed,
# with normalization modeled independently (stdlib gzip/codecs, a
# test-side chunker).
#
# Pinned contracts (divergence-as-documented, like axes 14-17):
# - untruncated input parses to exactly the constructed records, text
#   payloads normalized to UTF-8, undecodable ones as parse_error rows;
# - a cut at a member boundary recovers every record before the cut;
# - a cut mid-member raises ValueError from parse_warc_bytes (read_warc
#   degrades it to a file-level quarantine row — also asserted);
# - .gz record_offsets always point at a gzip magic.


_rec_kinds = st.sampled_from(
    ["utf8", "latin1", "bad_utf8", "binary", "http404", "chunked_gz",
     "resource"]
)


def _build_record(i: int, kind: str):
    """(warc_member_bytes_plain, expected_row_dict). Construction is
    test-side and independent of sources/warc.py."""
    import gzip as _gz

    uri = f"http://fuzz/{i}"
    body_text = f"<p>doc {i} body é€</p>"

    def http(status, hdrs, body):
        h = "".join(f"{k}: {v}\r\n" for k, v in hdrs)
        return f"HTTP/1.1 {status} S\r\n{h}\r\n".encode() + body

    if kind == "utf8":
        msg = http(200, [("Content-Type", "text/html; charset=utf-8")],
                   body_text.encode())
        want = {"uri": uri, "status": 200, "payload": body_text.encode(),
                "err": None}
    elif kind == "latin1":
        msg = http(200, [("Content-Type", "text/html; charset=iso-8859-1")],
                   f"<p>doc {i} caf\xe9</p>".encode("iso-8859-1"))
        want = {"uri": uri, "status": 200,
                "payload": f"<p>doc {i} caf\xe9</p>".encode(), "err": None}
    elif kind == "bad_utf8":
        msg = http(200, [("Content-Type", "text/html; charset=utf-8")],
                   b"<p>\xff broken</p>")
        want = {"uri": uri, "status": 200, "payload": None,
                "err": "undecodable"}
    elif kind == "binary":
        blob = bytes([(i * 7 + k) % 256 for k in range(48)])
        msg = http(200, [("Content-Type", "application/octet-stream")],
                   blob)
        want = {"uri": uri, "status": 200, "payload": blob, "err": None}
    elif kind == "http404":
        msg = http(404, [("Content-Type", "text/html")], b"<p>gone</p>")
        want = {"uri": uri, "status": 404, "payload": b"<p>gone</p>",
                "err": None}
    elif kind == "chunked_gz":
        gz = _gz.compress(body_text.encode(), mtime=0)
        cut = min(11, len(gz) // 2)
        wire = (f"{cut:x}\r\n".encode() + gz[:cut] + b"\r\n"
                + f"{len(gz) - cut:x}\r\n".encode() + gz[cut:] + b"\r\n"
                + b"0\r\n\r\n")
        msg = http(200, [("Content-Type", "text/html"),
                         ("Content-Encoding", "gzip"),
                         ("Transfer-Encoding", "chunked")], wire)
        want = {"uri": uri, "status": 200, "payload": body_text.encode(),
                "err": None}
    else:  # resource (non-response record): payload passes through raw
        blob = f"resource {i}".encode()
        hdr = (
            "WARC/1.0\r\nWARC-Type: resource\r\n"
            f"WARC-Record-ID: <urn:uuid:r{i}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Type: text/plain\r\nContent-Length: {len(blob)}"
            "\r\n\r\n"
        ).encode()
        return hdr + blob + b"\r\n\r\n", {
            "uri": uri, "status": None, "payload": blob, "err": None
        }
    hdr = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:f{i}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(msg)}\r\n\r\n"
    ).encode()
    return hdr + msg + b"\r\n\r\n", want


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(
    st.lists(_rec_kinds, min_size=1, max_size=5),
    st.sampled_from(["member_per_record", "one_member", "plain"]),
    st.sampled_from(["none", "boundary", "mid_member"]),
    st.randoms(use_true_random=False),
)
def test_warc_container_fuzz(kinds, packaging, cut, rng):
    import gzip as _gz

    from data_pipeline_project_using_telegram_and_aws_spark.sources.warc import parse_warc_bytes

    built = [_build_record(i, k) for i, k in enumerate(kinds)]
    members = [m for m, _ in built]
    wants = [w for _, w in built]

    if packaging == "member_per_record":
        blobs = [_gz.compress(m, mtime=0) for m in members]
    elif packaging == "one_member":
        blobs = [_gz.compress(b"".join(members), mtime=0)]
    else:
        blobs = [b"".join(members)]
    raw = b"".join(blobs)

    n_keep = len(wants)
    expect_exception = False
    if cut == "boundary" and len(blobs) > 1:
        k = rng.randrange(1, len(blobs))
        raw = b"".join(blobs[:k])
        n_keep = k  # member_per_record: k members = k records
    elif cut == "mid_member":
        # cut strictly inside the final member/blob; keep >= 2 bytes
        # of a gzip member so the magic survives (a 1-byte prefix
        # degrades to the plain-warc path by design)
        last_start = len(raw) - len(blobs[-1])
        pos = rng.randrange(max(last_start + 1, 2), len(raw))
        raw = raw[:pos]
        expect_exception = packaging != "plain"
        # plain warc: a byte cut lands inside a record -> truncated /
        # framing-lost error rows, not an exception

    try:
        rows = list(parse_warc_bytes(raw, "fuzz"))
        raised = False
    except ValueError:
        raised = True
        rows = []
    if expect_exception:
        assert raised, (kinds, packaging, cut)
        # read_warc's quarantine contract: the exception class is what
        # its except-clause degrades to a file row; nothing to compare
        return
    if cut == "mid_member" and packaging == "plain":
        # sequential parse: row i is record i. Complete leading records
        # keep their own expected outcome (incl. per-record errors like
        # undecodable bodies, which do NOT stop the walk); the record
        # the cut landed in yields a truncation artifact that must END
        # the walk — unless the cut only shaved inter-record padding,
        # in which case everything parses
        assert not raised
        assert len(rows) <= len(wants)
        for idx, (got, want) in enumerate(zip(rows, wants)):
            if got["parse_error"] is None:
                assert got["target_uri"] == want["uri"]
                assert want["err"] is None
                assert got["payload"] == want["payload"]
            elif want["err"] and want["err"] in got["parse_error"]:
                assert got["target_uri"] == want["uri"]
            else:
                assert idx == len(rows) - 1, (rows, kinds)
        return
    assert not raised
    wants = wants[:n_keep]
    assert len(rows) == len(wants), (kinds, packaging, cut)
    for got, want in zip(rows, wants):
        assert got["target_uri"] == want["uri"]
        assert got["http_status"] == want["status"]
        if want["err"] is None:
            assert got["parse_error"] is None
            assert got["payload"] == want["payload"]
        else:
            assert want["err"] in (got["parse_error"] or "")
            assert got["payload"] is None
        if packaging != "plain":
            assert raw[got["record_offset"]:
                       got["record_offset"] + 2] == b"\x1f\x8b"


def test_crawl_to_corpus_recipe(spark, tmp_path):
    """The front of the 100 TB pipeline, end-to-end: WARC responses →
    html rows → visible text + metadata → quality-ready columns. Only
    the WARC split is Python; everything after is JVM columns."""
    prose = (
        "Alpha beta gamma delta epsilon zeta eta theta, a sentence "
        "long enough to clear the main-text block threshold easily."
    )
    pages = [
        (
            f"http://site{i}.com/x",
            200,
            "text/html",
            (
                f"<html lang='en'><head><title>T{i}</title></head>"
                f"<body><p>{prose} Number {i}.</p></body></html>"
            ).encode(),
        )
        for i in range(3)
    ]
    p = str(tmp_path / "crawl.warc.gz")
    write_warc_responses(pages, p)
    corpus = (
        read_warc(spark, p)
        .filter(
            (F.col("http_status") == 200)
            & F.col("http_content_type").startswith("text/html")
            & F.col("parse_error").isNull()
        )
        .select(
            "target_uri",
            F.col("payload").cast("string").alias("html"),
        )
        .select(
            "target_uri",
            html_to_text("html").alias("text"),
            html_metadata("html").alias("meta"),
        )
    )
    rows = {r.target_uri: r for r in corpus.collect()}
    assert len(rows) == 3
    assert rows["http://site1.com/x"].meta["title"] == "T1"
    assert prose in rows["http://site2.com/x"].text
    assert "<" not in rows["http://site0.com/x"].text


def test_streaming_crawl_front_door(spark, tmp_path):
    """WARC landing dir → good/other/quarantine zones with record
    conservation, replay-idempotent ingest_batch partitions, and
    checkpoint resume — the crawl twin of the media front door."""
    from data_pipeline_project_using_telegram_and_aws_spark.streaming.crawl_ingest import (
        start_crawl_ingest_stream,
    )

    src = tmp_path / "landing"
    src.mkdir()
    good, other, quar = (
        str(tmp_path / z) for z in ("good", "other", "quar")
    )
    ck = str(tmp_path / "ck")
    prose = (
        "A long enough and perfectly link-free paragraph of body "
        "prose for the extraction gate to keep without any fuss."
    )
    write_warc_responses(
        [
            ("http://a.com/", 200, "text/html",
             f"<html lang='en'><head><title>A</title></head>"
             f"<body><p>{prose}</p>"
             f"<p><a href='/next'>next</a> "
             f"<a href='skip' rel='nofollow'>skip</a> "
             f"<a href='http://b.com/abs#frag'>abs</a></p>"
             f"</body></html>".encode()),
            ("http://a.com/img", 200, "image/png", b"\x89PNGfake"),
            ("http://a.com/gone", 404, "text/html", b"<p>404</p>"),
        ],
        str(src / "b0.warc.gz"),
    )
    # a second file torn INSIDE its first gzip member (100 bytes into
    # a several-hundred-byte member): nothing salvageable, one file-
    # level quarantine row (a cut between members would instead
    # salvage the complete leading records — also correct, tested via
    # parse_warc_bytes directly above)
    raw = open(str(src / "b0.warc.gz"), "rb").read()
    open(str(src / "broken.warc.gz"), "wb").write(raw[:100])

    cdx = str(tmp_path / "cdx")
    start_crawl_ingest_stream(
        spark, str(src), good, other, quar, ck, cdx_path=cdx
    ).awaitTermination(120)
    g = spark.read.parquet(good).collect()
    o = spark.read.parquet(other).collect()
    q = spark.read.parquet(quar).collect()
    # CDX sidecar: every CLEAN response record of the batch indexed
    # (good + other zones; the torn file contributed only quarantine),
    # lengths completed from binaryFile file sizes, offsets seekable
    import gzip as _gz

    c = sorted(
        spark.read.parquet(cdx).collect(), key=lambda r: r.record_offset
    )
    assert [r.url for r in c] == [
        "http://a.com/", "http://a.com/img", "http://a.com/gone",
    ]
    assert [r.status for r in c] == [200, 200, 404]
    assert c[0].urlkey == "com,a)/"
    blob = open(str(src / "b0.warc.gz"), "rb").read()
    for r in c:
        piece = blob[r.record_offset:r.record_offset + r.record_length]
        assert piece[:2] == b"\x1f\x8b" and _gz.decompress(piece)
    assert c[-1].record_offset + c[-1].record_length == len(blob)
    assert [r.url for r in g] == ["http://a.com/"]
    assert g[0].meta["title"] == "A" and prose in g[0].text
    assert prose in g[0].main_text
    # outlinks resolved in-batch: relative resolved against the page
    # URL, fragment stripped, nofollow dropped
    assert sorted(g[0].outlinks) == [
        "http://a.com/next", "http://b.com/abs",
    ]
    assert {r.target_uri for r in o} == {
        "http://a.com/img", "http://a.com/gone",
    }
    assert len(q) >= 1 and all(r.reason for r in q)
    # conservation over the parseable file + the torn file's error rows
    assert len(g) + len(o) + (len(q)) >= 4

    # resume: a later landing flows only the new file
    write_warc_responses(
        [("http://b.com/", 200, "text/html",
          f"<html><body><p>{prose} Second page.</p></body>"
          f"</html>".encode())],
        str(src / "b1.warc.gz"),
    )
    start_crawl_ingest_stream(
        spark, str(src), good, other, quar, ck
    ).awaitTermination(120)
    g2 = spark.read.parquet(good)
    assert {r.url for r in g2.collect()} == {
        "http://a.com/", "http://b.com/",
    }
    assert {r.ingest_batch for r in g2.collect()} == {0, 1}


def test_robots_noindex_gate(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.html import (
        robots_noindex,
    )

    rows = [
        ("<html><head><meta name='robots' "
         "content='noindex, nofollow'></head></html>", True),
        ("<html><head><meta name=\"ROBOTS\" "
         "content=\"NONE\"></head></html>", True),
        ("<html><head><meta name='googlebot' "
         "content='noindex'></head></html>", True),
        ("<html><head><meta name='robots' "
         "content='index, follow'></head></html>", False),
        # 'noindexy' must not match on substring
        ("<html><head><meta name='robots' "
         "content='noindexy'></head></html>", False),
        ("<html><body>no meta at all</body></html>", False),
        (None, None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], ["html"])
    got = [
        r["n"]
        for r in df.select(robots_noindex("html").alias("n")).collect()
    ]
    assert got == [w for _, w in rows]


def test_web_corpus_recipe_end_to_end(spark, tmp_path):
    """The whole web path spliced into the existing engine: WARC
    landing → crawl front door → robots-noindex gate → canonical-URL
    dedup (normalize_url) → corpus curation → packing slots. Each
    stage is an existing pinned operator; this pins the SPLICE —
    column contracts line up and counts conserve across stages."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.curation import (
        curate_corpus,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.html import (
        robots_noindex,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.packing import (
        pack_sequences,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.urls import (
        normalize_url,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.streaming.crawl_ingest import (
        start_crawl_ingest_stream,
    )

    prose_a = (
        "Quality body prose with plenty of distinct and varied words "
        "so every curation gate passes it without complaint at all."
    )
    prose_b = (
        "Entirely different second document discussing oceanography, "
        "tidal harmonics, and sediment transport in estuarine zones."
    )

    def page(body, noindex=False, title="T"):
        meta = (
            "<meta name='robots' content='noindex'>" if noindex else ""
        )
        return (
            f"<html lang='en'><head><title>{title}</title>{meta}"
            f"</head><body><p>{body}</p></body></html>"
        ).encode()

    src = tmp_path / "landing"
    src.mkdir()
    write_warc_responses(
        [
            # same content under tracking-param variants: ONE survives
            ("http://a.com/doc?id=7&utm_source=tw", 200, "text/html",
             page(prose_a + " Alpha.")),
            ("http://A.com:80/doc/?utm_campaign=x&id=7", 200,
             "text/html", page(prose_a + " Alpha.")),
            ("http://b.com/x", 200, "text/html",
             page(prose_b + " Bravo.")),
            ("http://c.com/hidden", 200, "text/html",
             page(prose_a + " Charlie.", noindex=True)),
            ("http://d.com/tiny", 200, "text/html", page("tiny")),
        ],
        str(src / "b0.warc.gz"),
    )
    good, other, quar = (
        str(tmp_path / z) for z in ("good", "other", "quar")
    )
    start_crawl_ingest_stream(
        spark, str(src), good, other, quar, str(tmp_path / "ck")
    ).awaitTermination(120)

    pages = spark.read.parquet(good)
    assert pages.count() == 5
    # robots gate needs the raw html — recompute from the other zone?
    # No: gate BEFORE extraction in production; here the good zone
    # kept no html, so re-read records for the gate signal
    from data_pipeline_project_using_telegram_and_aws_spark.sources.warc import read_warc

    flags = (
        read_warc(spark, str(src / "b0.warc.gz"))
        .select(
            F.col("target_uri").alias("url"),
            robots_noindex(
                F.col("payload").cast("string")
            ).alias("noindex"),
        )
    )
    kept = (
        pages.join(flags, "url")
        .filter(~F.col("noindex"))
        .withColumn("canon_url", normalize_url("url"))
    )
    assert kept.count() == 4  # c.com/hidden gated out
    # canonical-URL dedup: the two a.com variants collapse to one
    deduped = (
        kept.withColumn(
            "__rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("canon_url")
                .orderBy("url")
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    assert deduped.count() == 3
    docs = deduped.select(
        F.xxhash64("canon_url").alias("doc_id"),
        F.col("text"),
        F.lit("en").alias("lang"),
    )
    curated, ledger = curate_corpus(docs, min_tokens=5)
    ids = {r.doc_id for r in curated.collect()}
    # the tiny page fails min_tokens; the two real pages survive
    assert len(ids) == 2
    reasons = {r.reason for r in ledger.collect()}
    assert any("min_tokens" in r or "short" in r for r in reasons), reasons
    packed = pack_sequences(curated, budget=64, n_shards=2)
    assert packed.count() == 2
    assert {"shard", "seq_id", "seq_offset"} <= set(packed.columns)


def test_crawl_loop_two_rounds(spark, tmp_path):
    """The full between-rounds loop the round-11 operators complete:
    round-1 WARC landing → good zone (text + outlinks) →
    build_frontier (robots-gated, crawled-set anti-join) → 'fetch' the
    frontier into a round-2 WARC → ingest → the frontier shrinks to
    only genuinely-new pages. Pins the splice of crawl_ingest + links
    + robots + urls end-to-end, including host/domain link-graph
    contraction."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.links import (
        build_frontier,
        link_graph,
        schedule_fetches,
    )
    from data_pipeline_project_using_telegram_and_aws_spark.operators.robots import parse_robots_txt
    from data_pipeline_project_using_telegram_and_aws_spark.streaming.crawl_ingest import (
        start_crawl_ingest_stream,
    )

    prose = (
        "A page body long enough for every gate with plenty of words "
        "to spare, describing an unremarkable but pleasant topic."
    )

    def page(body, links=()):
        a = "".join(f"<a href='{h}'>to {h}</a> " for h in links)
        return (
            f"<html><body><p>{body}</p><p>{a}</p></body></html>"
        ).encode()

    feed_xml = (
        '<?xml version="1.0"?><rss version="2.0"><channel>'
        "<title>A Feed</title><link>http://a.com/</link>"
        "<item><title>From feed</title>"
        "<link>http://b.com/fromfeed</link>"
        "<pubDate>Wed, 12 Aug 2026 09:00:00 GMT</pubDate></item>"
        "<item><title>Known</title>"
        "<link>http://a.com/2</link></item>"
        "</channel></rss>"
    ).encode()

    src = tmp_path / "landing"
    src.mkdir()
    write_warc_responses(
        [
            ("http://a.com/1", 200, "text/html",
             page(prose, ["http://a.com/2", "http://b.com/private/x",
                          "http://b.com/open"])),
            ("http://a.com/2", 200, "text/html",
             page(prose + " Two.", ["http://a.com/1"])),
            ("http://a.com/feed.xml", 200, "application/rss+xml",
             feed_xml),
        ],
        str(src / "r1.warc.gz"),
    )
    zones = {z: str(tmp_path / z) for z in ("good", "other", "quar")}
    start_crawl_ingest_stream(
        spark, str(src), zones["good"], zones["other"], zones["quar"],
        str(tmp_path / "ck"),
    ).awaitTermination(120)
    good1 = spark.read.parquet(zones["good"])
    assert good1.count() == 2

    rules = parse_robots_txt(
        spark.createDataFrame(
            [("b.com", "User-agent: *\nDisallow: /private\n")],
            "host string, body string",
        )
    )
    # feed responses land in the OTHER zone typed + payload-intact;
    # their entry links seed the frontier exactly like sitemap URLs
    from data_pipeline_project_using_telegram_and_aws_spark.operators.feeds import (
        feed_entries,
        feed_seeds,
    )

    feed_docs = (
        spark.read.parquet(zones["other"])
        .filter(F.col("http_content_type").startswith(
            "application/rss+xml"))
        .select(F.col("target_uri").alias("feed_url"),
                F.col("payload").cast("string").alias("body"))
    )
    # seeds carry the publish-recency priority (feed_seeds): the
    # round clock is one hour after the fromfeed entry's pubDate
    seeds = feed_seeds(feed_entries(feed_docs), now_s=1_786_528_800.0)
    frontier = build_frontier(
        good1, rules=rules, crawled=good1.select("url"), seeds=seeds
    )
    want_next = {"http://b.com/open", "http://b.com/fromfeed"}
    assert {r.url for r in frontier.collect()} == want_next
    # a.com/1 <-> a.com/2 already crawled (the feed's a.com/2 entry
    # dies at the same anti-join); /private robots-blocked

    # politeness: the frontier schedules against the hosts' robots
    # crawl-delays before fetching (operators/links.schedule_fetches)
    from data_pipeline_project_using_telegram_and_aws_spark.operators.robots import (
        robots_directives,
    )

    directives = robots_directives(
        spark.createDataFrame(
            [("b.com",
              "User-agent: *\nCrawl-delay: 2.5\nDisallow: /private\n")],
            "host string, body string",
        )
    )
    sched = {
        r.url: (r.crawl_delay, r.planned_offset_s)
        for r in schedule_fetches(
            frontier, directives, priority_col="priority"
        ).collect()
    }
    # both frontier urls are on b.com: one per crawl-delay slot, and
    # the feed entry with a RECENT pubDate outranks the undated
    # outlink for the host's first slot (publish-recency freshness)
    assert all(sched[u][0] == 2.5 for u in want_next)
    assert sched["http://b.com/fromfeed"][1] == 0.0
    assert sched["http://b.com/open"][1] == 2.5

    # round 2: 'fetch' the frontier, land it, resume the stream
    write_warc_responses(
        [(u, 200, "text/html", page(prose + " New.", []))
         for u in sorted(want_next)],
        str(src / "r2.warc.gz"),
    )
    start_crawl_ingest_stream(
        spark, str(src), zones["good"], zones["other"], zones["quar"],
        str(tmp_path / "ck"),
    ).awaitTermination(120)
    good2 = spark.read.parquet(zones["good"])
    assert {r.url for r in good2.collect()} == {
        "http://a.com/1", "http://a.com/2", "http://b.com/open",
        "http://b.com/fromfeed",
    }
    # after round 2 the frontier is dry (the new page links nowhere)
    f2 = build_frontier(good2, rules=rules, crawled=good2.select("url"))
    assert f2.count() == 0

    # host-granularity link graph contracts to site-level edges
    pages_df = good1.select(
        "url",
        F.concat(
            F.lit("<html><body>"),
            F.concat_ws(
                "", F.transform(
                    "outlinks",
                    lambda h: F.concat(F.lit("<a href='"), h,
                                       F.lit("'>x</a>")),
                )
            ),
            F.lit("</body></html>"),
        ).alias("html"),
    )
    hg = {(r.src, r.dst) for r in link_graph(
        pages_df, granularity="host"
    ).collect()}
    assert hg == {("a.com", "b.com")}  # intra-host edges collapse away

    # round 3 — the REVISIT side (operators/recrawl.py): refetch all
    # three pages, a.com/1 with CHANGED content; the fetch ledger is
    # the accumulated good zone (url x ingest_batch), digest = md5 of
    # the stored text, fetch_time = the round clock
    write_warc_responses(
        [
            ("http://a.com/1", 200, "text/html",
             page(prose + " Completely rewritten body.", [])),
            ("http://a.com/2", 200, "text/html",
             page(prose + " Two.", ["http://a.com/1"])),
            ("http://b.com/open", 200, "text/html",
             page(prose + " New.", [])),
        ],
        str(src / "r3.warc.gz"),
    )
    start_crawl_ingest_stream(
        spark, str(src), zones["good"], zones["other"], zones["quar"],
        str(tmp_path / "ck"),
    ).awaitTermination(120)
    from data_pipeline_project_using_telegram_and_aws_spark.operators.recrawl import (
        estimate_change_rates,
        schedule_revisits,
    )

    ledger = spark.read.parquet(zones["good"]).select(
        "url",
        (F.col("ingest_batch").cast("double") * 100.0).alias(
            "fetch_time"
        ),
        F.md5(F.col("text").cast("binary")).alias("digest"),
    )
    rates = estimate_change_rates(ledger)
    by_url = {r.url: r for r in rates.collect()}
    assert by_url["http://a.com/1"].n_changes == 1
    assert by_url["http://a.com/1"].change_rate > 0
    assert by_url["http://a.com/2"].change_rate == 0.0
    assert by_url["http://b.com/open"].change_rate == 0.0
    revisit = schedule_revisits(rates, now_s=400.0).collect()
    assert revisit[0].url == "http://a.com/1"  # the page that churns
    assert all(r.staleness_p == 0.0 for r in revisit[1:])


def test_surt_key_recipe(spark):
    """The documented SURT recipe: reversed lowercase host labels
    (www. stripped), lowercased path, sorted query; NULL for
    unparseable input."""
    from data_pipeline_project_using_telegram_and_aws_spark.sources.warc import surt_key

    cases = [
        ("http://www.Example.com/B?b=2&a=1", "com,example)/b?a=1&b=2"),
        ("https://sub.example.org/", "org,example,sub)/"),
        ("http://example.com", "com,example)/"),
        ("http://example.com/A/B/c.HTML", "com,example)/a/b/c.html"),
        ("not a url", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r.k for r in df.select(surt_key("url").alias("k")).collect()
    ]
    assert got == [k for _, k in cases]


def test_warc_cdx_seekable_index(spark, tmp_path):
    """CDX rows over a real .warc.gz: each (offset, length) slice of
    the physical file is a complete gzip member that decompresses to
    the record (the CommonCrawl seek contract), the digest is the
    sha1 of the stored payload, and the last record's length comes
    from the file size via warc_file_lengths."""
    import gzip
    import hashlib

    from data_pipeline_project_using_telegram_and_aws_spark.sources.warc import (
        read_warc,
        warc_cdx,
        warc_file_lengths,
        write_warc_responses,
    )

    p = str(tmp_path / "idx.warc.gz")
    rows = [
        ("http://www.example.com/B?b=2&a=1", 200, "text/html",
         b"<p>hello cdx</p>"),
        ("http://sub.example.org/path", 200, "text/plain", b"plain"),
        ("http://example.com/empty", 204, "text/plain", b""),
    ]
    write_warc_responses(rows, p)
    recs = read_warc(spark, p)
    cdx = warc_cdx(recs, warc_file_lengths(spark, p)).orderBy(
        "record_offset"
    )
    got = cdx.collect()
    assert [r.urlkey for r in got] == [
        "com,example)/b?a=1&b=2",
        "org,example,sub)/path",
        "com,example)/empty",
    ]
    assert all(r.timestamp == "20260101000000" for r in got)
    assert [r.mime for r in got] == ["text/html", "text/plain",
                                     "text/plain"]
    assert [r.status for r in got] == [200, 200, 204]
    # digests: sha1 of the stored (normalized = identity here) payload;
    # empty payload has no digest
    assert got[0].digest == hashlib.sha1(rows[0][3]).hexdigest()
    assert got[1].digest == hashlib.sha1(rows[1][3]).hexdigest()
    assert got[2].digest is None
    # offsets/lengths tile the file exactly and each slice is a
    # standalone gzip member containing its record
    blob = open(p, "rb").read()
    assert got[0].record_offset == 0
    for i, r in enumerate(got):
        assert r.record_length is not None and r.record_length > 0
        piece = blob[r.record_offset:r.record_offset + r.record_length]
        assert piece[:2] == b"\x1f\x8b"
        member = gzip.decompress(piece)
        assert f"WARC-Target-URI: {rows[i][0]}".encode() in member
        if i + 1 < len(got):
            assert (
                r.record_offset + r.record_length
                == got[i + 1].record_offset
            )
    assert got[-1].record_offset + got[-1].record_length == len(blob)
    # without file metadata the final record's length is NULL
    nolen = (
        warc_cdx(recs).orderBy("record_offset").collect()
    )
    assert nolen[-1].record_length is None
    assert [r.record_length for r in nolen[:-1]] == [
        r.record_length for r in got[:-1]
    ]


def test_surt_key_differential_generated_urls(spark):
    """surt_key vs an independently written Python SURT over
    component-generated URLs (hosts × paths × queries × ports ×
    case) — the recipe is the contract; the two implementations must
    agree byte-for-byte."""
    import itertools

    from data_pipeline_project_using_telegram_and_aws_spark.sources.warc import surt_key

    def py_surt(url):
        # independent implementation of the documented recipe
        from urllib.parse import urlsplit

        try:
            parts = urlsplit(url)
        except ValueError:
            return None
        host = (parts.hostname or "").lower()
        if not host:
            return None
        if host.startswith("www."):
            host = host[4:]
        key = ",".join(reversed(host.split("."))) + ")"
        path = (parts.path or "/").lower() or "/"
        key += path
        if parts.query:
            key += "?" + "&".join(sorted(parts.query.lower().split("&")))
        return key

    hosts = ["example.com", "WWW.Example.COM", "sub.www.example.org",
             "x.co.uk"]
    paths = ["", "/", "/A/b", "/idx.HTML"]
    queries = ["", "?b=2&a=1", "?Z=1&a=2&M=3"]
    urls = [
        f"http://{h}{p}{q}"
        for h, p, q in itertools.product(hosts, paths, queries)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r.k for r in df.select(surt_key("url").alias("k")).collect()
    ]
    want = [py_surt(u) for u in urls]
    assert got == want
