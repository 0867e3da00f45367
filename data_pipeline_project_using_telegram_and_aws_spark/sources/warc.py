"""WARC (Web ARChive, ISO 28500) reader — the container format web
crawls actually ship in (CommonCrawl's raw corpus is .warc.gz), i.e.
the FRONT of a 100 TB pretraining pipeline. The reference ingests a
webhook's JSON one message at a time (ipynb:151); a crawl-scale
pipeline ingests archived HTTP exchanges in bulk, and this module is
that source connector, pure stdlib (gzip/zlib) + Spark binaryFile.

Format, exactly as read:
- a WARC file is a sequence of records; each record is a header block
  (``WARC/1.0`` version line + ``Name: value`` lines, CRLF line ends,
  terminated by an empty line) + ``Content-Length`` octets of body +
  CRLF CRLF.
- ``.warc.gz`` files are MULTI-MEMBER gzip: each record is its own
  gzip member (the spec's recommendation, so records are individually
  seekable). The reader decompresses member-by-member with
  ``zlib.decompressobj(wbits=47)`` and ``unused_data`` hand-off — a
  whole-file ``gzip.decompress`` would also work but hides torn
  members; per-member decode lets one corrupt record quarantine alone.
- ``response`` records carry an HTTP/1.x message as their body; the
  reader splits status line / headers / payload and surfaces status +
  Content-Type. The payload is NORMALIZED, not raw wire bytes:
  chunked Transfer-Encoding is de-chunked, gzip/deflate
  Content-Encoding is decompressed, and text/* bodies are transcoded
  to UTF-8 from their BOM or declared charset (legacy-charset pages
  are a double-digit share of real crawls — passing them through as
  "UTF-8" would silently corrupt the corpus). Bodies that fail any of
  those steps carry ``parse_error`` for quarantine routing. Non-text
  payloads stay opaque bytes for downstream decode (media_codecs).

Spark shape: ``spark.read.format("binaryFile")`` over the glob — one
file, one row, one task (matching how crawl processing actually
shards: the unit of parallelism is the WARC file, which CommonCrawl
sizes at ~1 GiB exactly so that per-file tasks are right-sized) —
then ONE ``mapInPandas`` stage splits records and yields slim typed
rows; the heavy payload bytes never visit the driver. Corrupt records
follow the front-door doctrine: they become (record_id NULL, error)
rows for the caller to quarantine, never a task failure.
"""

from __future__ import annotations

import io
import zlib

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA_DDL = (
    "warc_file string, record_offset long, warc_type string, "
    "record_id string, target_uri string, warc_date string, "
    "content_type string, http_status int, http_content_type string, "
    "payload binary, parse_error string"
)


def _split_gzip_members(raw: bytes):
    """Yield ``(member_bytes, offset, is_gzip)`` from a multi-member
    stream. For .warc.gz, ``offset`` is the COMPRESSED byte offset of
    the member in the file — the convention standard WARC tooling and
    the CommonCrawl CDX indexes use for seekable re-fetch. Non-gzip
    input yields the input itself once (plain .warc, offset 0)."""
    if raw[:2] != b"\x1f\x8b":
        yield raw, 0, False
        return
    pos = 0
    rest = raw
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=47)
        out = d.decompress(rest)
        if not d.eof:
            raise ValueError("warc.gz member truncated mid-stream")
        yield out, pos, True
        pos += len(rest) - len(d.unused_data)
        rest = d.unused_data
    if rest.strip(b"\x00"):
        raise ValueError(
            f"warc.gz trailing garbage after last member "
            f"({len(rest)} bytes, leading {rest[:4]!r})"
        )


def _parse_records(
    data: bytes,
    warc_file: str,
    base_offset: int = 0,
    member_offset: bool = False,
):
    """Yield row dicts for every WARC record in ``data`` (one
    decompressed member may hold one record — the .gz layout — or a
    whole file's worth — plain .warc). ``member_offset=True`` (the
    .gz path) reports ``base_offset`` — the member's COMPRESSED file
    offset, the seekable unit — for every record in the member;
    plain files report the record's own byte offset."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        row = {
            "warc_file": warc_file,
            "record_offset": (
                base_offset if member_offset else base_offset + pos
            ),
            "warc_type": None, "record_id": None, "target_uri": None,
            "warc_date": None, "content_type": None,
            "http_status": None, "http_content_type": None,
            "payload": None, "parse_error": None,
        }
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0 or not data[pos:].startswith(b"WARC/"):
            row["parse_error"] = (
                f"not a WARC record at offset {base_offset + pos} "
                f"(leading bytes {data[pos:pos + 8]!r})"
            )
            yield row
            return  # framing lost: cannot resync within this member
        headers = {}
        lines = data[pos:hdr_end].split(b"\r\n")
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            row["parse_error"] = "missing/invalid Content-Length"
            yield row
            return
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        row.update(
            warc_type=headers.get("warc-type"),
            record_id=headers.get("warc-record-id"),
            target_uri=headers.get("warc-target-uri"),
            warc_date=headers.get("warc-date"),
            content_type=headers.get("content-type"),
        )
        if len(body) < length:
            row["parse_error"] = (
                f"record truncated: Content-Length {length}, "
                f"{len(body)} present"
            )
            yield row
            return
        if row["warc_type"] == "response" and (
            row["content_type"] or ""
        ).startswith("application/http"):
            status, ctype, payload, err = _split_http(body)
            row.update(
                http_status=status, http_content_type=ctype,
                payload=payload, parse_error=err,
            )
        else:
            row["payload"] = body
        yield row


def _dechunk(body: bytes):
    """Decode a Transfer-Encoding: chunked body. Returns (bytes, err)."""
    out = []
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return None, "chunked body: missing chunk-size line"
        size_field = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_field, 16)
        except ValueError:
            return None, f"chunked body: bad chunk size {size_field!r}"
        if size == 0:
            return b"".join(out), None  # trailers (if any) discarded
        chunk = body[eol + 2 : eol + 2 + size]
        if len(chunk) < size:
            return None, (
                f"chunked body truncated: chunk wants {size}, "
                f"{len(chunk)} present"
            )
        out.append(chunk)
        pos = eol + 2 + size + 2  # skip chunk + trailing CRLF


_CHARSET_RE = None  # compiled lazily (module import stays light)


def _meta_charset_prescan(body: bytes) -> str | None:
    """The HTML5 encoding-sniffing prescan, scoped to its common
    forms: scan the first 1024 bytes for ``<meta charset=...>`` or
    ``<meta http-equiv="content-type" content="...; charset=...">``
    (ASCII-superset byte patterns, per the spec's prescan which runs
    before any decoding). Returns the declared name or None."""
    import re

    head = body[:1024]
    m = re.search(
        rb"<meta[^>]+charset\s*=\s*[\"']?\s*([a-zA-Z0-9_][a-zA-Z0-9._-]*)",
        head,
        re.IGNORECASE,
    )
    if m:
        return m.group(1).decode("ascii", "replace")
    return None


def _decode_text_payload(body: bytes, ctype: str):
    """Transcode a text/* payload to UTF-8 bytes using (precedence
    order, per HTML5 encoding sniffing) a BOM if present, else the
    Content-Type charset parameter, else — for HTML — the in-document
    ``<meta charset>`` prescan over the first 1024 bytes, else UTF-8.
    Returns (utf8_bytes, err) — undecodable bodies error for the
    caller to quarantine rather than entering the corpus as
    mojibake."""
    import codecs
    import re

    global _CHARSET_RE
    if _CHARSET_RE is None:
        _CHARSET_RE = re.compile(
            r"charset\s*=\s*\"?([^\s;\"']+)", re.IGNORECASE
        )
    if body.startswith(codecs.BOM_UTF8):
        charset, body = "utf-8", body[3:]
    elif body.startswith(codecs.BOM_UTF16_LE) or body.startswith(
        codecs.BOM_UTF16_BE
    ):
        charset = "utf-16"  # stdlib consumes the BOM itself
    else:
        m = _CHARSET_RE.search(ctype or "")
        charset = m.group(1).strip().rstrip(";,") if m else None
        if charset is None and "html" in (ctype or "").lower():
            charset = _meta_charset_prescan(body)
        if charset is None:
            charset = "utf-8"
    try:
        text = body.decode(charset)
    except LookupError:
        return None, f"unknown charset {charset!r}"
    except (UnicodeDecodeError, ValueError) as e:
        return None, f"undecodable {charset} body: {str(e)[:120]}"
    if charset.replace("_", "-").lower() in ("utf-8", "utf8", "u8"):
        return body, None  # already UTF-8 and now validated: no copy
    return text.encode("utf-8"), None


def _split_http(msg: bytes):
    """(status, content_type, payload, error) from an HTTP/1.x
    response message. The payload is NORMALIZED for downstream use:
    Transfer-Encoding chunked is de-chunked, Content-Encoding
    gzip/x-gzip/deflate is decompressed, and text/* bodies are
    transcoded from their declared charset (or BOM) to UTF-8 bytes —
    so ``payload.cast("string")`` downstream is always correct.
    Any step failing yields an ``error`` for quarantine routing; the
    raw Content-Type header (with its charset parameter) is surfaced
    unchanged."""
    hdr_end = msg.find(b"\r\n\r\n")
    if hdr_end < 0 or not msg.startswith(b"HTTP/"):
        return None, None, None, (
            f"http response malformed (leading bytes {msg[:8]!r})"
        )
    lines = msg[:hdr_end].split(b"\r\n")
    parts = lines[0].split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, None, f"http status line {lines[0]!r}"
    headers = {}
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode("latin-1")] = (
            v.strip().decode("latin-1")
        )
    ctype = headers.get("content-type")
    body = msg[hdr_end + 4 :]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body, err = _dechunk(body)
        if err:
            return status, ctype, None, err
    enc = headers.get("content-encoding", "").strip().lower()
    if enc in ("gzip", "x-gzip", "deflate"):
        try:
            # wbits=47 auto-detects gzip and zlib wrappers; raw
            # deflate (a known server misbehavior) retried at -15
            try:
                body = zlib.decompress(body, 47)
            except zlib.error:
                body = zlib.decompress(body, -15)
        except zlib.error as e:
            return status, ctype, None, (
                f"content-encoding {enc}: {str(e)[:120]}"
            )
    elif enc not in ("", "identity"):
        return status, ctype, None, (
            f"unsupported content-encoding {enc!r}"
        )
    if (ctype or "").strip().lower().startswith("text/"):
        body, err = _decode_text_payload(body, ctype)
        if err:
            return status, ctype, None, err
    return status, ctype, body, None


def parse_warc_bytes(raw: bytes, warc_file: str = ""):
    """All records of one (possibly multi-member gzip) WARC file —
    the driver-free core, also usable standalone in tests.
    ``record_offset`` is the gzip member's compressed file offset for
    .warc.gz input (the CDX-index seek convention) and the record's
    own byte offset for plain .warc."""
    for member, offset, is_gz in _split_gzip_members(raw):
        yield from _parse_records(
            member, warc_file, offset, member_offset=is_gz
        )


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC files → one typed row per record (WARC_SCHEMA_DDL).
    Corrupt records/members surface as ``parse_error`` rows — filter
    them into a quarantine zone, front-door style. One Python stage
    (the documented Arrow decode path); everything after is plain
    columns."""
    binary = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )

    def split(batches):
        import pandas as pd

        cols = [f.split(" ")[0] for f in WARC_SCHEMA_DDL.split(", ")]
        for batch in batches:
            out = []
            for path, content in zip(batch["path"], batch["content"]):
                raw = bytes(content)
                try:
                    out.extend(parse_warc_bytes(raw, path))
                except Exception as e:  # noqa: BLE001 — quarantine
                    # policy: zlib.error on a corrupt member, or any
                    # parser bug, degrades to a per-FILE error row,
                    # never a task failure
                    out.append(
                        dict.fromkeys(cols) | {
                            "warc_file": path,
                            "record_offset": 0,
                            "parse_error": (
                                f"{type(e).__name__}: {e}"[:200]
                            ),
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return binary.mapInPandas(split, WARC_SCHEMA_DDL)


def write_warc_responses(rows, out_path: str) -> None:
    """Test/fixture-side WARC writer: (uri, status, content_type,
    payload) tuples → a multi-member .warc.gz file (one gzip member
    per record, the spec layout). Deliberately independent of the
    reader's parsing (builds bytes by hand) so round-trip tests are
    meaningful."""
    import gzip

    buf = io.BytesIO()
    for i, (uri, status, ctype, payload) in enumerate(rows):
        http = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode() + payload
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "WARC-Date: 2026-01-01T00:00:00Z\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        member = hdr + http + b"\r\n\r\n"
        buf.write(gzip.compress(member))
    with open(out_path, "wb") as f:
        f.write(buf.getvalue())


# ---------------------------------------------------------------------------
# CDX seek index — the interchange format public crawl tooling uses to
# find a record inside a .warc.gz without scanning it (CommonCrawl
# publishes exactly this next to its corpus). Everything below is pure
# JVM column work over `read_warc` output.


def surt_key(url) -> "Column":
    """Sort-friendly URI Reordering Transform key for CDX indexes:
    ``com,example)/path?a=1&b=2`` — reversed lowercase host labels
    (leading ``www.`` stripped), then ``)``, then the lowercased path,
    then the query with its parameters SORTED. URL canonicalization
    has no universal standard, so — like `urls.normalize_url` — the
    recipe itself is the documented contract: keys are stable across
    runs, which is what index joins and range scans need. NULL for
    unparseable URLs. Zero Python: host/path/query come from
    ``try_parse_url``, the label reversal and query sort are array
    HOFs."""
    from pyspark.sql import functions as F

    from ..operators.urls import url_host

    url = F.col(url) if isinstance(url, str) else url
    host = F.regexp_replace(url_host(url), r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.lower(
        F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("/"))
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.try_parse_url(url, F.lit("QUERY"))
    sorted_q = F.array_join(
        F.array_sort(F.split(F.lower(query), "&")), "&"
    )
    return F.when(host.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(
            rev,
            F.lit(")"),
            path,
            F.when(
                query.isNotNull() & (query != ""),
                F.concat(F.lit("?"), sorted_q),
            ).otherwise(F.lit("")),
        )
    )


def warc_file_lengths(spark: SparkSession, path_glob: str) -> DataFrame:
    """(warc_file, file_length) from binaryFile METADATA — the content
    column is never selected, so no bytes are read. Feed to
    :func:`warc_cdx` so each file's last record gets a length too."""
    from pyspark.sql import functions as F

    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select(
            F.col("path").alias("warc_file"),
            F.col("length").alias("file_length"),
        )
    )


def warc_cdx(
    records: DataFrame, file_lengths: DataFrame | None = None
) -> DataFrame:
    """CDX(J)-shaped seek index over `read_warc` output: one row per
    clean ``response`` record with ``(urlkey, timestamp, url, mime,
    status, digest, record_offset, record_length, warc_file)``.

    - ``urlkey`` — :func:`surt_key` of the target URI (range-scan /
      join key, the CDX sort order);
    - ``timestamp`` — the 14-digit ``yyyyMMddHHmmss`` capture time
      from ``WARC-Date`` (the CDX convention);
    - ``digest`` — sha1 hex of the stored (normalized) payload, NULL
      for empty payloads; stated contract: this fingerprints what the
      ENGINE stores (post chunk/encoding/charset normalization), not
      the original wire bytes, so it is a dedup/validation key for
      corpus consumers rather than a wire-replay checksum;
    - ``record_offset`` — as produced by `read_warc`: the gzip
      member's COMPRESSED file offset for .warc.gz (seek + inflate
      recovers the record), the record's byte offset for plain .warc;
    - ``record_length`` — distance to the next record's offset within
      the same file (one ``lead`` window, file-keyed); the file's
      last record needs the physical file size — join
      :func:`warc_file_lengths` in, else it stays NULL.

    Plan shape: pure projections + one window partitioned by
    ``warc_file`` (the natural shard key — each file's index rows come
    from one task's worth of data) + an optional broadcast-sized join
    on file metadata. Sorting the output by ``(urlkey, timestamp)``
    before writing is the CDX file convention and is left to the
    writer."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    resp = records.filter(
        F.col("parse_error").isNull()
        & (F.lower(F.col("warc_type")) == "response")
    )
    nxt = F.lead("record_offset").over(
        Window.partitionBy("warc_file").orderBy("record_offset")
    )
    out = resp.select(
        surt_key(F.col("target_uri")).alias("urlkey"),
        F.substring(
            F.regexp_replace("warc_date", r"[^0-9]", ""), 1, 14
        ).alias("timestamp"),
        F.col("target_uri").alias("url"),
        F.trim(
            F.lower(F.element_at(F.split("http_content_type", ";"), 1))
        ).alias("mime"),
        F.col("http_status").alias("status"),
        F.when(
            F.col("payload").isNotNull() & (F.length("payload") > 0),
            F.sha1("payload"),
        ).alias("digest"),
        "record_offset",
        nxt.alias("__next"),
        "warc_file",
    )
    if file_lengths is not None:
        out = out.join(F.broadcast(file_lengths), "warc_file", "left")
        end = F.coalesce("__next", "file_length")
    else:
        end = F.col("__next")
    return out.select(
        "urlkey", "timestamp", "url", "mime", "status", "digest",
        "record_offset",
        (end - F.col("record_offset")).alias("record_length"),
        "warc_file",
    )
