"""Email extraction (`operators/email_docs.py`): fixtures built with
hand-written RFC 5322/MIME byte literals (never the email package's
own generator where the parse path is under test)."""

from __future__ import annotations

import base64

import pytest

from data_pipeline_project_using_telegram_and_aws_spark.operators.email_docs import (
    extract_email,
    extract_emails,
    read_mbox,
    split_mbox,
)

SIMPLE = (b"From: Ada <ada@x.example>\r\n"
          b"To: Bo <bo@y.example>\r\n"
          b"Subject: Coffee notes\r\n"
          b"Date: Sat, 15 Aug 2026 10:00:00 +0000\r\n"
          b"Message-ID: <m1@x.example>\r\n"
          b"\r\n"
          b"Morning roast was excellent.\r\nSecond line.\r\n")


def _multipart(plain: bytes | None, html: bytes | None,
               attach: bytes | None = None) -> bytes:
    parts = []
    if plain is not None:
        parts.append(b"--BND\r\n"
                     b"Content-Type: text/plain; charset=utf-8\r\n"
                     b"Content-Transfer-Encoding: base64\r\n\r\n"
                     + base64.b64encode(plain) + b"\r\n")
    if html is not None:
        parts.append(b"--BND\r\n"
                     b"Content-Type: text/html; charset=utf-8\r\n\r\n"
                     + html + b"\r\n")
    if attach is not None:
        parts.append(b"--BND\r\n"
                     b"Content-Type: application/pdf\r\n"
                     b'Content-Disposition: attachment; '
                     b'filename="doc.pdf"\r\n'
                     b"Content-Transfer-Encoding: base64\r\n\r\n"
                     + base64.b64encode(attach) + b"\r\n")
    return (b"From: a@x\r\nTo: b@y\r\nSubject: multi\r\n"
            b"MIME-Version: 1.0\r\n"
            b'Content-Type: multipart/mixed; boundary="BND"\r\n\r\n'
            + b"".join(parts) + b"--BND--\r\n")


class TestExtractEmail:
    def test_simple_plain(self):
        got = extract_email(SIMPLE)
        assert got["text"] == "Morning roast was excellent.\nSecond line."
        assert got["subject"] == "Coffee notes"
        assert got["sender"] == "Ada <ada@x.example>"
        assert got["recipients"] == "Bo <bo@y.example>"
        assert got["message_id"] == "<m1@x.example>"
        assert got["is_markup"] is False
        assert got["n_attachments"] == 0

    def test_rfc2047_encoded_subject(self):
        b64 = base64.b64encode("Café ☕ update".encode()).decode()
        raw = (f"From: a@x\r\nSubject: =?utf-8?B?{b64}?=\r\n\r\n"
               "body\r\n").encode()
        assert extract_email(raw)["subject"] == "Café ☕ update"

    def test_quoted_printable_and_charset(self):
        raw = (b"From: a@x\r\n"
               b"Content-Type: text/plain; charset=iso-8859-1\r\n"
               b"Content-Transfer-Encoding: quoted-printable\r\n\r\n"
               b"caf=E9 cr=E8me\r\n")
        assert extract_email(raw)["text"] == "caf\xe9 cr\xe8me"

    def test_multipart_prefers_plain_counts_attachment(self):
        raw = _multipart(b"plain body", b"<p>html body</p>",
                         attach=b"%PDF-1.4 fake")
        got = extract_email(raw)
        assert got["text"] == "plain body"
        assert got["is_markup"] is False
        assert got["n_attachments"] == 1
        assert got["attachment_names"] == "doc.pdf (application/pdf)"
        assert got["n_parts"] == 3

    def test_html_only_is_markup(self):
        raw = _multipart(None, b"<p>only html here</p>")
        got = extract_email(raw)
        assert got["is_markup"] is True
        assert got["text"] == "<p>only html here</p>"

    def test_headerless_raises(self):
        with pytest.raises(ValueError, match="headers"):
            extract_email(b"just some text, no headers at all")


MBOX = (b"From ada@x.example Sat Aug 15 10:00:00 2026\n"
        b"From: ada@x.example\nSubject: one\n\n"
        b"first body\n>From quoted line\n\n"
        b"From bo@y.example Sat Aug 15 11:00:00 2026\n"
        b"From: bo@y.example\nSubject: two\n\nsecond body\n")


class TestMbox:
    def test_split_and_mboxrd_unquote(self):
        msgs = split_mbox(MBOX)
        assert len(msgs) == 2
        assert b"From quoted line" in msgs[0]
        assert b">From" not in msgs[0]
        assert msgs[1].startswith(b"From: bo@y.example")

    def test_bare_eml_passes_through(self):
        assert split_mbox(SIMPLE) == [SIMPLE]

    def test_empty(self):
        assert split_mbox(b"") == []


class TestSpark:
    def test_read_mbox_explodes_and_quarantines(self, spark):
        rows = [(1, bytearray(MBOX)), (2, bytearray(b""))]
        df = spark.createDataFrame(rows, "doc_id long, doc binary")
        out = read_mbox(df).collect()
        by_key = {(r.doc_id, r.msg_index): r for r in out}
        assert (1, 0) in by_key and (1, 1) in by_key
        assert by_key[(1, 0)].subject == "one"
        assert by_key[(1, 0)].text == "first body\nFrom quoted line"
        assert by_key[(1, 1)].subject == "two"
        assert (2, 0) not in by_key  # empty buffer: no messages
        assert len(out) == 2

    def test_extract_emails_with_html_composition(self, spark):
        from pyspark.sql import functions as F

        from data_pipeline_project_using_telegram_and_aws_spark.operators.html import (
            html_to_text,
        )

        rows = [(1, bytearray(_multipart(None, b"<p>rendered body</p>")))]
        df = spark.createDataFrame(rows, "doc_id long, doc binary")
        out = extract_emails(df).withColumn(
            "plain",
            F.when(F.col("is_markup"), html_to_text(F.col("text")))
            .otherwise(F.col("text")),
        ).collect()[0]
        assert out["plain"] == "rendered body"
