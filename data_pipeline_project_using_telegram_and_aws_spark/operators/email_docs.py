"""Email text extraction — RFC 5322/2045 messages (.eml) and mbox
mailboxes over opaque ``binary`` columns, stdlib ``email`` package
(north-star extension; the reference pipeline's webhook messages are
the same role — `Data_Pipeline_Project_using_Telegram_and_AWS.ipynb`
ingestion cell — at one-message scale; mail archives are a major
conversational-text corpus family).

Contract, stated:

- :func:`extract_email` parses ONE RFC 5322 message:
  - headers: subject / from / to (as ``recipients``) / date (RFC 2047 encoded-words
    decoded — ``=?utf-8?b?...?=`` and the Q form, any charset the
    stdlib knows), message_id;
  - body: the MIME tree walked in order; every ``text/plain`` leaf
    decoded per its Content-Transfer-Encoding (7bit/8bit/base64/
    quoted-printable) and charset, joined with blank lines. When the
    message carries NO plain part but does carry ``text/html``, the
    html is returned with ``is_markup`` true — the EPUB pattern: the
    JVM `operators/html.py` surface does the markup→text work.
  - attachments: counted (name + content-type), never decoded —
    binary attachments are media-pipeline work, not text;
  - a multipart/alternative group contributes its plain variant
    only (the walk's text/plain-first rule does this naturally).
- :func:`split_mbox` splits a classic mbox (``From `` separator
  lines at start-of-line, the mboxrd ``>From`` unquoting applied to
  body lines) into per-message byte slices — row-local, so a mailbox
  explodes into messages inside one Arrow batch.
- :func:`extract_emails` / :func:`read_mbox` are the standard slim
  (id, bytes) ``mapInPandas`` wrappers with error-row quarantine.

Defects (unparseable header section) raise ValueError; the stdlib
parser is deliberately lenient beyond that — mail in the wild is
dirty, and a leniency mismatch is a quality-gate question, not a
quarantine one.
"""

from __future__ import annotations

import email
import email.header
import re

from collections.abc import Iterator

import pandas as pd

__all__ = [
    "extract_email",
    "split_mbox",
    "extract_emails",
    "read_mbox",
    "EMAIL_TEXT_DDL",
]


def _decode_header(value) -> str | None:
    if value is None:
        return None
    try:
        parts = email.header.decode_header(str(value))
    except Exception:  # noqa: BLE001 — a header too broken to decode
        # is still data; return it raw
        return str(value)
    out = []
    for data, charset in parts:
        if isinstance(data, bytes):
            out.append(data.decode(charset or "ascii", "replace"))
        else:
            out.append(data)
    return "".join(out).strip() or None


def _leaf_text(part) -> str | None:
    payload = part.get_payload(decode=True)
    if payload is None:
        return None
    charset = part.get_content_charset() or "utf-8"
    try:
        got = payload.decode(charset, "replace")
    except LookupError:
        got = payload.decode("utf-8", "replace")
    # transport newlines are CRLF (RFC 5322); corpus text wants LF
    return got.replace("\r\n", "\n").replace("\r", "\n")


def extract_email(raw: bytes) -> dict:
    """One message → ``{text, is_markup, subject, sender, to, date,
    message_id, n_parts, n_attachments, attachment_names}`` (module
    contract)."""
    msg = email.message_from_bytes(raw)
    if not msg.keys():
        raise ValueError("no RFC 5322 headers found")
    plains: list[str] = []
    htmls: list[str] = []
    attachments: list[str] = []
    n_parts = 0
    for part in msg.walk():
        if part.is_multipart():
            continue
        n_parts += 1
        ctype = part.get_content_type()
        dispo = str(part.get("Content-Disposition", ""))
        is_attachment = dispo.lower().startswith("attachment") \
            or part.get_filename() is not None
        if is_attachment:
            attachments.append(
                f"{part.get_filename() or '(unnamed)'}"
                f" ({ctype})"
            )
            continue
        if ctype == "text/plain":
            got = _leaf_text(part)
            if got is not None:
                plains.append(got)
        elif ctype == "text/html":
            got = _leaf_text(part)
            if got is not None:
                htmls.append(got)
    if plains:
        text, is_markup = "\n\n".join(p.strip("\n") for p in plains) \
            .rstrip("\n"), False
    elif htmls:
        text, is_markup = "\n".join(htmls), True
    else:
        text, is_markup = "", False
    return {
        "text": text,
        "is_markup": is_markup,
        "subject": _decode_header(msg.get("Subject")),
        "sender": _decode_header(msg.get("From")),
        "recipients": _decode_header(msg.get("To")),
        "date": _decode_header(msg.get("Date")),
        "message_id": _decode_header(msg.get("Message-ID")),
        "n_parts": n_parts,
        "n_attachments": len(attachments),
        "attachment_names": "; ".join(attachments) or None,
    }


_MBOX_SEP = re.compile(rb"(?m)^From .*\r?\n")


def split_mbox(raw: bytes) -> list[bytes]:
    """Classic mbox → per-message byte slices. ``From `` lines at
    start-of-line separate messages; ``>From`` body quoting (mboxrd)
    is unescaped one level. A buffer with no separator is treated as
    ONE bare message (an .eml handed to the mbox path still works)."""
    seps = list(_MBOX_SEP.finditer(raw))
    if not seps:
        return [raw] if raw.strip() else []
    out = []
    for i, m in enumerate(seps):
        start = m.end()
        end = seps[i + 1].start() if i + 1 < len(seps) else len(raw)
        body = raw[start:end]
        body = re.sub(rb"(?m)^>(>*From )", rb"\1", body)
        out.append(body.rstrip(b"\r\n") + b"\n")
    return out


EMAIL_TEXT_DDL = (
    "doc_id long, msg_index int, text string, is_markup boolean, "
    "subject string, sender string, recipients string, date string, "
    "message_id string, n_parts int, n_attachments int, "
    "attachment_names string, error string"
)

_COLS = [f.split(" ")[0] for f in EMAIL_TEXT_DDL.split(", ")]


def _email_rows(split: bool):
    def rows(batch_iter) -> Iterator[pd.DataFrame]:
        for batch in batch_iter:
            out = []
            for doc_id, raw in zip(batch["doc_id"], batch["doc"]):
                data = bytes(raw) if raw is not None else b""
                try:
                    pieces = split_mbox(data) if split else [data]
                except Exception as e:  # noqa: BLE001 — quarantine
                    pieces = None
                    out.append(dict.fromkeys(_COLS) | {
                        "doc_id": doc_id, "msg_index": 0,
                        "error": f"{type(e).__name__}: {e}"[:200],
                    })
                if pieces is None:
                    continue
                for idx, piece in enumerate(pieces):
                    row = dict.fromkeys(_COLS)
                    row["doc_id"] = doc_id
                    row["msg_index"] = idx
                    try:
                        row.update(extract_email(piece))
                    except Exception as e:  # noqa: BLE001 — per-
                        # message quarantine, front-door doctrine
                        row["error"] = f"{type(e).__name__}: {e}"[:200]
                    out.append(row)
            yield pd.DataFrame(out, columns=_COLS)

    return rows


def _wrap(df, id_col: str, doc_col: str, split: bool):
    from pyspark.sql import functions as F

    slim = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(doc_col).alias("doc"),
    )
    return slim.mapInPandas(_email_rows(split), schema=EMAIL_TEXT_DDL)


def extract_emails(df, id_col: str = "doc_id", doc_col: str = "doc"):
    """One message per input row (eml bytes) — slim-projection
    ``mapInPandas``; failures land as error rows."""
    return _wrap(df, id_col, doc_col, split=False)


def read_mbox(df, id_col: str = "doc_id", doc_col: str = "doc"):
    """Mbox bytes per input row → one OUTPUT row per message
    (``msg_index`` orders them within a mailbox)."""
    return _wrap(df, id_col, doc_col, split=True)
