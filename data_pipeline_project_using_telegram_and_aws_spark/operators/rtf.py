r"""RTF text extraction — a pure-Python control-word state machine
over the Rich Text Format 1.x spec (north-star extension; the
reference pipeline has no document surface). RTF is the legacy
word-processing interchange format: old corpora, court filings, and
email attachments still carry it.

What the machine implements, exactly (the stated contract):

- **Groups**: ``{``/``}`` push/pop the full formatting state
  (including the ``\ucN`` skip count and destination-skip flag — the
  two pieces of state that change extraction behavior).
- **Control words**: ``\word`` with an optional signed numeric
  parameter, terminated by one swallowed space (per spec). The ones
  that matter for text: ``\par``/``\line`` → newline, ``\tab`` →
  TAB, ``\emdash``/``\endash``/``\bullet``/``\lquote``/``\rquote``/
  ``\ldblquote``/``\rdblquote``/``\~`` (non-breaking space) → their
  characters, ``\_`` → hyphen.
- **Encoded characters**: ``\'xx`` hex escapes decode through the
  document's declared codepage (``\ansicpgN``, default cp1252);
  ``\uN`` emits the Unicode code point (negative N per the spec's
  16-bit two's complement) and then skips the following ``\ucN``
  fallback characters (default 1) — including when the fallback is
  itself a ``\'xx`` escape (one escape = one fallback character).
- **Destinations**: ``\fonttbl``/``\colortbl``/``\stylesheet``/
  ``\info``/``\pict``/``\object``/field instructions — and EVERY
  ``{\*\...}`` ignorable destination — contribute no visible text;
  their whole group is skipped. ``\info``'s ``\title``/``\author``
  subgroups are EXTRACTED as metadata on the way past (plain text
  inside them).
- **Binary**: ``\binN`` skips exactly N raw bytes (they may contain
  ``{`` and ``\`` — counting, not scanning).
- Escaped braces/backslash ``\{ \} \\`` are literal text.

Structural defects (not starting ``{\rtf``, unbalanced groups at
EOF beyond tolerance) raise ValueError — the front-door quarantine
contract. The extractor is wired into the unified document dispatch
(`operators/documents.py`), which routes by the ``{\rtf`` magic.
"""

from __future__ import annotations

import re

__all__ = ["extract_rtf"]

_CW_RE = re.compile(rb"\\([a-zA-Z]+)(-?\d+)? ?")

# control words that map to literal characters
_CHAR_WORDS = {
    b"par": "\n", b"line": "\n", b"tab": "\t",
    b"emdash": "\u2014", b"endash": "\u2013", b"bullet": "\u2022",
    b"lquote": "\u2018", b"rquote": "\u2019",
    b"ldblquote": "\u201c", b"rdblquote": "\u201d",
    b"sect": "\n", b"page": "\n\x0c\n", b"row": "\n", b"cell": "\t",
    b"nestrow": "\n", b"nestcell": "\t",
}

# destination control words whose group contributes no visible text
_SKIP_DESTS = {
    b"fonttbl", b"colortbl", b"stylesheet", b"pict", b"object",
    b"header", b"footer", b"headerl", b"headerr", b"headerf",
    b"footerl", b"footerr", b"footerf", b"fldinst", b"xe", b"tc",
    b"ftnsep", b"ftnsepc", b"themedata", b"datastore", b"generator",
    b"listtable", b"listoverridetable", b"revtbl",
}

# \info subgroups we surface as metadata (text collected, not shown)
_META_DESTS = {b"title": "title", b"author": "creator",
               b"subject": "subject", b"operator": None,
               b"company": None}


def extract_rtf(raw: bytes) -> dict:
    r"""``{text, n_parts, title, creator, subject}`` of one RTF
    buffer; ``n_parts`` counts paragraphs (``\par``). Raises
    ValueError on structural defects (module contract)."""
    if not raw.lstrip()[:5].startswith(b"{\\rtf"):
        raise ValueError("missing {\\rtf header")
    pos = 0
    n = len(raw)
    out: list[str] = []
    meta = {"title": None, "creator": None, "subject": None}

    # state: (uc_skip, dest) where dest is None (visible), a metadata
    # key (collecting), or "skip"
    uc = 1
    dest: str | None = None
    stack: list[tuple[int, str | None]] = []
    codepage = "cp1252"
    pending_skip = 0      # \uN fallback characters still to swallow
    high_surrogate: int | None = None  # astral chars ride two \uN
    meta_buf: list[str] = []
    in_info = False
    info_depth = -1

    def emit(s: str):
        if dest == "skip":
            return
        if dest is not None:
            meta_buf.append(s)
            return
        out.append(s)

    while pos < n:
        c = raw[pos]
        if c == 0x7B:  # {
            stack.append((uc, dest))
            pos += 1
            # an ignorable destination {\*\word ...}: skip wholesale
            if raw[pos:pos + 2] == b"\\*":
                if dest is None:
                    dest = "skip"
                pos += 2
            continue
        if c == 0x7D:  # }
            if dest is not None and dest not in ("skip",) and meta_buf:
                meta[dest] = "".join(meta_buf).strip() or None
                meta_buf = []
            if stack:
                uc, dest = stack.pop()
            if in_info and len(stack) < info_depth:
                in_info = False
            pos += 1
            continue
        if c == 0x5C:  # backslash
            nxt = raw[pos + 1:pos + 2]
            if nxt in (b"{", b"}", b"\\"):
                if pending_skip:
                    pending_skip -= 1
                else:
                    emit(nxt.decode("ascii"))
                pos += 2
                continue
            if nxt == b"'":
                if pending_skip:
                    pending_skip -= 1
                else:
                    try:
                        emit(bytes([int(raw[pos + 2:pos + 4], 16)])
                             .decode(codepage, "replace"))
                    except ValueError:
                        pass  # malformed hex escape: drop, keep going
                pos += 4
                continue
            if nxt == b"~":
                emit("\u00a0")
                pos += 2
                continue
            if nxt == b"_":
                emit("\u2011")
                pos += 2
                continue
            if nxt in (b"\n", b"\r"):
                emit("\n")
                pos += 2
                continue
            m = _CW_RE.match(raw, pos)
            if not m:
                pos += 2  # unknown control symbol: drop it
                continue
            word, param = m.group(1), m.group(2)
            pos = m.end()
            if word == b"bin":
                # raw bytes: count, not scan; a NEGATIVE parameter is
                # a crafted-input cursor rewind (infinite loop) — clamp
                pos += max(0, int(param or 0))
            elif word == b"u":
                cp = int(param or 0)
                if cp < 0:
                    cp += 65536
                if pending_skip:
                    pending_skip -= 1
                elif 0xD800 <= cp <= 0xDBFF:
                    high_surrogate = cp  # wait for the low half
                elif 0xDC00 <= cp <= 0xDFFF:
                    if high_surrogate is not None:
                        emit(chr(0x10000
                                 + ((high_surrogate - 0xD800) << 10)
                                 + (cp - 0xDC00)))
                        high_surrogate = None
                    else:
                        emit("\ufffd")  # unpaired low half
                else:
                    if high_surrogate is not None:
                        emit("\ufffd")  # unpaired high half
                        high_surrogate = None
                    emit(chr(cp))
                pending_skip += uc
            elif word == b"uc":
                uc = int(param or 0)
            elif word == b"ansicpg":
                try:
                    b"x".decode(f"cp{int(param)}")
                except (LookupError, ValueError):
                    pass
                else:
                    codepage = f"cp{int(param)}"
            elif word == b"info":
                in_info = True
                info_depth = len(stack)
                # the whole \info destination is metadata, never
                # body text: default to skip; the _META_DESTS
                # subgroups below override to COLLECT (\keywords,
                # \doccomm etc. must not leak into the corpus)
                dest = "skip"
            elif word in _SKIP_DESTS:
                if dest is None:
                    dest = "skip"
            elif in_info and word in _META_DESTS:
                key = _META_DESTS[word]
                dest = key if key is not None else "skip"
                meta_buf = []
            elif word in _CHAR_WORDS:
                emit(_CHAR_WORDS[word])
            # every other control word is formatting: no text
            continue
        # plain text run up to the next special byte
        end = pos
        while end < n and raw[end] not in b"\\{}\r\n":
            end += 1
        if end == pos:
            pos += 1  # bare \r \n are NOT text in RTF
            continue
        text = raw[pos:end].decode(codepage, "replace")
        if pending_skip:
            cut = min(pending_skip, len(text))
            pending_skip -= cut
            text = text[cut:]
        if text:
            emit(text)
        pos = end

    text = "".join(out)
    # normalize: spec says \par ENDS a paragraph; trailing one drops
    text = text.rstrip("\n")
    return {
        "text": text,
        "n_parts": text.count("\n") + 1 if text else 0,
        **meta,
    }
