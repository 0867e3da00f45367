r"""RTF extraction (`operators/rtf.py`): hand-authored RTF per the
1.x spec — every expectation derived from the stated contract."""

from __future__ import annotations

import pytest

from data_pipeline_project_using_telegram_and_aws_spark.operators.rtf import (
    extract_rtf,
)


class TestRtf:
    def test_basic_paragraphs_and_groups(self):
        raw = (br"{\rtf1\ansi\ansicpg1252 Hello {\b bold} world."
               br"\par Second.}")
        got = extract_rtf(raw)
        assert got["text"] == "Hello bold world.\nSecond."
        assert got["n_parts"] == 2

    def test_header_tables_skipped(self):
        raw = (br"{\rtf1{\fonttbl{\f0\fswiss Helvetica;}}"
               br"{\colortbl;\red0\green0\blue0;}"
               br"{\stylesheet{\s0 Normal;}}Body text}")
        assert extract_rtf(raw)["text"] == "Body text"

    def test_hex_escape_uses_declared_codepage(self):
        got = extract_rtf(br"{\rtf1\ansicpg1252 caf\'e9}")
        assert got["text"] == "café"
        # same byte under cp1251 is a different letter — the declared
        # codepage governs (expectation from stdlib decode, not us)
        want = b"\xe9".decode("cp1251")
        got = extract_rtf(br"{\rtf1\ansicpg1251 x\'e9}")
        assert got["text"] == "x" + want

    def test_unicode_with_fallback_skip(self):
        got = extract_rtf(b"{\\rtf1\\uc1\\u1055 P\\u1088 r}")
        assert got["text"] == "Пр"  # П р, fallbacks skipped

    def test_uc0_keeps_following_text(self):
        got = extract_rtf(b"{\\rtf1\\uc0\\u8212 after}")
        assert got["text"] == "—after"

    def test_surrogate_pair_combines(self):
        # U+1F600 as the spec's two negative \u halves
        got = extract_rtf(b"{\\rtf1\\uc0\\u-10179 \\u-8704 x}")
        assert got["text"] == "\U0001f600x"

    def test_ignorable_destination_skipped(self):
        raw = br"{\rtf1{\*\generator Riched20 10.0;}visible}"
        assert extract_rtf(raw)["text"] == "visible"

    def test_info_metadata_extracted_not_shown(self):
        raw = (br"{\rtf1{\info{\title Quarterly}{\author Bo}"
               br"{\subject Coffee}}Body only}")
        got = extract_rtf(raw)
        assert got["text"] == "Body only"
        assert (got["title"], got["creator"], got["subject"]) == (
            "Quarterly", "Bo", "Coffee")

    def test_escaped_braces_and_backslash(self):
        got = extract_rtf(br"{\rtf1 a\{b\}c\\d}")
        assert got["text"] == "a{b}c\\d"

    def test_bin_skips_raw_bytes_with_braces(self):
        raw = b"{\\rtf1 before\\bin5 }}{\\\x00after}"
        assert extract_rtf(raw)["text"] == "beforeafter"

    def test_special_char_words(self):
        raw = (br"{\rtf1 a\emdash b\endash c\ldblquote d\rdblquote"
               br" e\bullet f\~g}")
        assert extract_rtf(raw)["text"] == \
            "a—b–c“d”e•f g"

    def test_table_cells_and_rows(self):
        raw = br"{\rtf1 A\cell B\cell\row C\cell D\cell\row }"
        assert extract_rtf(raw)["text"] == "A\tB\t\nC\tD\t"

    def test_raw_newlines_are_not_text(self):
        raw = b"{\\rtf1 spread\nover\r\nlines}"
        assert extract_rtf(raw)["text"] == "spreadoverlines"

    def test_not_rtf_raises(self):
        with pytest.raises(ValueError, match="rtf header"):
            extract_rtf(b"plain text, no header")


class TestDispatch:
    def test_sniff_and_unified_row(self):
        from data_pipeline_project_using_telegram_and_aws_spark.operators.documents import (
            extract_document,
            sniff_document,
        )

        raw = (br"{\rtf1{\info{\title T}{\author A}}"
               br"Hello rtf world.\par Done.}")
        assert sniff_document(raw) == "rtf"
        got = extract_document(raw)
        assert got["format"] == "rtf"
        assert got["text"] == "Hello rtf world.\nDone."
        assert got["title"] == "T" and got["creator"] == "A"
        assert got["is_markup"] is False
        assert got["n_units"] == 2


class TestAdversarialRegressions:
    """Round-11 self-review findings, pinned."""

    def test_negative_bin_terminates(self):
        import time

        t0 = time.time()
        got = extract_rtf(b"{\\rtf1 hello \\bin-10 world}")
        assert time.time() - t0 < 2
        assert got["text"] == "hello world"

    def test_info_subgroups_never_leak_into_body(self):
        raw = (br"{\rtf1{\info{\title My Title}"
               br"{\keywords secret internal tags}"
               br"{\doccomm reviewer note}}Body text.\par}")
        got = extract_rtf(raw)
        assert got["text"] == "Body text."
        assert got["title"] == "My Title"
        assert "secret" not in got["text"]
        assert "reviewer" not in got["text"]
