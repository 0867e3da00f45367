"""Subtitle/transcript extraction — SRT and WebVTT as JVM column
expressions (north-star extension; transcripts are a major
conversational-text corpus family, and the cue timestamps are what
aligns them with the audio surface in `operators/flac.py`/
`media_codecs.py`).

Everything is ``pyspark.sql.functions`` — regexp folds and HOF
transforms inside codegen, zero Python. Contract, stated:

- :func:`parse_srt_cues` / :func:`parse_vtt_cues` — one ARRAY column
  of ``struct(start_s double, end_s double, text string)`` per
  document, cue order preserved. SRT cues are index + ``HH:MM:SS,mmm
  --> HH:MM:SS,mmm`` + text lines; VTT cues are ``[id]`` +
  ``HH:MM:SS.mmm --> HH:MM:SS.mmm [settings]`` + text (the optional
  hour field and cue settings both handled). Styling strips: VTT
  voice/class/lang tags (``<v Name>``, ``<c.loud>``, ``<i>``, …) and
  the SRT b/i/u/font tags; a voice tag's speaker name becomes a
  ``Name: `` prefix (the dialog-corpus convention) when
  ``keep_speakers``.
- :func:`subtitle_text` — the cue texts newline-joined: the plain
  transcript for the text pipeline.
- NOTE blocks, STYLE/REGION blocks, and the WEBVTT header line are
  not cues and contribute nothing.

Explode the cue array for a cue-level table (start/end per row) —
``F.explode`` is the caller's one extra line, deliberately not
wrapped here.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["parse_srt_cues", "parse_vtt_cues", "subtitle_text"]

# HH:MM:SS,mmm (SRT) / [HH:]MM:SS.mmm (VTT)
_SRT_TIME = r"(\d{1,4}):(\d{2}):(\d{2}),(\d{3})"
_VTT_TIME = r"(?:(\d{1,4}):)?(\d{2}):(\d{2})\.(\d{3})"


def _hms_to_seconds(h: Column, m: Column, s: Column, ms: Column) -> Column:
    # the hour group is optional in VTT: an absent group extracts ""
    # and ANSI cast would throw — nullif first, then default to 0
    def num(c: Column) -> Column:
        return F.coalesce(F.nullif(c, F.lit("")).cast("double"),
                          F.lit(0.0))

    return num(h) * 3600 + num(m) * 60 + num(s) + num(ms) / 1000.0


def _strip_tags(text: Column, keep_speakers: bool) -> Column:
    # <v Speaker Name> ... (</v> optional) — the speaker prefix is
    # the dialog convention; drop it when not wanted
    if keep_speakers:
        text = F.regexp_replace(
            text, r"<v(?:\.[\w.]+)?[ \t]+([^>]*)>", "$1: "
        )
    else:
        text = F.regexp_replace(text, r"<v(?:\.[\w.]+)?[ \t]+[^>]*>", "")
    # every other angle tag (c/i/b/u/lang/ruby/font, closers, timed
    # word tags like <00:00:01.000>) strips to its content
    text = F.regexp_replace(text, r"</?[\w.:%-]+(?:[ \t][^>]*)?>", "")
    return F.trim(text)


def _cues(col: Column, time_re: str,
          keep_speakers: bool) -> Column:
    """Shared shape: find every ``TIME --> TIME<tail>`` header, pair
    it with the text up to the next blank line."""
    # cue text: lines up to the next blank line that are NOT
    # themselves timing lines — back-to-back cues missing their
    # blank separator degrade to separate cues instead of fusing
    # (the following cue's bare SRT index line is stripped from the
    # captured tail below)
    block_re = (
        time_re + r"[ \t]*-->[ \t]*" + time_re
        + r"[^\n]*\n((?:(?!\n)(?![^\n]*-->)[^\n]*\n?)*)"
    )
    blocks = F.regexp_extract_all(col, F.lit(block_re), F.lit(0))
    time_groups = 4

    def cue(block: Column):
        start = _hms_to_seconds(*[
            F.regexp_extract(block, block_re, i + 1)
            for i in range(time_groups)
        ])
        end = _hms_to_seconds(*[
            F.regexp_extract(block, block_re, time_groups + i + 1)
            for i in range(time_groups)
        ])
        raw_text = F.regexp_extract(block, block_re,
                                    2 * time_groups + 1)
        return F.struct(
            start.alias("start_s"),
            end.alias("end_s"),
            _strip_tags(
                F.regexp_replace(
                    # a trailing bare-integer line is the NEXT cue's
                    # SRT index when the blank separator is missing
                    F.regexp_replace(raw_text, r"\n\d+[ \t]*\n?$", ""),
                    r"\n+$", "",
                ), keep_speakers
            ).alias("text"),
        )

    return F.transform(blocks, cue)


def parse_srt_cues(source, keep_speakers: bool = True) -> Column:
    """SRT → array<struct(start_s, end_s, text)> (module contract)."""
    col = source if isinstance(source, Column) else F.col(source)
    col = F.regexp_replace(col, r"\r\n?", "\n")
    return _cues(col, _SRT_TIME, keep_speakers)


def parse_vtt_cues(source, keep_speakers: bool = True) -> Column:
    """WebVTT → array<struct(start_s, end_s, text)>; NOTE/STYLE/
    REGION blocks and the header are ignored (module contract)."""
    col = source if isinstance(source, Column) else F.col(source)
    col = F.regexp_replace(col, r"\r\n?", "\n")
    # NOTE/STYLE/REGION introduce a block only at file start or
    # after a blank line (per spec); a cue PAYLOAD line starting
    # with 'NOTE' is ordinary dialog and must survive
    col = F.regexp_replace(
        col,
        r"(?:\A|(?<=\n\n))(?:NOTE|STYLE|REGION)\b"
        r"(?:[^\n]*\n)(?:(?!\n)[^\n]*\n?)*",
        "",
    )
    return _cues(col, _VTT_TIME, keep_speakers)


def subtitle_text(cues: Column) -> Column:
    """Cue array → plain transcript (non-empty texts, one per line).
    Feed this to the text pipeline; keep the array for alignment."""
    return F.array_join(
        F.filter(F.transform(cues, lambda c: c.getField("text")),
                 lambda t: t != ""),
        "\n",
    )
