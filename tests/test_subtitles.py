"""Subtitle extraction (`operators/subtitles.py`): hand-authored SRT
and WebVTT per their public specs; expectations hand-derived."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.subtitles import (
    parse_srt_cues,
    parse_vtt_cues,
    subtitle_text,
)

SRT = (
    "1\r\n"
    "00:00:01,500 --> 00:00:03,000\r\n"
    "First line of dialog\r\n"
    "continues here\r\n"
    "\r\n"
    "2\r\n"
    "00:01:00,000 --> 00:01:02,250\r\n"
    "<i>Second cue, italic</i>\r\n"
    "\r\n"
)

VTT = (
    "WEBVTT\n"
    "\n"
    "NOTE this comment mentions 00:00:09.000 --> 00:00:10.000\n"
    "and must not become a cue\n"
    "\n"
    "intro\n"
    "00:01.000 --> 00:04.500 align:start position:10%\n"
    "<v Alice>Hello there</v>\n"
    "\n"
    "01:00:00.000 --> 01:00:02.000\n"
    "<c.loud>No hour optional here</c>\n"
)


def _one(spark, src, fn, **kw):
    df = spark.createDataFrame([(src,)], "src string")
    return df.select(fn(F.col("src"), **kw).alias("cues")) \
        .collect()[0]["cues"]


class TestSrt:
    def test_cues_times_and_multiline_text(self, spark):
        cues = _one(spark, SRT, parse_srt_cues)
        assert len(cues) == 2
        assert cues[0]["start_s"] == 1.5
        assert cues[0]["end_s"] == 3.0
        assert cues[0]["text"] == "First line of dialog\ncontinues here"
        assert cues[1]["start_s"] == 60.0
        assert cues[1]["end_s"] == 62.25
        assert cues[1]["text"] == "Second cue, italic"  # <i> stripped

    def test_transcript_join(self, spark):
        df = spark.createDataFrame([(SRT,)], "src string")
        got = df.select(
            subtitle_text(parse_srt_cues(F.col("src"))).alias("t")
        ).collect()[0]["t"]
        assert got == ("First line of dialog\ncontinues here\n"
                       "Second cue, italic")


class TestVtt:
    def test_cues_note_skipped_settings_ignored(self, spark):
        cues = _one(spark, VTT, parse_vtt_cues)
        assert len(cues) == 2  # the NOTE block's arrow is NOT a cue
        assert cues[0]["start_s"] == 1.0
        assert cues[0]["end_s"] == 4.5
        assert cues[0]["text"] == "Alice: Hello there"
        assert cues[1]["start_s"] == 3600.0
        assert cues[1]["text"] == "No hour optional here"

    def test_speakers_droppable(self, spark):
        cues = _one(spark, VTT, parse_vtt_cues, keep_speakers=False)
        assert cues[0]["text"] == "Hello there"

    def test_empty_and_no_cues(self, spark):
        assert _one(spark, "", parse_vtt_cues) == []
        assert _one(spark, "WEBVTT\n\nNOTE only\n", parse_vtt_cues) == []


class TestSecondReviewRegressions:
    """Round-11 second self-review findings over this surface."""

    def test_note_as_cue_payload_survives(self, spark):
        src = ("WEBVTT\n\n"
               "00:01.000 --> 00:02.000\n"
               "NOTE the difference here\n"
               "second line\n")
        cues = _one(spark, src, parse_vtt_cues)
        assert len(cues) == 1
        assert cues[0]["text"] == "NOTE the difference here\nsecond line"

    def test_hours_beyond_two_digits(self, spark):
        src = ("WEBVTT\n\n"
               "104:03:00.000 --> 104:03:02.000\n"
               "marathon stream\n")
        cues = _one(spark, src, parse_vtt_cues)
        assert cues[0]["start_s"] == 104 * 3600 + 3 * 60
        assert cues[0]["text"] == "marathon stream"

    def test_back_to_back_cues_degrade_to_two(self, spark):
        src = ("1\n00:00:01,000 --> 00:00:02,000\nline a\n"
               "2\n00:00:03,000 --> 00:00:04,000\nline b\n")
        cues = _one(spark, src, parse_srt_cues)
        assert len(cues) == 2
        assert cues[0]["text"] == "line a"  # next cue's index stripped
        assert cues[1]["text"] == "line b"
