# -*- coding: utf-8 -*-
"""SSA/ASS/VTT/MicroDVD format layer: parse, compose, cross-format, styles
(parity targets: reference subtitle_parser.py:116-134 format dispatch,
generic_subtitles.py:134-161 cross-format write with SSA styles/info kept)."""
import os

import pytest

from ffsubsync_tpu.cli import make_parser
from ffsubsync_tpu.subs import formats, ssa_format
from ffsubsync_tpu.sync import run

ASS_TEXT = """[Script Info]
Title: Test Script
ScriptType: v4.00+
PlayResX: 640

[V4+ Styles]
Format: Name, Fontname, Fontsize, PrimaryColour, SecondaryColour, OutlineColour, BackColour, Bold, Italic, Underline, StrikeOut, ScaleX, ScaleY, Spacing, Angle, BorderStyle, Outline, Shadow, Alignment, MarginL, MarginR, MarginV, Encoding
Style: Default,Arial,20,&H00FFFFFF,&H000000FF,&H00000000,&H00000000,0,0,0,0,100,100,0,0,1,2,0,2,10,10,10,1
Style: Sign,Verdana,16,&H00FFFF00,&H000000FF,&H00000000,&H00000000,1,0,0,0,100,100,0,0,1,2,0,8,10,10,10,1

[Events]
Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
Dialogue: 0,0:00:05.00,0:00:07.50,Default,,0,0,0,,Hello there.
Dialogue: 0,0:00:12.25,0:00:15.00,Sign,,0,0,0,,{\\i1}General Kenobi!{\\i0}
"""

VTT_TEXT = """WEBVTT

NOTE a comment block

00:00:05.000 --> 00:00:07.500
Hello there.

00:00:12.250 --> 00:00:15.000
General Kenobi!
"""

MICRODVD_TEXT = "{120}{180}Hello there.\n{294}{360}General Kenobi!\n"


def test_ass_parse_preserves_styles_and_info():
    doc = formats.parse_document(ASS_TEXT, "ass", "utf-8")
    assert len(list(doc)) == 2
    assert "Sign" in doc.styles and "Default" in doc.styles
    assert doc.info.get("Title") == "Test Script"
    cues = list(doc)
    assert cues[0].start_seconds == pytest.approx(5.0)
    assert cues[1].end_seconds == pytest.approx(15.0)


def test_ass_compose_round_trip_keeps_styles():
    doc = formats.parse_document(ASS_TEXT, "ass", "utf-8")
    out = formats.compose_document(doc, "ass")
    doc2 = formats.parse_document(out, "ass", "utf-8")
    assert set(doc2.styles) == {"Default", "Sign"}
    assert doc2.info.get("Title") == "Test Script"
    c1, c2 = list(doc), list(doc2)
    for a, b in zip(c1, c2):
        assert a.start_us == b.start_us and a.end_us == b.end_us


def test_vtt_parse_and_compose():
    doc = formats.parse_document(VTT_TEXT, "vtt", "utf-8")
    cues = list(doc)
    assert len(cues) == 2
    assert cues[0].start_seconds == pytest.approx(5.0)
    out = formats.compose_document(doc, "vtt")
    assert out.startswith("WEBVTT")
    again = formats.parse_document(out, "vtt", "utf-8")
    assert [c.start_us for c in again] == [c.start_us for c in cues]


def test_cross_format_srt_to_vtt_and_back():
    srt_text = (
        "1\n00:00:05,000 --> 00:00:07,500\nHello there.\n\n"
        "2\n00:00:12,250 --> 00:00:15,000\nGeneral Kenobi!\n"
    )
    doc = formats.parse_document(srt_text, "srt", "utf-8")
    vtt = formats.compose_document(doc, "vtt")
    assert "00:00:05.000 --> 00:00:07.500" in vtt
    back = formats.compose_document(
        formats.parse_document(vtt, "vtt", "utf-8"), "srt"
    )
    assert "00:00:05,000 --> 00:00:07,500" in back


def test_microdvd_parse():
    doc = formats.parse_document(MICRODVD_TEXT, "sub", "utf-8")
    cues = list(doc)
    assert len(cues) == 2
    # 120 frames at the default fps ≈ 5 s
    assert cues[0].start_seconds == pytest.approx(
        120 / ssa_format.DEFAULT_MICRODVD_FPS, abs=0.05
    )


def test_format_autodetect_vtt_named_ass():
    """Extension lies (vtt content in a .ass file): detection wins."""
    doc = formats.parse_document(VTT_TEXT, "ass", "utf-8")
    assert len(list(doc)) == 2


def test_ass_sync_end_to_end_preserves_styles(tmp_path):
    """Full CLI: sync a shifted .ass against an srt reference; output keeps
    the style sheet and shifts the events."""
    ref = tmp_path / "ref.srt"
    ref.write_text(
        "1\n00:00:05,000 --> 00:00:07,500\nHello there.\n\n"
        "2\n00:00:12,250 --> 00:00:15,000\nGeneral Kenobi!\n"
    )
    late = tmp_path / "late.ass"
    late.write_text(
        ASS_TEXT.replace("0:00:05.00", "0:00:07.00")
        .replace("0:00:07.50", "0:00:09.50")
        .replace("0:00:12.25", "0:00:14.25")
        .replace("0:00:15.00", "0:00:17.00")
    )
    out = tmp_path / "synced.ass"
    # only two cues: disable the ratio grid so the offset is unambiguous
    args = make_parser().parse_args(
        [str(ref), "-i", str(late), "-o", str(out), "--no-fix-framerate"]
    )
    result = run(args)
    assert result["sync_was_successful"]
    assert result["offset_seconds"] == pytest.approx(-2.0, abs=0.02)
    doc = formats.parse_document(out.read_text(), "ass", "utf-8")
    assert set(doc.styles) == {"Default", "Sign"}
    cues = list(doc)
    assert cues[0].start_seconds == pytest.approx(5.0, abs=0.02)
    assert "{\\i1}" in cues[1].content  # inline override tags survive
