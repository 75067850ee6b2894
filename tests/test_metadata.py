# -*- coding: utf-8 -*-
"""Non-dialogue cue heuristic truth tables (model:
reference tests/test_metadata.py:13-57 over speech_transformers.py:906-943)."""
import pytest

from ffsubsync_tpu.subs.metadata import is_metadata


@pytest.mark.parametrize(
    "content,expected",
    [
        ("Hello there.", False),
        ("", True),
        ("   ", True),
        ("[door creaks]", True),
        ("(sighs)", True),
        ("{clears throat}", True),
        ("（音楽）", True),
        ("【効果音】", True),
        ("「セリフ」", True),
        ("[unclosed bracket", False),
        ("closing only]", False),
        ("♪", True),
        ("♪♫♬", True),
        ("♪ ♫", True),
        ("♪ lyrics being sung ♪", False),  # has words → dialogue
        ("<i>[music]</i>", True),  # markup stripped first
        ("<i>Hello?</i>", False),
        ("<font color=\"red\">(gunshot)</font>", True),
        ("<b></b>", True),  # empty after strip
    ],
)
def test_is_metadata_middle_cues(content, expected):
    assert is_metadata(content, is_beginning_or_end=False) is expected


@pytest.mark.parametrize(
    "content,middle,edge",
    [
        ("Subtitles by SomeGroup - 2020", False, True),  # " - " rule
        ("English subtitles", False, True),
        ("ENGLISH - SDH", False, True),
        ("He said - wait, what?", False, True),  # edge scrutiny is aggressive
        ("An english muffin", False, True),  # substring rule, by design
        ("Plain dialogue line.", False, False),
    ],
)
def test_is_metadata_edge_cues(content, middle, edge):
    assert is_metadata(content, is_beginning_or_end=False) is middle
    assert is_metadata(content, is_beginning_or_end=True) is edge


def test_rasterizer_skips_metadata_cues():
    """Cues classified as metadata contribute nothing to the speech signal."""
    from ffsubsync_tpu.subs.model import Cue, SrtRecord
    from ffsubsync_tpu.subs.raster import rasterize_cues

    def cue(a, b, text, i):
        return Cue(
            start_us=int(a * 1e6),
            end_us=int(b * 1e6),
            inner=SrtRecord(index=i, content=text),
        )

    cues = [
        cue(0.5, 0.9, "First dialogue.", 1),  # guards the edge rule
        cue(1.0, 2.0, "[door creaks]", 2),
        cue(3.0, 4.0, "Hello.", 3),
        cue(5.0, 6.0, "♪", 4),
        cue(6.5, 6.9, "Last dialogue.", 5),
    ]
    sig = rasterize_cues(cues, sample_rate=100).materialize()
    assert sig[100:200].sum() == 0  # bracketed cue skipped
    assert sig[300:400].sum() > 0  # dialogue kept
    assert sig[500:600].sum() == 0  # music symbols skipped
