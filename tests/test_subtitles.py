# -*- coding: utf-8 -*-
"""Subtitle parse / transform / rasterize tests.

Modeled on the reference's tests/test_subtitles.py:14-123, including its
deliberately malformed >3-digit-millisecond timestamps.
"""
import itertools
from io import BytesIO

import numpy as np
import pytest

from ffsubsync_tpu.subs.parser import SubtitleParser
from ffsubsync_tpu.subs.raster import rasterize_cues
from ffsubsync_tpu.subs.transforms import shift_document

fake_srt = b"""1
00:00:00,178 --> 00:00:01,1416
<i>Previously on "Your favorite TV show..."</i>

2
00:00:01,1828 --> 00:00:04,549
Oh hi, Mark.

3
00:00:04,653 --> 00:00:03,3062
You are tearing me apart, Lisa!
"""


@pytest.mark.parametrize("start_seconds", [0, 2, 4, 6])
def test_start_seconds(start_seconds):
    parser_zero = SubtitleParser(start_seconds=0)
    parser_zero.fit(BytesIO(fake_srt))
    parser = SubtitleParser(start_seconds=start_seconds)
    parser.fit(BytesIO(fake_srt))
    expected = [
        sub
        for sub in parser_zero.subs_
        if sub.start_seconds >= start_seconds
    ]
    assert len(expected) == len(parser.subs_)
    assert all(esub == psub for esub, psub in zip(expected, parser.subs_))


@pytest.mark.parametrize("max_seconds", [1, 1.5, 2.0, 2.5])
def test_max_seconds(max_seconds):
    parser = SubtitleParser(max_subtitle_seconds=max_seconds)
    parser.fit(BytesIO(fake_srt))
    assert max(sub.duration_seconds for sub in parser.subs_) <= max_seconds


@pytest.mark.parametrize("encoding", ["utf-8", "ascii", "latin-1"])
def test_same_encoding(encoding):
    parser = SubtitleParser(encoding=encoding)
    parser.fit(BytesIO(fake_srt))
    shifted = shift_document(parser.subs_, 1)
    assert parser.subs_.encoding == encoding
    assert shifted.encoding == parser.subs_.encoding
    assert shifted.set_encoding("same").encoding == encoding
    assert shifted.set_encoding("utf-8").encoding == "utf-8"


@pytest.mark.parametrize("offset", [1, 1.5, -2.3])
def test_offset(offset):
    parser = SubtitleParser()
    parser.fit(BytesIO(fake_srt))
    shifted = shift_document(parser.subs_, offset)
    for sub_orig, sub_shift in zip(parser.subs_, shifted):
        assert abs(sub_shift.start_seconds - sub_orig.start_seconds - offset) < 1e-6
        assert abs(sub_shift.end_seconds - sub_orig.end_seconds - offset) < 1e-6


@pytest.mark.parametrize(
    "sample_rate,start_seconds", itertools.product([10, 20, 100, 300], [0, 2, 4, 6])
)
def test_speech_extraction(sample_rate, start_seconds):
    """Each cue contributes exactly its rounded-duration run of speech samples."""
    parser = SubtitleParser(start_seconds=start_seconds)
    parser.fit(BytesIO(fake_srt))
    spec = rasterize_cues(
        parser.subs_.cues, sample_rate=sample_rate, start_seconds=start_seconds
    )
    bitstring = spec.materialize().astype(bool)
    bitstring_shifted_left = np.append(bitstring[1:], [False])
    bitstring_shifted_right = np.append([False], bitstring[:-1])
    bitstring_cumsum = np.cumsum(bitstring)
    consec_ones_end_pos = np.nonzero(
        bitstring_cumsum
        * (bitstring ^ bitstring_shifted_left)
        * (bitstring_cumsum != np.cumsum(bitstring_shifted_right))
    )[0]
    prev = 0
    for pos, sub in zip(consec_ones_end_pos, parser.subs_):
        start = int(round(sub.start_seconds * sample_rate))
        duration = sub.end_seconds - sub.start_seconds
        stop = start + int(round(duration * sample_rate))
        assert bitstring_cumsum[pos] - prev == stop - start
        prev = bitstring_cumsum[pos]


def test_max_time_found():
    parser = SubtitleParser()
    parser.fit(BytesIO(fake_srt))
    spec = rasterize_cues(parser.subs_.cues, sample_rate=100)
    assert spec.max_time == 6.062


def test_parse_malformed_ms_fields():
    parser = SubtitleParser()
    parser.fit(BytesIO(fake_srt))
    subs = list(parser.subs_)
    assert len(subs) == 3
    assert subs[0].start_seconds == pytest.approx(0.178)
    assert subs[0].end_seconds == pytest.approx(2.416)  # 1 s + 1416 ms
    assert subs[2].end_seconds == pytest.approx(6.062)  # 3 s + 3062 ms


def test_srt_round_trip():
    parser = SubtitleParser()
    parser.fit(BytesIO(fake_srt))
    text = parser.subs_.to_string("srt")
    reparsed = SubtitleParser()
    reparsed.fit(BytesIO(text.encode("utf-8")))
    # output is sorted by start time; cue 3 (start 4.653) stays last
    assert [s.start_us for s in reparsed.subs_] == sorted(
        s.start_us for s in parser.subs_
    )
    assert reparsed.subs_[1].content == "Oh hi, Mark."


def test_strict_mode_rejects_malformed():
    bad = b"""1
00:00:00,178 --> 00:00:01,416
ok

garbage block without timing
more garbage
"""
    parser = SubtitleParser(strict=False)
    parser.fit(BytesIO(bad))
    assert len(parser.subs_) == 1
    with pytest.raises(Exception):
        SubtitleParser(strict=True).fit(BytesIO(bad))
