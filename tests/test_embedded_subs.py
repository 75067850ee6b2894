# -*- coding: utf-8 -*-
"""Embedded-subtitle extraction with a protocol-faithful fake ffmpeg/ffprobe.

Pattern follows the reference's tests/test_embedded_subs.py:63-139: a Popen
stub recognizes ffprobe (canned CSV) vs ffmpeg (serves SRT bytes per -map,
honoring both stdout and single-pass-to-temp-file protocols), asserts
invocation counts and fallback cascades, and guards filesystem cleanliness.
"""
import os

import pytest

import ffsubsync_tpu.media.embedded as embedded

SRT_A = b"""1
00:00:01,000 --> 00:00:02,000
Stream A first cue

2
00:00:10,000 --> 00:00:12,000
Stream A second cue
"""

SRT_B = b"""1
00:00:01,000 --> 00:00:02,000
Stream B first cue

2
00:00:40,000 --> 00:00:44,000
Stream B second cue (longer track)
"""


class FakePopen:
    """Simulates ffprobe stream CSV + ffmpeg srt extraction protocols."""

    calls = []
    probe_csv = b"2,subrip\n3,ass\n4,hdmv_pgs_subtitle\n"
    stream_payloads = {"0:2": SRT_A, "0:3": SRT_B}
    fail_single_pass = False
    fail_probe = False

    def __init__(self, args, **kwargs):
        FakePopen.calls.append(list(args))
        self.args = list(args)
        self.returncode = 0
        self._stdout = b""
        binary = os.path.basename(args[0])
        if "ffprobe" in binary:
            if FakePopen.fail_probe:
                self.returncode = 1
            else:
                self._stdout = FakePopen.probe_csv
        else:
            maps = [args[i + 1] for i, a in enumerate(args) if a == "-map"]
            outputs = [
                a for a in args[args.index("-i") + 2:]
                if a == "-" or a.endswith(".srt")
            ]
            if outputs and outputs[-1] == "-":
                stream = maps[0]
                payload = FakePopen.stream_payloads.get(stream)
                if payload is None:
                    self.returncode = 1
                else:
                    self._stdout = payload
            else:
                if FakePopen.fail_single_pass:
                    self.returncode = 1
                else:
                    for stream, out_path in zip(maps, outputs):
                        payload = FakePopen.stream_payloads.get(stream)
                        if payload is not None:
                            with open(out_path, "wb") as f:
                                f.write(payload)

    @property
    def stdout(self):
        return self

    def communicate(self, *a, **k):
        return self._stdout, b""

    def read(self, *a):
        return self._stdout


@pytest.fixture
def fake_popen(monkeypatch):
    FakePopen.calls = []
    FakePopen.fail_single_pass = False
    FakePopen.fail_probe = False
    monkeypatch.setattr(embedded.subprocess, "Popen", FakePopen)
    return FakePopen


def _ffmpeg_calls():
    return [c for c in FakePopen.calls if "ffprobe" not in os.path.basename(c[0])]


def _ffprobe_calls():
    return [c for c in FakePopen.calls if "ffprobe" in os.path.basename(c[0])]


def test_probe_skips_bitmap_codecs(fake_popen):
    streams = embedded.probe_embedded_subtitle_streams("movie.mkv")
    assert streams == ["0:2", "0:3"]  # PGS stream filtered out


def test_single_pass_extraction(fake_popen):
    spec = embedded.fit_embedded_subs("movie.mkv", 0, None)
    # exactly one ffprobe + one ffmpeg invocation (single pass)
    assert len(_ffprobe_calls()) == 1
    assert len(_ffmpeg_calls()) == 1
    maps = [
        _ffmpeg_calls()[0][i + 1]
        for i, a in enumerate(_ffmpeg_calls()[0])
        if a == "-map"
    ]
    assert maps == ["0:2", "0:3"]
    # longest track (stream B, max cue end 44 s) wins
    assert spec.n_samples == int(44.0 * 100) + 2


def test_single_pass_failure_falls_back_per_stream(fake_popen):
    FakePopen.fail_single_pass = True
    spec = embedded.fit_embedded_subs("movie.mkv", 0, None)
    # 1 failed single pass + 2 per-stream extractions
    assert len(_ffmpeg_calls()) == 3
    assert spec.n_samples == int(44.0 * 100) + 2


def test_probe_failure_falls_back_first_five(fake_popen):
    FakePopen.fail_probe = True
    FakePopen.stream_payloads = {"0:s:0": SRT_A, "0:s:1": SRT_B}
    try:
        spec = embedded.fit_embedded_subs("movie.mkv", 0, None)
    finally:
        FakePopen.stream_payloads = {"0:2": SRT_A, "0:3": SRT_B}
    # stops at first failing stream (0:s:2), after extracting 2
    assert len(_ffmpeg_calls()) == 3
    assert spec.n_samples == int(44.0 * 100) + 2


def test_explicit_stream_extracted_alone(fake_popen):
    spec = embedded.fit_embedded_subs("movie.mkv", 0, "0:2")
    assert len(_ffprobe_calls()) == 0
    assert len(_ffmpeg_calls()) == 1
    assert spec.n_samples == int(12.0 * 100) + 2


def test_missing_stream_raises(fake_popen):
    FakePopen.stream_payloads = {}
    try:
        with pytest.raises(ValueError, match="lack subtitle stream"):
            embedded.fit_embedded_subs("movie.mkv", 0, None)
        with pytest.raises(ValueError, match="Stream 0:9 not found"):
            embedded.fit_embedded_subs("movie.mkv", 0, "0:9")
    finally:
        FakePopen.stream_payloads = {"0:2": SRT_A, "0:3": SRT_B}


def test_no_temp_files_left_behind(fake_popen, tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # force re-read of TMPDIR
    try:
        embedded.fit_embedded_subs("movie.mkv", 0, None)
    finally:
        tempfile.tempdir = None
    leftovers = [p for p in os.listdir(str(tmp_path)) if "ffsubsync" in p]
    assert leftovers == []


def test_start_seconds_shifts_raster(fake_popen):
    spec0 = embedded.fit_embedded_subs("movie.mkv", 0, "0:2")
    spec5 = embedded.fit_embedded_subs("movie.mkv", 5, "0:2")
    # cue at 10-12 s lands at samples 1000/500 respectively
    assert spec0.starts.min() == 100  # first cue at 1 s
    assert spec5.starts.min() == 500  # 10 s - 5 s offset
    sig0 = spec0.materialize()
    assert sig0[150] == 1.0 and sig0[250] == 0.0
