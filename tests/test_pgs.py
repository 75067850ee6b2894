# -*- coding: utf-8 -*-
"""PGS timing extraction edge cases (modeled on the reference's tests/test_pgs.py)."""
import pytest

import ffsubsync_tpu.media.pgs as pgs


def _mock_probe(monkeypatch, payload):
    monkeypatch.setattr(pgs, "ffprobe_json", lambda *a, **k: payload)


def test_find_pgs_stream_counts_subtitle_ordinal(monkeypatch):
    _mock_probe(
        monkeypatch,
        {
            "streams": [
                {"codec_type": "video", "codec_name": "h264", "index": 0},
                {"codec_type": "audio", "codec_name": "aac", "index": 1},
                {"codec_type": "subtitle", "codec_name": "subrip", "index": 2},
                {"codec_type": "subtitle", "codec_name": "hdmv_pgs_subtitle",
                 "index": 3},
            ]
        },
    )
    # PGS is the *second* subtitle stream → 0:s:1
    assert pgs.find_pgs_stream("movie.mkv") == "0:s:1"


def test_find_pgs_stream_none(monkeypatch):
    _mock_probe(monkeypatch, {"streams": [
        {"codec_type": "subtitle", "codec_name": "subrip", "index": 2}]})
    assert pgs.find_pgs_stream("movie.mkv") is None


def test_timings_skip_clear_events_and_na(monkeypatch):
    _mock_probe(
        monkeypatch,
        {
            "packets": [
                {"pts_time": "1.0", "duration_time": "2.0", "size": "5000"},
                {"pts_time": "3.0", "duration_time": "N/A", "size": "30"},
                {"pts_time": "4.0", "duration_time": "1.5", "size": "40"},  # ≤50
                {"pts_time": "6.0", "duration_time": "1.0", "size": "800"},
                {"pts_time": "bad", "duration_time": "1.0", "size": "800"},
                {"pts_time": "8.0", "size": "800"},  # missing duration
            ]
        },
    )
    timings = pgs.get_pgs_timings("movie.mkv", "0:s:0")
    assert timings == [(1.0, 3.0), (6.0, 7.0)]


def test_timings_none_when_empty(monkeypatch):
    _mock_probe(monkeypatch, {"packets": []})
    assert pgs.get_pgs_timings("movie.mkv", "0:s:0") is None


def test_pgs_source_fit_and_raster(monkeypatch):
    packets = {
        "packets": [
            {"pts_time": "1.0", "duration_time": "2.0", "size": "5000"},
            {"pts_time": "6.0", "duration_time": "1.0", "size": "800"},
        ]
    }
    _mock_probe(monkeypatch, packets)
    source = pgs.PGSSpeechSource(sample_rate=100, ref_stream="s:0")
    source.fit("movie.mkv")
    signal = source.transform()
    assert signal[150] == 1.0  # inside 1-3 s
    assert signal[450] == 0.0  # between events
    assert signal[650] == 1.0  # inside 6-7 s
    # PGS disables duration-based framerate inference
    assert source.num_frames is None


def test_pgs_source_raises_without_stream(monkeypatch):
    _mock_probe(monkeypatch, {"streams": []})
    source = pgs.PGSSpeechSource(sample_rate=100)
    with pytest.raises(ValueError, match="No hdmv_pgs_subtitle stream"):
        source.fit("movie.mkv")
