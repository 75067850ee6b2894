# -*- coding: utf-8 -*-
"""Quality gate (--skip-sync-on-low-quality) behavior, end to end.

Modeled on the reference's tests/test_quality_gate.py: verify gate-on leaves
subtitles untouched for bad alignments while gate-off applies them, by
re-parsing the written output."""
import os

import pytest

from ffsubsync_tpu.cli import make_parser
from ffsubsync_tpu.sync import assess_alignment_quality, run

from tests.test_sync_e2e import REF_SRT, _make_unsynced, _parse_times, _write


def test_assess_quality_thresholds():
    ok = assess_alignment_quality(
        10.0, 5.0, 1.0, min_score=0.0, max_offset_seconds=30.0,
        max_framerate_deviation=0.1,
    )
    assert ok == []
    bad_score = assess_alignment_quality(
        -1.0, 5.0, 1.0, min_score=0.0, max_offset_seconds=30.0,
        max_framerate_deviation=0.1,
    )
    assert any("score" in r for r in bad_score)
    bad_offset = assess_alignment_quality(
        10.0, 31.0, 1.0, min_score=0.0, max_offset_seconds=30.0,
        max_framerate_deviation=0.1,
    )
    assert any("offset" in r for r in bad_offset)
    bad_ratio = assess_alignment_quality(
        10.0, 5.0, 1.2, min_score=0.0, max_offset_seconds=30.0,
        max_framerate_deviation=0.1,
    )
    assert any("framerate deviation" in r for r in bad_ratio)
    # the default deviation threshold clears every discrete ratio correction
    assert (
        assess_alignment_quality(
            10.0, 5.0, 25.0 / 23.976, min_score=0.0, max_offset_seconds=30.0,
            max_framerate_deviation=0.1,
        )
        == []
    )


def test_gate_rejects_large_offset_writes_original(tmp_path):
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref, -45.0)  # |offset| > default 30 s gate
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        [ref, "-i", srtin, "-o", srtout, "--skip-sync-on-low-quality",
         "--skip-infer-framerate-ratio"]
    )
    result = run(args)
    assert not result["sync_was_successful"]
    # output written, but identical to the (unsynced) input
    assert _parse_times(srtout) == pytest.approx(_parse_times(srtin))


def test_gate_off_applies_large_offset(tmp_path):
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref, -45.0)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        [ref, "-i", srtin, "-o", srtout, "--skip-infer-framerate-ratio"]
    )
    result = run(args)
    assert result["sync_was_successful"]
    assert result["offset_seconds"] == pytest.approx(-45.0, abs=0.05)
    for (rs, _), (os_, _) in zip(_parse_times(ref), _parse_times(srtout)):
        assert abs(rs - os_) <= 0.05


def test_gate_accepts_good_alignment(tmp_path):
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref, 2.0)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        [ref, "-i", srtin, "-o", srtout, "--skip-sync-on-low-quality"]
    )
    result = run(args)
    assert result["sync_was_successful"]
    for (rs, _), (os_, _) in zip(_parse_times(ref), _parse_times(srtout)):
        assert abs(rs - os_) <= 0.02


def test_gate_tight_framerate_deviation(tmp_path):
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    true_ratio = 24.0 / 23.976
    srtin = _make_unsynced(tmp_path, ref, 1.0, scale=true_ratio)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        [ref, "-i", srtin, "-o", srtout, "--skip-sync-on-low-quality",
         "--max-framerate-deviation", "0.0001",
         "--skip-infer-framerate-ratio"]
    )
    result = run(args)
    assert not result["sync_was_successful"]
    assert _parse_times(srtout) == pytest.approx(_parse_times(srtin))
