# -*- coding: utf-8 -*-
"""Sibling-subtitle auto-detection and output-path resolution
(modeled on the reference's tests/test_autodetect.py:20-135)."""
import os


from ffsubsync_tpu.cli import make_parser
from ffsubsync_tpu.sync import (
    _detect_srtin_from_reference,
    _resolve_srtout,
    run,
    validate_and_transform_args,
)

from tests.test_sync_e2e import REF_SRT, _make_unsynced, _parse_times, _write


def test_detect_matches_stem_and_suffixed(tmp_path):
    ref = _write(tmp_path, "movie.mkv", "fake")
    for name in ("movie.srt", "movie.en.srt", "movie.de.srt"):
        _write(tmp_path, name, REF_SRT)
    _write(tmp_path, "other.srt", REF_SRT)  # different stem: skipped
    _write(tmp_path, "movie.synced.srt", REF_SRT)  # our own output: skipped
    _write(tmp_path, "movie.sub", REF_SRT)  # non-srt: skipped
    detected = _detect_srtin_from_reference(ref)
    assert [os.path.basename(p) for p in detected] == [
        "movie.de.srt",
        "movie.en.srt",
        "movie.srt",
    ]


def test_detect_skips_reference_itself(tmp_path):
    ref = _write(tmp_path, "show.srt", REF_SRT)
    _write(tmp_path, "show.en.srt", REF_SRT)
    detected = _detect_srtin_from_reference(ref)
    assert [os.path.basename(p) for p in detected] == ["show.en.srt"]


def test_autodetect_sets_auto_srtout(tmp_path, monkeypatch):
    monkeypatch.setattr("sys.stdin.isatty", lambda: True, raising=False)
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    _make_unsynced(tmp_path, ref, 2.0, name="ref.en.srt")
    args = make_parser().parse_args([ref])
    args = validate_and_transform_args(args)
    assert args is not None
    assert [os.path.basename(p) for p in args.srtin] == ["ref.en.srt"]
    assert getattr(args, "auto_srtout", False)
    out = _resolve_srtout(args, args.srtin[0])
    assert out.endswith("ref.en.synced.srt")


def test_autodetect_full_sync_writes_synced_file(tmp_path, monkeypatch):
    monkeypatch.setattr("sys.stdin.isatty", lambda: True, raising=False)
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref, 3.0, name="ref.en.srt")
    args = make_parser().parse_args([ref])
    result = run(args)
    assert result["sync_was_successful"]
    synced = os.path.join(str(tmp_path), "ref.en.synced.srt")
    assert os.path.exists(synced)
    for (rs, _), (os_, _) in zip(_parse_times(ref), _parse_times(synced)):
        assert abs(rs - os_) <= 0.02
    # re-run is idempotent: the .synced.srt is not picked up as an input
    assert os.path.basename(
        _detect_srtin_from_reference(ref)[0]
    ) == "ref.en.srt"


def test_autodetect_multiple_with_explicit_output_rejected(tmp_path, monkeypatch):
    monkeypatch.setattr("sys.stdin.isatty", lambda: True, raising=False)
    ref = _write(tmp_path, "ref.mkv", "fake")
    _write(tmp_path, "ref.en.srt", REF_SRT)
    _write(tmp_path, "ref.de.srt", REF_SRT)
    args = make_parser().parse_args([ref, "-o", "out.srt"])
    assert validate_and_transform_args(args) is None


def test_no_autodetect_when_stdin_piped(tmp_path, monkeypatch):
    monkeypatch.setattr("sys.stdin.isatty", lambda: False, raising=False)
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    _write(tmp_path, "ref.en.srt", REF_SRT)
    args = make_parser().parse_args([ref])
    args = validate_and_transform_args(args)
    assert args is not None
    assert not args.srtin


def test_resolve_srtout_precedence(tmp_path):
    args = make_parser().parse_args(["ref.srt", "-i", "in.srt", "-o", "out.srt"])
    assert _resolve_srtout(args, "in.srt") == "out.srt"
    args.overwrite_input = True
    assert _resolve_srtout(args, "in.srt") == "in.srt"
    args.overwrite_input = False
    args.auto_srtout = True
    assert _resolve_srtout(args, "in.srt") == "in.synced.srt"
