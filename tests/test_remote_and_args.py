# -*- coding: utf-8 -*-
"""Remote-URL handling, ffmpeg argument construction, extract-subs mode, and
the test-case archiver (modeled on the reference's tests/test_remote_url.py,
test_max_duration.py, test_extract_audio.py)."""
import os
import tarfile


from ffsubsync_tpu.cli import make_parser
from ffsubsync_tpu.constants import is_remote_url
from ffsubsync_tpu.media.audio import VideoSpeechSource
from ffsubsync_tpu.utils.file_io import open_file

from tests.test_sync_e2e import REF_SRT, _make_unsynced, _write


def test_is_remote_url():
    assert is_remote_url("http://example.com/a.mkv")
    assert is_remote_url("https://example.com/a.mkv")
    assert is_remote_url("rtmp://example.com/live")
    assert is_remote_url("rtsp://cam/stream")
    assert is_remote_url("ftp://host/file")
    assert not is_remote_url("/local/path.mkv")
    assert not is_remote_url("file.srt")
    assert not is_remote_url(None)


def test_open_file_uses_urlopen_with_user_agent(monkeypatch):
    captured = {}

    class FakeResponse:
        def read(self):
            return b"data"

        def close(self):
            captured["closed"] = True

    def fake_urlopen(req):
        captured["url"] = req.full_url
        captured["ua"] = req.headers.get("User-agent")
        return FakeResponse()

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    with open_file("https://example.com/subs.srt", "rb") as f:
        assert f.read() == b"data"
    assert captured["url"] == "https://example.com/subs.srt"
    assert captured["ua"] == "ffsubsync"
    assert captured.get("closed")


def _source(**kw):
    defaults = dict(
        vad="webrtc", sample_rate=100, frame_rate=48000, non_speech_label=0.0
    )
    defaults.update(kw)
    return VideoSpeechSource(**defaults)


def test_ffmpeg_args_basic():
    args = _source()._build_ffmpeg_args("movie.mkv")
    assert args[1:5] == ["-loglevel", "fatal", "-nostdin", "-i"]
    assert "movie.mkv" in args
    assert args[-1] == "-"
    assert "-ss" not in args and "-t" not in args
    i = args.index("-ar")
    # ffmpeg is asked for the derived analysis rate directly (48000 -> 12000)
    assert args[i + 1] == "12000"
    assert "aresample=async=1" in args


def test_ffmpeg_args_start_and_max_duration():
    src = _source(start_seconds=30, max_duration_seconds=90.0)
    args = src._build_ffmpeg_args("movie.mkv")
    # -ss and input-side -t must appear BEFORE -i
    i_idx = args.index("-i")
    assert args.index("-ss") < i_idx
    assert args[args.index("-ss") + 1] == "0:00:30"
    assert args.index("-t") < i_idx
    assert args[args.index("-t") + 1] == "0:01:30"


def test_ffmpeg_args_audio_stream_map():
    src = _source(ref_stream="0:a:2")
    args = src._build_ffmpeg_args("movie.mkv")
    i = args.index("-map")
    assert args[i + 1] == "0:a:2"
    # subtitle streams are not mapped into the audio decode
    assert "-map" not in _source(ref_stream="0:s:0")._build_ffmpeg_args("m.mkv")


def test_extract_audio_first_local_file_ignored(tmp_path, monkeypatch):
    """--extract-audio-first only applies to remote URLs."""
    src = _source(extract_audio_first=True)
    called = {}

    def fake_extract(url):
        called["url"] = url
        return None

    monkeypatch.setattr(src, "_extract_audio_to_temp", fake_extract)
    monkeypatch.setattr(src, "_fit_using_audio", lambda fname: called.setdefault(
        "fit", fname))
    src.fit("/local/movie.mkv")
    assert "url" not in called
    assert called["fit"] == "/local/movie.mkv"


def test_extract_audio_first_remote(monkeypatch, tmp_path):
    src = _source(extract_audio_first=True)
    temp = os.path.join(str(tmp_path), "audio.mka")
    _write(tmp_path, "audio.mka", "fake-audio")
    monkeypatch.setattr(src, "_extract_audio_to_temp", lambda url: temp)
    fitted = {}
    monkeypatch.setattr(src, "_fit_using_audio", lambda fname: fitted.setdefault(
        "fname", fname))
    src.fit("https://example.com/movie.mkv")
    assert fitted["fname"] == temp
    assert not os.path.exists(temp)  # temp cleaned up after fit


def test_extract_audio_to_temp_args(monkeypatch):
    """-acodec copy, -vn, and the -t start+max limit for seekability."""
    src = _source(start_seconds=10, max_duration_seconds=60.0)
    captured = {}

    def fake_call(args, **kwargs):
        captured["args"] = args
        # write nothing -> zero size triggers failure path; we only check args
        return 1

    import ffsubsync_tpu.media.audio as audio_mod

    monkeypatch.setattr(audio_mod.subprocess, "call", fake_call)
    result = src._extract_audio_to_temp("https://example.com/m.mkv")
    assert result is None  # failed (retcode 1) -> fallback signaled
    args = captured["args"]
    assert "-vn" in args
    i = args.index("-acodec")
    assert args[i + 1] == "copy"
    i = args.index("-t")
    assert args[i + 1] == "0:01:10"  # start 10 + max 60
    assert args[-1].endswith(".mka")


def test_extract_subs_from_stream_mode(monkeypatch, tmp_path):
    import ffsubsync_tpu.sync as sync_mod

    captured = {}

    def fake_call(args, **kwargs):
        captured["args"] = args
        return 0

    monkeypatch.setattr(sync_mod.subprocess, "call", fake_call)
    out = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        ["movie.mkv", "--extract-subs-from-stream", "s:1", "-o", out]
    )
    # bypass file-permission validation of the fake reference
    monkeypatch.setattr(sync_mod, "validate_file_permissions", lambda a: None)
    result = sync_mod.run(args)
    assert result["retval"] == 0
    ff = captured["args"]
    i = ff.index("-map")
    assert ff[i + 1] == "0:s:1"
    assert ff[ff.index("-f") + 1] == "srt"
    assert ff[-1] == out


def test_extract_subs_rejects_srtin():
    args = make_parser().parse_args(
        ["movie.mkv", "--extract-subs-from-stream", "s:0", "-i", "in.srt"]
    )
    from ffsubsync_tpu.sync import run

    assert run(args)["retval"] == 1


def test_make_test_case_archives(tmp_path, monkeypatch):
    monkeypatch.chdir(str(tmp_path))
    ref = _write(tmp_path, "ref.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref, 1.5)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        [ref, "-i", srtin, "-o", srtout, "--make-test-case"]
    )
    from ffsubsync_tpu.sync import run

    result = run(args)
    assert result["retval"] == 0
    archives = [p for p in os.listdir(str(tmp_path)) if p.endswith(".tar.gz")]
    assert len(archives) == 1
    with tarfile.open(os.path.join(str(tmp_path), archives[0])) as tar:
        names = [os.path.basename(n) for n in tar.getnames()]
    assert "ffsubsync.log" in names
    assert os.path.basename(srtin) in names
    assert "out.srt" in names
    assert os.path.basename(ref) in names
    # log file cleaned up after archiving
    assert not os.path.exists(os.path.join(str(tmp_path), "ffsubsync.log"))
