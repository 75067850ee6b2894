# -*- coding: utf-8 -*-
"""End-to-end audio-reference sync: synthetic WAV → VAD kernels → alignment."""
import os

import numpy as np
import pytest

from ffsubsync_tpu.cli import make_parser
from ffsubsync_tpu.models.synth_data import speech_signal_for_spans
from ffsubsync_tpu.sync import run

from tests.helpers import spans_from_srt_text, write_wav
from tests.test_sync_e2e import REF_SRT, _make_unsynced, _parse_times, _write


def _make_media(tmp_path, name="ref.wav", pad_s=3.0):
    """WAV whose speech spans exactly match REF_SRT's cue times."""
    spans = spans_from_srt_text(REF_SRT)
    duration = max(e for _, e in spans) + pad_s
    wav = speech_signal_for_spans(duration, spans, 48000, speech_level=0.35)
    path = os.path.join(str(tmp_path), name)
    write_wav(path, wav, 48000)
    return path


@pytest.mark.parametrize("vad", ["webrtc", "auditok", "silero", "fused"])
def test_wav_reference_sync(tmp_path, vad):
    media = _make_media(tmp_path)
    ref_srt = _write(tmp_path, "truth.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref_srt, 2.2)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        [media, "-i", srtin, "-o", srtout, "--vad", vad]
    )
    result = run(args)
    assert result["sync_was_successful"]
    assert result["offset_seconds"] == pytest.approx(2.2, abs=0.15)


def test_wav_reference_with_vad_default_subs_then(tmp_path):
    """Default subs_then_webrtc: embedded-sub extraction fails on a WAV (no
    ffmpeg here), falls back to audio VAD."""
    media = _make_media(tmp_path)
    ref_srt = _write(tmp_path, "truth.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref_srt, -1.4)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args([media, "-i", srtin, "-o", srtout])
    result = run(args)
    assert result["sync_was_successful"]
    assert result["offset_seconds"] == pytest.approx(-1.4, abs=0.15)


def test_max_duration_seconds_truncates(tmp_path):
    media = _make_media(tmp_path)
    ref_srt = _write(tmp_path, "truth.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref_srt, 1.0)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        [media, "-i", srtin, "-o", srtout, "--vad", "webrtc",
         "--max-duration-seconds", "30", "--serialize-speech"]
    )
    result = run(args)
    npz = np.load(os.path.splitext(media)[0] + ".npz")["speech"]
    # only ~30 s decoded instead of the full ~67 s
    assert len(npz) <= 31 * 100
    assert result["sync_was_successful"]


def test_start_seconds_skips_prefix(tmp_path):
    media = _make_media(tmp_path)
    ref_srt = _write(tmp_path, "truth.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref_srt, 0.9)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        [media, "-i", srtin, "-o", srtout, "--vad", "webrtc",
         "--start-seconds", "10"]
    )
    result = run(args)
    assert result["sync_was_successful"]
    assert result["offset_seconds"] == pytest.approx(0.9, abs=0.2)


def test_multi_segment_sync_wav(tmp_path):
    media = _make_media(tmp_path)
    ref_srt = _write(tmp_path, "truth.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref_srt, 3.1)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        [media, "-i", srtin, "-o", srtout, "--vad", "webrtc",
         "--multi-segment-sync", "--segment-count", "4"]
    )
    result = run(args)
    assert result["sync_was_successful"]
    assert result["offset_seconds"] == pytest.approx(3.1, abs=0.15)


def test_progress_handler_called(tmp_path):
    media = _make_media(tmp_path)
    ref_srt = _write(tmp_path, "truth.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref_srt, 1.0)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        [media, "-i", srtin, "-o", srtout, "--vad", "webrtc"]
    )
    infos = []
    result = run(args, progress_handler=infos.append)
    assert result["sync_was_successful"]
    assert len(infos) >= 1
    processed = [i.processed_seconds for i in infos]
    assert processed == sorted(processed)
    assert infos[-1].total_seconds == pytest.approx(67.0, abs=1.0)
    assert infos[-1].fraction == pytest.approx(1.0, abs=0.05)


def test_progress_handler_exceptions_swallowed(tmp_path):
    media = _make_media(tmp_path)
    ref_srt = _write(tmp_path, "truth.srt", REF_SRT)
    srtin = _make_unsynced(tmp_path, ref_srt, 1.0)
    srtout = os.path.join(str(tmp_path), "out.srt")
    args = make_parser().parse_args(
        [media, "-i", srtin, "-o", srtout, "--vad", "webrtc"]
    )

    def bad_handler(info):
        raise RuntimeError("host app bug")

    result = run(args, progress_handler=bad_handler)
    assert result["sync_was_successful"]


def test_buffered_vad_spills_to_streaming_when_cap_exceeded(
    tmp_path, monkeypatch
):
    """With an unknown/lying duration, the buffered path must spill through
    the state-carrying detector once the cap is hit and keep constant memory,
    still producing a full-length signal."""
    import numpy as np
    from ffsubsync_tpu.media.audio import VideoSpeechSource
    from ffsubsync_tpu.models.synth_data import speech_signal_for_spans
    from tests.helpers import write_wav

    frame_rate = 16000
    spans = [(2.0, 4.0), (8.0, 10.0), (14.0, 16.0)]
    wav_path = tmp_path / "ref.wav"
    write_wav(
        str(wav_path),
        speech_signal_for_spans(20.0, spans, frame_rate, speech_level=0.4),
        frame_rate,
    )
    # cap far below the file size; chunks are ~100 s so force tiny buffers
    monkeypatch.setenv("FFS_TPU_MAX_BUFFER_BYTES", str(frame_rate * 2 * 5))
    src = VideoSpeechSource(
        vad="webrtc", sample_rate=100, frame_rate=frame_rate,
        non_speech_label=0.0,
    )
    src.fit(str(wav_path))
    signal = src.transform()
    assert len(signal) == 20 * 100
    for s, e in spans:
        assert signal[int(s * 100) + 20 : int(e * 100) - 20].mean() > 0.4
