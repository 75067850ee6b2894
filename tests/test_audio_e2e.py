# -*- coding: utf-8 -*-
"""End-to-end audio-reference sync: synthetic WAV → VAD kernels → alignment."""
import os

import numpy as np
import pytest

from ffsubsync_tpu.cli import make_parser
from ffsubsync_tpu.models.synth_data import speech_signal_for_spans
from ffsubsync_tpu.sync import run

from tests.helpers import spans_from_srt_text, write_wav
from tests.test_sync_e2e import REF_SRT, _make_unsynced, _write


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


def test_buffered_pipeline_dispatch_matches_manual(tmp_path, monkeypatch):
    """Buffered mode with pipelined async dispatch produces exactly the same
    speech signal as feeding the same chunks through a detector by hand
    (state must thread correctly through the async dispatches)."""
    import ffsubsync_tpu.media.audio as audio_mod
    import ffsubsync_tpu.ops.vad as vad_mod
    from ffsubsync_tpu.media.audio import VideoSpeechSource
    from tests.helpers import write_wav as _write_wav

    monkeypatch.setenv("FFS_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("FFS_TPU_PIPELINE_SECONDS", "8")
    # shrink the decode read buffer to 3 s so the 30 s file spans many reads
    monkeypatch.setattr(audio_mod, "WINDOWS_PER_BUFFER", 300)
    frame_rate = 8000
    spans = [(2.0, 4.5), (9.0, 11.0), (16.0, 18.5), (23.0, 25.0)]
    wav = speech_signal_for_spans(30.0, spans, frame_rate, speech_level=0.35)
    media = os.path.join(str(tmp_path), "m.wav")
    _write_wav(media, wav, frame_rate)

    src = VideoSpeechSource(
        vad="fused", sample_rate=100, frame_rate=frame_rate,
        non_speech_label=0.0,
    )
    src.fit(media)
    pipelined = src.transform()

    # reproduce the media layer's dispatch boundaries: 3 s reads accumulate
    # until >= the 8 s pipeline chunk, so dispatches cover 9 s + 9 s + 9 s + 3 s
    pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)
    det = vad_mod.make_fused_detector(100, frame_rate, 0.0)
    read = 300 * (frame_rate // 100)
    flush = vad_mod._pipeline_chunk_samples(frame_rate, 100)
    parts, held, manual = [], 0, []
    for i in range(0, len(pcm), read):
        parts.append(pcm[i : i + read])
        held += len(parts[-1])
        if held >= flush:
            manual.append(det(np.concatenate(parts)))
            parts, held = [], 0
    if parts:
        manual.append(det(np.concatenate(parts)))
    manual = np.concatenate(manual)
    assert len(pipelined) == len(manual)
    np.testing.assert_array_equal(pipelined, manual)


def test_truncated_wav_reads_available_frames(tmp_path):
    """Headers that claim more data than the file holds (truncated download,
    streaming writer with a placeholder size) must clamp to the real payload
    instead of failing to mmap — the old read path decoded to EOF."""
    import numpy as np
    from ffsubsync_tpu.media.wav import WavReader
    from tests.helpers import write_wav

    path = tmp_path / "trunc.wav"
    write_wav(str(path), np.random.RandomState(0).randn(16000) * 0.1, 8000)
    blob = path.read_bytes()
    path.write_bytes(blob[: len(blob) // 2])  # cut payload, keep header
    reader = WavReader(str(path))
    total = sum(len(c) for c in reader.iter_chunks(target_rate=8000))
    assert total == reader.n_frames
    assert 0 < total < 16000


def test_gui_mode_resurfaces_captured_stderr(capsys):
    """gui-mode parity (speech_transformers.py:688-741): stderr captured
    during extraction is re-printed on stdout, once, at the next update."""
    import sys

    from ffsubsync_tpu.utils.progress import ProgressReporter

    with ProgressReporter(10.0, gui_mode=True) as progress:
        print("stray-warning", file=sys.stderr)
        progress.update(5.0)
        progress.update(5.0)
    out = capsys.readouterr().out
    assert out.count("stray-warning") == 1


def test_native_wav_stays_at_file_rate(tmp_path):
    """A window-compatible WAV is staged at its own rate — zero-copy memmap
    slices, no linear resample to frame_rate (the staging pass does any
    decimation on the one pass it already makes)."""
    from ffsubsync_tpu.media.audio import VideoSpeechSource
    from tests.helpers import write_wav

    path = str(tmp_path / "m12k.wav")
    write_wav(path, np.random.RandomState(0).randn(12000 * 4) * 0.1, 12000)
    src = VideoSpeechSource(
        vad="fused", sample_rate=100, frame_rate=48000, non_speech_label=0.0
    )
    assert src._pcm_rate(path) == 12000
    chunks = list(src._iter_pcm_chunks(path, 1 << 20, src._pcm_rate(path)))
    assert all(c.dtype == np.int16 for c in chunks)
    # hot path yields views of the file mapping, not resampled copies
    assert all(isinstance(c.base, np.memmap) for c in chunks)


def test_native_wav_incompatible_rate_resamples_up(tmp_path):
    """44.1 kHz-family files can't hit integer 100 Hz windows: the reader
    linear-resamples UP to frame_rate for neural modes (never down —
    aliasing), but rate-agnostic VADs analyze the file rate directly."""
    from ffsubsync_tpu.media.audio import VideoSpeechSource
    from tests.helpers import write_wav

    path = str(tmp_path / "m22k.wav")
    write_wav(path, np.random.RandomState(0).randn(22050 * 2) * 0.1, 22050)
    fused = VideoSpeechSource(
        vad="fused", sample_rate=100, frame_rate=48000, non_speech_label=0.0
    )
    assert fused._pcm_rate(path) == 48000
    webrtc = VideoSpeechSource(
        vad="webrtc", sample_rate=100, frame_rate=48000, non_speech_label=0.0
    )
    # 22050 % 100 != 0 -> not window-compatible even for webrtc
    assert webrtc._pcm_rate(path) == 48000
    # 44100 % 100 == 0 BUT half-band decimation can never engage there:
    # staying at 44.1 kHz would ship ~4x the wire bytes, so every VAD mode
    # takes the resample-to-frame_rate path
    path441 = str(tmp_path / "m441.wav")
    write_wav(path441, np.random.RandomState(0).randn(44100) * 0.1, 44100)
    assert fused._pcm_rate(path441) == 48000
    assert webrtc._pcm_rate(path441) == 48000


def test_native_wav_rate_without_weights_falls_back(tmp_path):
    """A compatible rate whose analysis rate has no shipped neural weights
    must not be fed to the neural net: neural modes resample to frame_rate,
    spectral modes keep the file rate."""
    from ffsubsync_tpu.media.audio import VideoSpeechSource
    from tests.helpers import write_wav

    path = str(tmp_path / "m6k.wav")
    write_wav(path, np.random.RandomState(0).randn(6000 * 2) * 0.1, 6000)
    fused = VideoSpeechSource(
        vad="fused", sample_rate=100, frame_rate=48000, non_speech_label=0.0
    )
    assert fused._pcm_rate(path) == 48000  # no neural_vad_weights_6000.npz
    webrtc = VideoSpeechSource(
        vad="webrtc", sample_rate=100, frame_rate=48000, non_speech_label=0.0
    )
    assert webrtc._pcm_rate(path) == 6000


def test_audio_signal_stays_on_device_until_needed(tmp_path, monkeypatch):
    """The buffered device pipeline must hand the aligner a lazy device
    signal (no host pull), and that signal must align identically to its
    materialized numpy value."""
    from ffsubsync_tpu.media.audio import VideoSpeechSource
    from ffsubsync_tpu.ops.align import align_candidates
    from ffsubsync_tpu.ops.vad import LazySpeechSignal
    from ffsubsync_tpu.subs.raster import rasterize_intervals
    from tests.helpers import write_wav

    monkeypatch.setenv("FFS_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("FFS_TPU_PIPELINE_SECONDS", "6")
    frame_rate = 8000
    spans = [(2.0, 4.5), (8.0, 11.0), (14.0, 16.0)]
    wav = speech_signal_for_spans(20.0, spans, frame_rate, speech_level=0.35)
    path = str(tmp_path / "m.wav")
    write_wav(path, wav, frame_rate)
    src = VideoSpeechSource(
        vad="webrtc", sample_rate=100, frame_rate=frame_rate,
        non_speech_label=0.0,
    )
    src.fit(path)
    sig = src.signal_or_spec()
    assert isinstance(sig, LazySpeechSignal)
    assert not src.prefer_host_align
    shift = 1.5
    cand = rasterize_intervals([(a - shift, b - shift) for a, b in spans], 100)
    lazy_result = align_candidates(sig, [cand], max_offset_samples=500)[0]
    np_result = align_candidates(
        sig.materialize(), [cand], max_offset_samples=500
    )[0]
    # lazy and materialized paths must agree exactly; the detector's
    # hangover asymmetry can move the argmax one 10 ms window off truth
    assert lazy_result.offset == np_result.offset
    assert abs(lazy_result.offset - int(shift * 100)) <= 1
    assert lazy_result.score == pytest.approx(np_result.score, rel=1e-5)
    # transform() (serialization path) still yields host float64
    out = src.transform()
    assert isinstance(out, np.ndarray) and out.dtype == np.float64


def test_gui_mode_drains_stderr_tail_on_exit(capsys):
    """stderr captured AFTER the last update() (e.g. error text right before
    extraction raised) must be re-surfaced at exit, not swallowed."""
    import sys

    from ffsubsync_tpu.utils.progress import ProgressReporter

    with ProgressReporter(10.0, gui_mode=True) as progress:
        progress.update(5.0)
        print("late-error", file=sys.stderr)
    out = capsys.readouterr().out
    assert "late-error" in out
