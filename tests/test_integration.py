# -*- coding: utf-8 -*-
"""Data-driven integration tier (model: reference tests/test_integration.py).

The reference drives real media from a private submodule against a YAML
config and accepts a sync when the rasterized 100 Hz bitstrings of output
and ground truth agree on ≥99% of windows (test_integration.py:57-63).
Media here is synthesized (no private data), but the harness keeps the same
shape: a case table of (reference kind, CLI args, perturbation), a full CLI
run per case, and the same ``timestamps_roughly_match`` acceptance metric.

Like the reference, the heavy tier is gated: set ``INTEGRATION=1`` to run
every case; by default a one-case smoke subset runs.
"""
import os

import numpy as np
import pytest

from ffsubsync_tpu.cli import make_parser
from ffsubsync_tpu.constants import SAMPLE_RATE
from ffsubsync_tpu.sync import run

INTEGRATION = os.environ.get("INTEGRATION") == "1"

SPANS = [
    (4.0, 6.5), (9.0, 11.0), (15.5, 18.0), (22.0, 23.5),
    (27.0, 30.0), (34.5, 36.0), (41.0, 44.0), (48.5, 50.0),
]
DURATION = 55.0


def _ts(t: float) -> str:
    ms = int(round(t * 1000))
    return "%02d:%02d:%02d,%03d" % (
        ms // 3600000, ms % 3600000 // 60000, ms % 60000 // 1000, ms % 1000
    )


def _srt_for_spans(spans) -> str:
    return "".join(
        "%d\n%s --> %s\nline %d\n\n" % (i + 1, _ts(a), _ts(b), i + 1)
        for i, (a, b) in enumerate(spans)
    )


def _rasterize(path: str) -> np.ndarray:
    """100 Hz bitstring of an srt file (the acceptance metric's domain)."""
    from ffsubsync_tpu.subs.parser import SubtitleParser
    from ffsubsync_tpu.subs.raster import rasterize_cues

    parser = SubtitleParser(fmt="srt", encoding="infer").fit(path)
    return rasterize_cues(
        list(parser.subs_), sample_rate=SAMPLE_RATE
    ).materialize()


def timestamps_roughly_match(a: str, b: str, min_agreement: float = 0.99) -> bool:
    """≥99% agreement of rasterized 100 Hz bitstrings (reference metric)."""
    sa, sb = _rasterize(a), _rasterize(b)
    n = max(len(sa), len(sb))
    pa = np.zeros(n)
    pb = np.zeros(n)
    pa[: len(sa)] = sa
    pb[: len(sb)] = sb
    return ((pa > 0.5) == (pb > 0.5)).mean() >= min_agreement


# case table: (id, reference kind, perturbation, extra CLI args)
CASES = [
    ("srt_shift", "srt", {"shift": 3.0}, []),
    ("srt_shift_neg", "srt", {"shift": -2.25}, []),
    ("srt_ratio", "srt", {"shift": 1.5, "ratio": 25.0 / 23.976}, []),
    ("wav_webrtc", "wav", {"shift": 2.75}, []),
    ("wav_fused", "wav", {"shift": -1.5}, ["--vad", "fused"]),
    ("wav_auditok", "wav", {"shift": 2.0}, ["--vad", "auditok"]),
    ("npz_roundtrip", "npz", {"shift": 2.5}, []),
    ("wav_gss", "wav", {"shift": 1.25, "ratio": 24.0 / 23.976}, ["--gss"]),
    # telephone-band reference: the native path stays at the file's 8 kHz
    # (rate-specific neural weights shipped in-tree)
    ("wav8k_fused", "wav", {"shift": 1.75, "wav_rate": 8000}, ["--vad", "fused"]),
    ("wav_multiseg", "wav", {"shift": 2.0},
     ["--multi-segment-sync", "--segment-count", "4"]),
]

SMOKE_CASES = [c for c in CASES if c[0] in ("srt_shift", "wav_webrtc")]


def _build_case(tmp_path, kind, perturb):
    shift = perturb.get("shift", 0.0)
    ratio = perturb.get("ratio", 1.0)
    truth = tmp_path / "truth.srt"
    truth.write_text(_srt_for_spans(SPANS))
    unsynced = tmp_path / "unsynced.srt"
    unsynced.write_text(
        _srt_for_spans([(a * ratio - shift, b * ratio - shift) for a, b in SPANS])
    )
    if kind == "srt":
        return str(truth), str(unsynced)
    from ffsubsync_tpu.models.synth_data import speech_signal_for_spans
    from tests.helpers import write_wav

    wav_rate = perturb.get("wav_rate", 16000)
    wav_path = tmp_path / "ref.wav"
    write_wav(
        str(wav_path),
        speech_signal_for_spans(DURATION, SPANS, wav_rate, speech_level=0.4),
        wav_rate,
    )
    if kind == "wav":
        return str(wav_path), str(unsynced)
    assert kind == "npz"
    npz_path = tmp_path / "ref.npz"
    signal = np.zeros(int(DURATION * SAMPLE_RATE))
    for a, b in SPANS:
        signal[int(a * SAMPLE_RATE) : int(b * SAMPLE_RATE)] = 1.0
    np.savez_compressed(str(npz_path), speech=signal)
    return str(npz_path), str(unsynced)


def test_integration_embedded_subs_fast_path(tmp_path, monkeypatch):
    """The default subs_then_* mode's embedded-subtitle fast path, driven
    through the FULL CLI with a protocol-faithful fake ffmpeg/ffprobe
    (model: the reference's tests/test_embedded_subs.py driving the
    extraction protocol — here all the way to the written output)."""
    import ffsubsync_tpu.media.embedded as embedded

    truth_srt = _srt_for_spans(SPANS).encode()

    class _Popen:
        def __init__(self, args, **kwargs):
            self.returncode = 0
            self._out = b""
            if "ffprobe" in os.path.basename(args[0]):
                self._out = b"2,subrip\n"
            else:
                # single-pass extraction writes to the temp .srt outputs
                outs = [a for a in args if a.endswith(".srt")]
                for p in outs:
                    with open(p, "wb") as f:
                        f.write(truth_srt)

        @property
        def stdout(self):
            return self

        def read(self, *a):
            return self._out

        def communicate(self, *a, **k):
            return self._out, b""

    monkeypatch.setattr(embedded.subprocess, "Popen", _Popen)
    movie = tmp_path / "movie.mkv"
    movie.write_bytes(b"\x00")
    (tmp_path / "truth.srt").write_text(_srt_for_spans(SPANS))
    unsynced = tmp_path / "unsynced.srt"
    unsynced.write_text(_srt_for_spans([(a - 2.5, b - 2.5) for a, b in SPANS]))
    out = tmp_path / "synced.srt"
    args = make_parser().parse_args(
        [str(movie), "-i", str(unsynced), "-o", str(out)]
    )
    result = run(args)
    assert result["retval"] == 0
    assert result["sync_was_successful"]
    assert timestamps_roughly_match(str(tmp_path / "truth.srt"), str(out))


def test_integration_pgs_reference(tmp_path, monkeypatch):
    """A PGS (bitmap) subtitle stream as the reference, through the FULL
    CLI: ffprobe fakes provide the stream listing and packet timings; the
    output must land on the truth timeline."""
    import ffsubsync_tpu.media.pgs as pgs

    payload = {
        "streams": [
            {"codec_type": "subtitle", "codec_name": "hdmv_pgs_subtitle",
             "index": 2}
        ],
        "packets": [
            {"pts_time": str(a), "duration_time": str(b - a), "size": "4000"}
            for a, b in SPANS
        ],
    }
    monkeypatch.setattr(pgs, "ffprobe_json", lambda *a, **k: payload)
    movie = tmp_path / "movie.mkv"
    movie.write_bytes(b"\x00")
    (tmp_path / "truth.srt").write_text(_srt_for_spans(SPANS))
    unsynced = tmp_path / "unsynced.srt"
    unsynced.write_text(_srt_for_spans([(a + 3.25, b + 3.25) for a, b in SPANS]))
    out = tmp_path / "synced.srt"
    args = make_parser().parse_args(
        [str(movie), "-i", str(unsynced), "-o", str(out),
         "--pgs-ref-stream", "auto"]
    )
    result = run(args)
    assert result["retval"] == 0
    assert result["sync_was_successful"]
    assert timestamps_roughly_match(str(tmp_path / "truth.srt"), str(out))


@pytest.mark.parametrize(
    "case_id,kind,perturb,extra",
    CASES if INTEGRATION else SMOKE_CASES,
    ids=[c[0] for c in (CASES if INTEGRATION else SMOKE_CASES)],
)
def test_integration_case(tmp_path, case_id, kind, perturb, extra):
    reference, unsynced = _build_case(tmp_path, kind, perturb)
    out = tmp_path / "synced.srt"
    argv = [reference, "-i", unsynced, "-o", str(out)]
    if kind == "wav":
        argv += ["--frame-rate", str(perturb.get("wav_rate", 16000))]
    argv += extra
    args = make_parser().parse_args(argv)
    result = run(args)
    assert result["retval"] == 0
    assert result["sync_was_successful"]
    assert timestamps_roughly_match(str(tmp_path / "truth.srt"), str(out)), (
        "case %s: output disagrees with ground truth on >1%% of windows"
        % case_id
    )
