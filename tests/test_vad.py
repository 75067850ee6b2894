# -*- coding: utf-8 -*-
"""VAD kernel tests: each backend must localize speech in synthetic audio."""
import numpy as np
import pytest

from ffsubsync_tpu.ops.vad import (
    make_auditok_detector,
    make_detector,
    make_fused_detector,
    make_webrtc_detector,
    tokenize_validity,
)

from tests.helpers import synth_speechlike

FRAME_RATE = 48000
SAMPLE_RATE = 100

SPANS = [(2.0, 4.0), (6.0, 9.0), (12.0, 13.5)]
DURATION = 16.0


def _pcm_bytes():
    x = synth_speechlike(DURATION, SPANS, FRAME_RATE, speech_level=0.4)
    return np.clip(x * 32767, -32768, 32767).astype("<i2").tobytes()


def _check_localization(labels, non_speech_label=0.0, min_recall=0.6,
                        max_false=0.25):
    n = len(labels)
    assert n == int(DURATION * SAMPLE_RATE)
    speech_mask = np.zeros(n, bool)
    for s, e in SPANS:
        speech_mask[int(s * SAMPLE_RATE):int(e * SAMPLE_RATE)] = True
    in_speech = (labels[speech_mask] > 0.5).mean()
    # leave a margin around true spans for hangover effects
    guard = np.zeros(n, bool)
    for s, e in SPANS:
        guard[max(0, int((s - 0.5) * SAMPLE_RATE)):int((e + 0.5) * SAMPLE_RATE)] = True
    out_speech = (labels[~guard] > 0.5).mean() if (~guard).any() else 0.0
    assert in_speech >= min_recall, "recall %.2f" % in_speech
    assert out_speech <= max_false, "false rate %.2f" % out_speech


@pytest.mark.parametrize("maker", [make_webrtc_detector, make_auditok_detector])
def test_energy_class_detectors_localize(maker):
    detector = maker(SAMPLE_RATE, FRAME_RATE, 0.0)
    labels = detector(_pcm_bytes())
    _check_localization(labels)


def test_neural_detector_localizes():
    detector = make_detector("silero", SAMPLE_RATE, FRAME_RATE, 0.0)
    labels = detector(_pcm_bytes())
    _check_localization(labels, min_recall=0.5)


@pytest.mark.parametrize("strategy", ["weighted", "intersection", "union"])
def test_fused_strategies(strategy):
    detector = make_fused_detector(SAMPLE_RATE, FRAME_RATE, 0.0, strategy)
    labels = detector(_pcm_bytes())
    _check_localization(labels, min_recall=0.4)


def test_fused_rejects_unknown_strategy():
    with pytest.raises(ValueError, match="unknown fused VAD strategy"):
        make_fused_detector(SAMPLE_RATE, FRAME_RATE, 0.0, "bogus")


def test_fusion_math_parity():
    """min/max/0.6-0.4 blend with tail clipping (parity:
    speech_transformers.py:282-294), via stubbed sub-detectors."""
    import ffsubsync_tpu.ops.vad as vad_mod

    webrtc = np.array([1.0, 0.0, 1.0, 0.0, 1.0])
    silero = np.array([0.8, 0.6, 0.0, 0.2])  # one frame shorter

    def fake_factory(result):
        def factory(sample_rate, frame_rate, non_speech_label):
            return lambda chunk: result
        return factory

    orig_w, orig_s = vad_mod.make_webrtc_detector, vad_mod.make_silero_detector
    vad_mod.make_webrtc_detector = fake_factory(webrtc)
    vad_mod.make_silero_detector = fake_factory(silero)
    try:
        out_i = vad_mod.make_fused_detector(100, 48000, 0.0, "intersection")(b"")
        out_u = vad_mod.make_fused_detector(100, 48000, 0.0, "union")(b"")
        out_w = vad_mod.make_fused_detector(100, 48000, 0.0, "weighted")(b"")
    finally:
        vad_mod.make_webrtc_detector = orig_w
        vad_mod.make_silero_detector = orig_s
    assert np.allclose(out_i, np.minimum(webrtc[:4], silero))
    assert np.allclose(out_u, np.maximum(webrtc[:4], silero))
    assert np.allclose(out_w, 0.6 * silero + 0.4 * webrtc[:4])


def test_non_speech_label_propagates():
    # standalone webrtc labels are three-valued: non-speech at the floor,
    # raw/trailing-hangover windows at 1.0, and pre-hangover windows at the
    # half-weight point between them (ops/vad constants block: the
    # fractional tail balances the aligner without counting as speech in
    # window scoring or extending clean-audio tie-break plateaus)
    detector = make_webrtc_detector(SAMPLE_RATE, FRAME_RATE, 0.5)
    labels = detector(_pcm_bytes())
    uniques = np.unique(labels)
    assert set(np.round(uniques, 3)).issubset({0.5, 0.75, 1.0})


def test_tokenizer_semantics():
    # min_length=3, max_length=8, max_continuous_silence=2
    valid = np.array([0, 1, 1, 1, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0], bool)
    tokens = tokenize_validity(valid, 3, 8, 2)
    # first token: 1-3 valid + 2 trailing silence kept; ends when silence > 2
    assert tokens[0][0] == 1
    # long run split at max_length 8
    assert any(e - s + 1 <= 8 for s, e in tokens)
    # short tokens dropped
    assert tokenize_validity(np.array([0, 1, 0, 0, 0], bool), 3, 8, 2) == []


def test_detector_dispatch():
    for name in ("webrtc", "subs_then_webrtc", "auditok", "subs_then_auditok",
                 "silero", "subs_then_silero", "fused", "fused:union"):
        assert make_detector(name, SAMPLE_RATE, FRAME_RATE, 0.0) is not None
    with pytest.raises(ValueError, match="unknown vad"):
        make_detector("bogus", SAMPLE_RATE, FRAME_RATE, 0.0)


def test_webrtc_state_carries_across_chunks():
    detector = make_webrtc_detector(SAMPLE_RATE, FRAME_RATE, 0.0)
    full = _pcm_bytes()
    half = len(full) // 2
    half -= half % 960  # keep chunk boundaries window-aligned
    l1 = detector(full[:half])
    l2 = detector(full[half:])
    combined = np.concatenate([l1, l2])
    _check_localization(combined, max_false=0.3)


def test_fused_onelaunch_matches_split_path(monkeypatch):
    """The single-program fused VAD (pallas interpret mode) agrees with the
    split CPU path (shared frontend + separate backend launches)."""
    import numpy as np
    import ffsubsync_tpu.ops.vad as vad_mod
    from ffsubsync_tpu.models.synth_data import speech_signal_for_spans

    frame_rate, sample_rate = 8000, 100
    spans = [(2.0, 4.0), (7.5, 9.0)]
    wav = speech_signal_for_spans(12.0, spans, frame_rate, speech_level=0.35)
    pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)

    split = vad_mod.make_fused_detector(sample_rate, frame_rate, 0.0)(pcm)
    monkeypatch.setenv("FFS_TPU_PALLAS_INTERPRET", "1")
    one = vad_mod.make_fused_detector(sample_rate, frame_rate, 0.0)(pcm)
    assert len(one) == len(split)
    np.testing.assert_allclose(one, split, atol=0.02)


def test_fused_onelaunch_chunked_state_carry(monkeypatch):
    """One-launch fused path: streaming chunks with carried state agree with
    the one-shot full signal away from chunk seams."""
    import numpy as np
    import ffsubsync_tpu.ops.vad as vad_mod
    from ffsubsync_tpu.models.synth_data import speech_signal_for_spans

    monkeypatch.setenv("FFS_TPU_PALLAS_INTERPRET", "1")
    frame_rate, sample_rate = 8000, 100
    spans = [(2.0, 4.0), (7.5, 9.0), (14.0, 16.5)]
    wav = speech_signal_for_spans(20.0, spans, frame_rate, speech_level=0.35)
    pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)

    full = vad_mod.make_fused_detector(sample_rate, frame_rate, 0.0)(pcm)
    det = vad_mod.make_fused_detector(sample_rate, frame_rate, 0.0)
    chunk = frame_rate * 7
    streamed = np.concatenate(
        [det(pcm[i : i + chunk]) for i in range(0, len(pcm), chunk)]
    )
    assert len(full) == len(streamed)
    # normalization stats differ per chunk; agreement is behavioral
    assert (np.abs(full - streamed) > 0.25).mean() < 0.05


@pytest.mark.parametrize("mode", ["webrtc", "silero"])
def test_single_backend_onelaunch_matches_split(mode, monkeypatch):
    """webrtc-only and silero-only detectors agree between the one-launch
    device program and the split CPU path."""
    import numpy as np
    import ffsubsync_tpu.ops.vad as vad_mod
    from ffsubsync_tpu.models.synth_data import speech_signal_for_spans

    frame_rate, sample_rate = 8000, 100
    spans = [(2.0, 4.0), (7.5, 9.0)]
    wav = speech_signal_for_spans(12.0, spans, frame_rate, speech_level=0.35)
    pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)

    factory = (
        vad_mod.make_webrtc_detector
        if mode == "webrtc"
        else vad_mod.make_silero_detector
    )
    split = factory(sample_rate, frame_rate, 0.0)(pcm)
    monkeypatch.setenv("FFS_TPU_PALLAS_INTERPRET", "1")
    one = factory(sample_rate, frame_rate, 0.0)(pcm)
    assert len(one) == len(split)
    # soft-probability drift between the fused program and the split path
    # (wire codec + normalization-order fp) stays ~1e-2; decisions are at 0.5
    np.testing.assert_allclose(one, split, atol=0.03)


def test_pipelined_dispatch_matches_manual_chunks(monkeypatch):
    """Internal pipeline chunking (async dispatch, one pull) is EXACTLY the
    same computation as feeding the chunks through the state-carrying
    detector one at a time."""
    import numpy as np
    import ffsubsync_tpu.ops.vad as vad_mod
    from ffsubsync_tpu.models.synth_data import speech_signal_for_spans

    monkeypatch.setenv("FFS_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("FFS_TPU_PIPELINE_SECONDS", "6")
    frame_rate, sample_rate = 8000, 100
    spans = [(2.0, 4.0), (7.5, 9.0), (14.0, 16.5)]
    wav = speech_signal_for_spans(20.0, spans, frame_rate, speech_level=0.35)
    pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)

    pipelined = vad_mod.make_fused_detector(sample_rate, frame_rate, 0.0)(pcm)
    det = vad_mod.make_fused_detector(sample_rate, frame_rate, 0.0)
    chunk = vad_mod._pipeline_chunk_samples(frame_rate, sample_rate)
    assert chunk == 6 * frame_rate
    manual = np.concatenate(
        [det(pcm[i : i + chunk]) for i in range(0, len(pcm), chunk)]
    )
    np.testing.assert_array_equal(pipelined, manual)


def test_dispatch_async_gather_matches_sync(monkeypatch):
    """detector.dispatch_async + gather == calling the detector per chunk."""
    import numpy as np
    import ffsubsync_tpu.ops.vad as vad_mod
    from ffsubsync_tpu.models.synth_data import speech_signal_for_spans

    monkeypatch.setenv("FFS_TPU_PALLAS_INTERPRET", "1")
    frame_rate, sample_rate = 8000, 100
    wav = speech_signal_for_spans(
        14.0, [(2.0, 4.0), (8.0, 10.0)], frame_rate, speech_level=0.35
    )
    pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)
    chunk = frame_rate * 5

    det_sync = vad_mod.make_fused_detector(sample_rate, frame_rate, 0.0)
    expected = np.concatenate(
        [det_sync(pcm[i : i + chunk]) for i in range(0, len(pcm), chunk)]
    )
    det = vad_mod.make_fused_detector(sample_rate, frame_rate, 0.0)
    handles = [
        det.dispatch_async(pcm[i : i + chunk].tobytes())
        for i in range(0, len(pcm), chunk)
    ]
    got = det.gather(handles)
    np.testing.assert_array_equal(got, expected)


def test_auditok_tokens_invariant_to_pipeline_chunking(monkeypatch):
    """The energy tokenizer's output must not depend on pipeline chunk
    boundaries: dispatch buffers PCM and gather tokenizes the WHOLE signal
    (a token straddling a chunk edge must not split or vanish)."""
    import numpy as np
    import ffsubsync_tpu.ops.vad as vad_mod
    from ffsubsync_tpu.models.synth_data import speech_signal_for_spans

    frame_rate = 8000
    # one long token deliberately straddling the 5 s chunk boundary
    wav = speech_signal_for_spans(
        12.0, [(4.0, 6.5), (9.0, 10.0)], frame_rate, speech_level=0.5
    )
    pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)
    det = vad_mod.make_auditok_detector(100, frame_rate, 0.0)
    whole = np.asarray(det(pcm))
    chunk = frame_rate * 5
    det2 = vad_mod.make_auditok_detector(100, frame_rate, 0.0)
    handles = [
        det2.dispatch_async(pcm[i : i + chunk])
        for i in range(0, len(pcm), chunk)
    ]
    gathered = np.asarray(det2.gather(handles))
    np.testing.assert_array_equal(gathered, whole)


def test_weights_reachability_per_frame_rate(monkeypatch):
    """Which weights file each decode rate actually loads (EVAL.md "Which
    weights each tier exercises"). The staging pass half-band decimates to
    the 12 kHz floor, so the DEFAULT path reaches only the 12000/16000/8000
    files; the 24000 and rate-less fallback files serve the opt-in
    full-rate mode. This attribution confused two EVAL refreshes — pin it.
    """
    import os

    from ffsubsync_tpu.models.neural_vad import default_weights_path
    from ffsubsync_tpu.ops.features import analysis_rate

    monkeypatch.delenv("FFS_TPU_ANALYSIS_DECIMATE", raising=False)
    for frame_rate, suffix in (
        (48000, "_12000"),
        (24000, "_12000"),
        (16000, "_16000"),
        (12000, "_12000"),
        (8000, "_8000"),
    ):
        path = default_weights_path(analysis_rate(frame_rate, 100))
        assert path.endswith("neural_vad_weights%s.npz" % suffix), (
            frame_rate,
            path,
        )
    monkeypatch.setenv("FFS_TPU_ANALYSIS_DECIMATE", "0")
    assert default_weights_path(analysis_rate(24000, 100)).endswith(
        "neural_vad_weights_24000.npz"
    )
    # no rated file ships for 48000: full-rate analysis takes the fallback
    assert default_weights_path(analysis_rate(48000, 100)).endswith(
        os.sep + "neural_vad_weights.npz"
    )
