# -*- coding: utf-8 -*-
"""Packed 6-bit µ-law wire (FFS_TPU_WIRE=mulaw6): codec exactness, native/
fallback staging parity, silence-fill semantics, and end-to-end label
agreement with the 8-bit wire.

The wire exists purely to cut host→device bytes (the end-to-end bottleneck
on a remote-attached TPU frontend) by 25%; the contract here is that its
~26 dB quantization SNR is transparent to every detector.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from ffsubsync_tpu import native
from ffsubsync_tpu.ops import features
from ffsubsync_tpu.ops.pallas import frontend as plf


def _random_pcm(n, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n) * 3000).clip(-32768, 32767).astype(np.int16)


def test_pack6_unpack6_roundtrip():
    """pack6 (host) and unpack_mulaw6's bit slicing (device) are inverses."""
    rng = np.random.RandomState(0)
    window = 120
    codes = rng.randint(0, 63, size=(8, window)).astype(np.uint8)
    packed = native.pack6(codes).view(np.int8)
    assert packed.shape == (8, window * 3 // 4)
    decoded = np.asarray(plf.unpack_mulaw6(jnp.asarray(packed), window))
    # invert the compander to recover the biased codes exactly
    y = decoded / (plf._MULAW_SCALE)
    mag = np.log2(np.abs(y) + 1.0) / 8.0 * plf.MULAW6_LEVELS
    recovered = (np.sign(y) * np.round(mag) + 31).astype(np.uint8)
    assert np.array_equal(recovered, codes)


def test_stage_p6_native_matches_fallback():
    """C++ fused stage (LUT + pack) is bit-exact vs the numpy fallback."""
    if not native.AVAILABLE:
        pytest.skip("native library not built")
    pcm = _random_pcm(120 * 700 * 4, seed=5)  # 4x decimation -> 700 windows
    t_pad = plf.padded_window_count(700)
    a = native.stage_for_device_p6(pcm, 2, 120, t_pad)
    lib, native._lib = native._lib, None
    try:
        b = native.stage_for_device_p6(pcm, 2, 120, t_pad)
    finally:
        native._lib = lib
    assert a.dtype == b.dtype == np.int8
    assert np.array_equal(a, b)


def test_mulaw6_snr_speech_grade():
    """6-bit wire decode SNR sits between 20 dB and the 8-bit wire's."""
    pcm = _random_pcm(48000, seed=7)
    codes = native.mulaw6_encode_host(pcm)
    packed = native.pack6(codes.reshape(400, 120)).view(np.int8)
    decoded = np.asarray(
        plf.unpack_mulaw6(jnp.asarray(packed), 120)
    ).reshape(-1)
    x = pcm.astype(np.float64)
    err = decoded - x
    snr6 = 10 * np.log10((x**2).mean() / max((err**2).mean(), 1e-12))
    dec8 = np.asarray(plf.mulaw_decode(jnp.asarray(plf.mulaw_encode_host(pcm))))
    err8 = dec8 - x
    snr8 = 10 * np.log10((x**2).mean() / max((err8**2).mean(), 1e-12))
    assert 20.0 < snr6 < snr8


def test_wire6_silence_rows_decode_to_silence():
    """Padding rows must decode to zero PCM (a zero BYTE would not)."""
    window = 120
    framed = np.zeros((4, window * 3 // 4), np.int8)
    rows = plf.wire_silence_rows(framed, 3, window)
    decoded = np.asarray(plf.unpack_mulaw6(jnp.asarray(rows), window))
    assert np.array_equal(decoded, np.zeros_like(decoded))
    # and a zero byte really would be catastrophic (guards the invariant)
    bad = np.asarray(plf.unpack_mulaw6(jnp.asarray(framed), window))
    assert np.abs(bad).max() > 30000


def test_wire_silence_rows_zero_for_narrow_mulaw():
    """The narrow 8-bit wire's silence is plain zero bytes."""
    framed = np.zeros((4, 120), np.int8)
    rows = plf.wire_silence_rows(framed, 2, 120)
    assert rows.dtype == np.int8 and rows.shape == (2, 120)
    assert not rows.any()


def test_narrow_mulaw_wire_bitexact_vs_padded(monkeypatch):
    """Shipping [T, window] and padding on device reproduces the legacy
    [T, wpad] frame's features bit-exactly (the pad columns are zeros
    either way)."""
    frame_rate, window = 12000, 120
    t = plf.TILE_T
    pcm = _random_pcm(t * window, seed=3)
    code = plf.mulaw_encode_host(pcm).reshape(t, window)
    mats = plf.make_frontend_mats(frame_rate, window)
    wide = np.zeros((t, mats.wpad), np.int8)
    wide[:, :window] = code
    lm_n, b_n, tot_n = plf.fused_frontend(jnp.asarray(code), mats, interpret=True)
    lm_w, b_w, tot_w = plf.fused_frontend(jnp.asarray(wide), mats, interpret=True)
    assert np.array_equal(np.asarray(lm_n), np.asarray(lm_w))
    assert np.array_equal(np.asarray(tot_n), np.asarray(tot_w))


@pytest.mark.parametrize("mode", ["fused", "webrtc", "silero"])
def test_wire6_detector_label_agreement(monkeypatch, mode):
    """End-to-end: labels under the 6-bit wire agree with the 8-bit wire's
    on realistic synthetic audio (quantization is far below every decision
    margin that matters; tiny flips at boundaries are tolerated)."""
    from ffsubsync_tpu.models.synth_data import speech_signal_for_spans
    from ffsubsync_tpu.ops.vad import make_detector

    monkeypatch.setenv("FFS_TPU_PALLAS_INTERPRET", "1")
    frame_rate, sample_rate = 12000, 100
    spans = [(2.0, 5.0), (8.0, 11.5), (15.0, 19.0), (24.0, 27.0)]
    x = speech_signal_for_spans(30.0, spans, frame_rate=frame_rate, seed=11)
    pcm = np.clip(x * 32767, -32768, 32767).astype(np.int16)

    labels = {}
    for wire in ("mulaw", "mulaw6"):
        monkeypatch.setenv("FFS_TPU_WIRE", wire)
        det = make_detector(mode, sample_rate, frame_rate, 0.0)
        labels[wire] = np.asarray(det(pcm.tobytes()))
    n = min(len(labels["mulaw"]), len(labels["mulaw6"]))
    a = labels["mulaw"][:n] > 0.5
    b = labels["mulaw6"][:n] > 0.5
    agreement = float((a == b).mean())
    assert agreement >= 0.995, "wire6 label agreement %.4f" % agreement


def test_prepare_staged_input_widths(monkeypatch):
    """Wire mode selects the staged row width; mulaw6 falls back to the
    narrow 8-bit wire when the window is not a multiple of 4."""
    pcm = _random_pcm(48000, seed=1)
    monkeypatch.setenv("FFS_TPU_WIRE", "mulaw")
    framed, mats, nw = features.prepare_staged_input(pcm, 12000, 100)
    assert framed.shape[1] == mats.window and framed.dtype == np.int8
    monkeypatch.setenv("FFS_TPU_WIRE", "mulaw6")
    framed6, mats6, nw6 = features.prepare_staged_input(pcm, 12000, 100)
    assert framed6.shape[1] == mats6.window * 3 // 4
    assert nw6 == nw
    monkeypatch.setenv("FFS_TPU_WIRE", "i16")
    framed16, mats16, _ = features.prepare_staged_input(pcm, 12000, 100)
    assert framed16.dtype == np.int16 and framed16.shape[1] == mats16.wpad
