# -*- coding: utf-8 -*-
"""Fused Pallas frontend: parity with the jnp composition, bucketing, and
the parallel webrtc recurrences vs a straight sequential reference."""
import numpy as np
import pytest

import jax.numpy as jnp

from ffsubsync_tpu.ops import features
from ffsubsync_tpu.ops.pallas import frontend as plf


def _random_pcm(n, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n) * 3000).clip(-32768, 32767).astype(np.int16)


def test_pallas_kernel_matches_jnp_frontend(monkeypatch):
    """The kernel (interpret mode) and the jnp fallback compute identical
    features from the same PCM."""
    frame_rate, sample_rate = 8000, 100
    window = frame_rate // sample_rate  # 80
    t = plf.TILE_T * 2
    pcm = _random_pcm(t * window)

    mats = plf.make_frontend_mats(frame_rate, window)
    logmel_k, bands_k, total_k = plf.fused_frontend(
        jnp.asarray(pcm), mats, interpret=True
    )

    monkeypatch.setenv("FFS_TPU_DISABLE_PALLAS", "1")
    monkeypatch.setenv("FFS_TPU_WIRE", "i16")
    logmel_j, bands_j, total_j, n_windows = features.compute_frontend(
        pcm, frame_rate, sample_rate
    )
    assert n_windows == t
    np.testing.assert_allclose(
        np.asarray(logmel_k), np.asarray(logmel_j)[: t], rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(bands_k), np.asarray(bands_j)[: t], rtol=2e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(total_k), np.asarray(total_j)[: t], rtol=1e-4
    )


def test_jnp_frontend_matches_legacy_helpers(monkeypatch):
    """compute_frontend's jnp path reproduces the original per-op helpers
    (log_mel_features / band_energies / window_energies_db) on the exact
    (i16) wire."""
    monkeypatch.setenv("FFS_TPU_WIRE", "i16")
    frame_rate, sample_rate = 8000, 100
    window = frame_rate // sample_rate
    n_windows = 300
    pcm = _random_pcm(n_windows * window, seed=1)

    logmel, bands, total, nw = features.compute_frontend(
        pcm, frame_rate, sample_rate
    )
    assert nw == n_windows
    n_freqs = window // 2 + 1
    mel_fb = jnp.asarray(features.mel_filterbank(n_freqs, frame_rate, 40))
    band_sel = jnp.asarray(
        features.band_selector_matrix(n_freqs, frame_rate, window)
    )
    ref_logmel = np.asarray(
        features.log_mel_features(jnp.asarray(pcm), mel_fb, window)
    )
    ref_bands, _ = features.band_energies(jnp.asarray(pcm), band_sel, window)
    ref_db = np.asarray(features.window_energies_db(jnp.asarray(pcm), window))

    np.testing.assert_allclose(
        np.asarray(logmel)[:n_windows], ref_logmel, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(bands)[:n_windows], np.asarray(ref_bands), rtol=1e-4, atol=1e-6
    )
    got_db = 10.0 * np.log10(np.maximum(np.asarray(total)[:n_windows], 1e-10))
    np.testing.assert_allclose(got_db, ref_db, rtol=1e-4, atol=1e-3)


def test_mulaw_roundtrip_snr():
    """µ-law wire codec: exact arithmetic inverse, speech-grade SNR."""
    pcm = _random_pcm(48000, seed=7)
    code = plf.mulaw_encode_host(pcm)
    assert code.dtype == np.int8
    decoded = np.asarray(plf.mulaw_decode(jnp.asarray(code)))
    x = pcm.astype(np.float64)
    err = decoded - x
    snr_db = 10 * np.log10((x**2).mean() / max((err**2).mean(), 1e-12))
    assert snr_db > 30.0  # companded 8-bit speech quality
    # exact inverse at the code points: re-encoding the decode is a fixpoint
    assert np.array_equal(plf.mulaw_encode_host(decoded.astype(np.int16)), code)


def test_frontend_mulaw_wire_parity(monkeypatch):
    """On the µ-law wire, the Pallas kernel and the jnp fallback still agree
    (both decode the same codes on device)."""
    frame_rate, sample_rate = 8000, 100
    window = frame_rate // sample_rate
    t = plf.TILE_T
    pcm = _random_pcm(t * window, seed=3)
    code = plf.mulaw_encode_host(pcm)

    mats = plf.make_frontend_mats(frame_rate, window)
    logmel_k, bands_k, total_k = plf.fused_frontend(
        jnp.asarray(code), mats, interpret=True
    )
    monkeypatch.setenv("FFS_TPU_DISABLE_PALLAS", "1")
    monkeypatch.setenv("FFS_TPU_WIRE", "mulaw")
    logmel_j, bands_j, total_j, nw = features.compute_frontend(
        pcm, frame_rate, sample_rate
    )
    assert nw == t
    np.testing.assert_allclose(
        np.asarray(logmel_k), np.asarray(logmel_j)[:t], rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(total_k), np.asarray(total_j)[:t], rtol=1e-3
    )


def test_padded_window_count_properties():
    for n in [1, 7, 255, 256, 1000, 54321, 540000, 2_000_000]:
        t = plf.padded_window_count(n)
        assert t >= n
        assert t % plf.TILE_T == 0
        assert t <= max(plf.TILE_T, int(n * 1.13) + plf.TILE_T)
    # bucketing: nearby lengths share a padded shape
    assert plf.padded_window_count(540000) == plf.padded_window_count(539000)


def _webrtc_sequential_reference(bands, logmel, ema0, noise0,
                                 prev_p0=None, prev_m0=None,
                                 prev_ldb0=None, prev_ldb_len0=0):
    """Straight numpy transcription of the sequential recurrences the
    parallel kernel replaces (incl. the spectral-motion duty-cycle gate
    and the sustained-music syllabic-modulation veto)."""
    from ffsubsync_tpu.ops import vad as vad_mod

    alpha = vad_mod._ENERGY_EMA_ALPHA
    growth = vad_mod._NOISE_FLOOR_GROWTH
    w = vad_mod._BAND_WEIGHTS
    thresh = vad_mod._SNR_THRESHOLD_DB
    hang_n = vad_mod._HANGOVER_WINDOWS
    k = vad_mod._FLUX_BOX_K
    big_l = vad_mod._SYL_LOOKBACK
    n = len(bands)

    mel = np.exp(logmel)
    p = mel / mel.sum(axis=1, keepdims=True)
    flux = np.empty(n)
    prev = p[0] if prev_p0 is None else prev_p0
    for t in range(n):
        flux[t] = 0.5 * np.abs(p[t] - prev).sum()
        prev = p[t]

    e = np.maximum(bands, 1e-12)
    ema = ema0.copy()
    noise = noise0.copy()
    score = np.empty(n)
    noise_frac = np.empty(n)
    ldb = np.empty(n)
    for t in range(n):
        ema = np.where(np.isinf(ema), e[t], alpha * e[t] + (1 - alpha) * ema)
        noise = np.minimum(ema, noise * growth)
        snr_db = 10.0 * (np.log10(ema) - np.log10(noise))
        score[t] = float(np.dot(snr_db, w) / w.sum())
        noise_frac[t] = noise.sum() / ema.sum()
        ldb[t] = 10.0 * np.log10(max(e[t].sum(), noise.sum()))
    flux_c = np.maximum(flux - vad_mod._FLUX_NOISE_C * noise_frac, 0.0)
    moving = flux_c > vad_mod._FLUX_MOVE_THRESHOLD
    active = score > thresh
    ind = np.stack([(moving & active) * 1.0, active * 1.0], axis=1)
    n_prev = 0 if prev_m0 is None else len(prev_m0)
    ind_ext = np.concatenate(
        [prev_m0 if n_prev else np.zeros((0, 2)), ind], axis=0
    )
    frac = np.empty(n)
    for t in range(n):
        lo = max(t - k, -n_prev) + n_prev
        hi = min(t + k, n - 1) + n_prev
        box = ind_ext[lo : hi + 1]
        frac[t] = box[:, 0].sum() / max(box[:, 1].sum(), 1.0)

    # sustained-music veto: band-passed dB-energy modulation in a ±k box
    if prev_ldb0 is None:
        prev_ldb0 = np.zeros(big_l)
        prev_ldb_len0 = 0
    prev_v = (np.arange(big_l) >= big_l - prev_ldb_len0).astype(float)
    ldb_ext = np.concatenate([np.where(prev_v > 0, prev_ldb0, 0.0), ldb])
    v_ext = np.concatenate([prev_v, np.ones(n)])

    def boxmean(x, v, pos, k0):
        lo = max(pos - k0, 0)
        hi = min(pos + k0, len(x) - 1)
        return (x[lo : hi + 1] * v[lo : hi + 1]).sum() / max(
            v[lo : hi + 1].sum(), 1.0
        )

    bp = np.array(
        [
            boxmean(ldb_ext, v_ext, i, vad_mod._SYL_SHORT_K)
            - boxmean(ldb_ext, v_ext, i, vad_mod._SYL_LONG_K)
            for i in range(big_l + n)
        ]
    )
    sylmod = np.array(
        [
            boxmean(np.abs(bp), v_ext, t + big_l, k)
            for t in range(n)
        ]
    )

    raws = np.array(
        [
            bool(
                active[t]
                and moving[t]
                and frac[t] > vad_mod._FLUX_FRAC_THRESHOLD
                and sylmod[t] > vad_mod._SYL_MOD_THRESHOLD
            )
            for t in range(n)
        ]
    )
    pre_n = vad_mod._PRE_HANGOVER_WINDOWS
    pre_w = vad_mod._PRE_HANGOVER_WEIGHT
    speech = np.zeros(n, np.float64)
    speech_fuse = np.zeros(n, bool)
    for t in range(n):
        speech_fuse[t] = raws[max(t - hang_n + 1, 0) : t + 1].any()
        if speech_fuse[t]:
            speech[t] = 1.0
        elif raws[t : t + pre_n].any():
            speech[t] = pre_w
    return (
        speech, speech_fuse, ema, noise, p[-1], ind_ext[-k:],
        min(n_prev + n, k), ldb_ext[-big_l:], min(prev_ldb_len0 + n, big_l),
    )


def _random_logmel(rng, t, m=40):
    # spectra with real frame-to-frame structure: a slow drift component
    # plus per-frame jitter, so the flux gate sees both regimes
    base = np.cumsum(rng.randn(t, m) * 0.2, axis=0) * 0.1
    return (base + rng.randn(t, m)).astype(np.float32)


@pytest.mark.parametrize("carry_in", [False, True])
def test_parallel_webrtc_matches_sequential(carry_in):
    from ffsubsync_tpu.ops.vad import _webrtc_from_bands

    rng = np.random.RandomState(42)
    t, b = 400, 6
    # piecewise loud/quiet segments exercise both floor tracking and hangover
    bands = np.exp(rng.randn(t, b)).astype(np.float32)
    bands[100:160] *= 300.0
    bands[300:330] *= 500.0
    logmel = _random_logmel(rng, t)
    from ffsubsync_tpu.ops import vad as vad_mod

    k = vad_mod._FLUX_BOX_K
    big_l = vad_mod._SYL_LOOKBACK
    if carry_in:
        ema0 = np.exp(rng.randn(b)).astype(np.float32)
        noise0 = (np.exp(rng.randn(b)) * 0.1).astype(np.float32)
        prev_p0 = rng.dirichlet(np.ones(40)).astype(np.float32)
        prev_act = (rng.rand(k) > 0.3).astype(np.float32)
        prev_m0 = np.stack(
            [(rng.rand(k) > 0.5).astype(np.float32) * prev_act, prev_act],
            axis=1,
        )
        prev_len0 = np.int32(k)
        prev_ldb0 = (rng.randn(big_l) * 4.0 + 20.0).astype(np.float32)
        prev_ldb_len0 = np.int32(big_l)
    else:
        ema0 = np.full(b, np.inf, np.float32)
        noise0 = np.full(b, np.inf, np.float32)
        prev_p0 = np.full(40, np.inf, np.float32)
        prev_m0 = np.zeros((k, 2), np.float32)
        prev_len0 = np.int32(0)
        prev_ldb0 = np.zeros(big_l, np.float32)
        prev_ldb_len0 = np.int32(0)

    (
        want_speech, want_fuse, want_ema, want_noise, want_p, want_m,
        want_len, want_ldb, want_ldb_len,
    ) = _webrtc_sequential_reference(
        bands.astype(np.float64),
        logmel.astype(np.float64),
        ema0.astype(np.float64),
        noise0.astype(np.float64),
        prev_p0=None if not carry_in else prev_p0.astype(np.float64),
        prev_m0=None if not carry_in else prev_m0.astype(np.float64),
        prev_ldb0=None if not carry_in else prev_ldb0.astype(np.float64),
        prev_ldb_len0=int(prev_ldb_len0),
    )
    (
        got_speech, got_fuse, got_ema, got_noise, got_p, got_m, got_len,
        got_ldb, got_ldb_len,
    ) = _webrtc_from_bands(
        jnp.asarray(bands), jnp.asarray(logmel), jnp.int32(t),
        jnp.asarray(ema0), jnp.asarray(noise0), jnp.asarray(prev_p0),
        jnp.asarray(prev_m0), prev_len0, jnp.asarray(prev_ldb0),
        prev_ldb_len0,
    )
    assert np.array_equal(np.asarray(got_speech), want_speech)
    assert np.array_equal(np.asarray(got_fuse), want_fuse)
    np.testing.assert_allclose(np.asarray(got_ema), want_ema, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_noise), want_noise, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_p), want_p, rtol=1e-3, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_m), want_m)
    assert int(got_len) == want_len
    np.testing.assert_allclose(np.asarray(got_ldb), want_ldb, rtol=1e-4)
    assert int(got_ldb_len) == want_ldb_len


def test_parallel_webrtc_padding_is_inert():
    """Bucket padding past n_valid must not change outputs or carried state."""
    from ffsubsync_tpu.ops.vad import _webrtc_from_bands

    rng = np.random.RandomState(3)
    t, b = 257, 6
    bands = np.exp(rng.randn(t, b)).astype(np.float32)
    bands[50:90] *= 200.0
    logmel = _random_logmel(rng, t)
    from ffsubsync_tpu.ops import vad as vad_mod

    k = vad_mod._FLUX_BOX_K
    big_l = vad_mod._SYL_LOOKBACK
    ema0 = np.full(b, np.inf, np.float32)
    noise0 = np.full(b, np.inf, np.float32)
    prev_p0 = np.full(40, np.inf, np.float32)
    prev_m0 = np.zeros((k, 2), np.float32)
    prev_len0 = np.int32(0)
    prev_ldb0 = np.zeros(big_l, np.float32)
    prev_ldb_len0 = np.int32(0)

    s1, sf1, e1, n1, p1, m1, l1, d1, dl1 = _webrtc_from_bands(
        jnp.asarray(bands), jnp.asarray(logmel), jnp.int32(t),
        jnp.asarray(ema0), jnp.asarray(noise0), jnp.asarray(prev_p0),
        jnp.asarray(prev_m0), prev_len0, jnp.asarray(prev_ldb0),
        prev_ldb_len0,
    )
    padded = np.zeros((512, b), np.float32)
    padded[:t] = bands
    padded_lm = np.zeros((512, 40), np.float32)
    padded_lm[:t] = logmel
    s2, sf2, e2, n2, p2, m2, l2, d2, dl2 = _webrtc_from_bands(
        jnp.asarray(padded), jnp.asarray(padded_lm), jnp.int32(t),
        jnp.asarray(ema0), jnp.asarray(noise0), jnp.asarray(prev_p0),
        jnp.asarray(prev_m0), prev_len0, jnp.asarray(prev_ldb0),
        prev_ldb_len0,
    )
    assert np.array_equal(np.asarray(s1)[:t], np.asarray(s2)[:t])
    assert np.array_equal(np.asarray(sf1)[:t], np.asarray(sf2)[:t])
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    assert int(l1) == int(l2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)
    assert int(dl1) == int(dl2)


def test_detector_chunked_vs_fullsignal_webrtc():
    """Feeding the whole PCM in one call equals streaming it in chunks
    (state is carried), for the spectral detector."""
    from ffsubsync_tpu.ops.vad import make_webrtc_detector
    from ffsubsync_tpu.models.synth_data import speech_signal_for_spans

    frame_rate, sample_rate = 8000, 100
    duration = 20.0
    spans = [(2.0, 4.0), (7.5, 9.0), (14.0, 17.0)]
    wav = speech_signal_for_spans(duration, spans, frame_rate, speech_level=0.3)
    pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)

    full = make_webrtc_detector(sample_rate, frame_rate, 0.0)(pcm)
    chunked_det = make_webrtc_detector(sample_rate, frame_rate, 0.0)
    chunk = frame_rate * 7  # deliberately not a whole number of seconds·10
    parts = [
        chunked_det(pcm[i : i + chunk]) for i in range(0, len(pcm), chunk)
    ]
    streamed = np.concatenate(parts)
    assert len(full) == len(streamed)
    # identical recurrences → identical labels away from chunk seams. Each
    # seam may legitimately differ on up to _PRE_HANGOVER_WINDOWS left of
    # it (the truncated-right lookahead policy: a chunk cannot see the next
    # chunk's raw votes) plus the hangover's reset right of it; production
    # pipeline chunks are >= 600 s so the seam share is ~1e-4, but this
    # test's deliberately tiny 7 s chunks make it a few percent.
    from ffsubsync_tpu.ops import vad as vad_mod

    seams = len(parts) - 1
    seam_budget = seams * (
        vad_mod._PRE_HANGOVER_WINDOWS + vad_mod._HANGOVER_WINDOWS + 2
    )
    assert (full != streamed).sum() <= seam_budget
    # and every disagreement sits within one seam's window of a boundary
    diff_idx = np.nonzero(full != streamed)[0]
    bounds = np.arange(1, seams + 1) * (chunk // (frame_rate // sample_rate))
    for i in diff_idx:
        assert any(
            b - vad_mod._PRE_HANGOVER_WINDOWS - 1
            <= i
            <= b + vad_mod._HANGOVER_WINDOWS
            for b in bounds
        ), i
