# -*- coding: utf-8 -*-
"""Device-side audio feature extraction: framing, energies, band spectra.

The reference's VAD backends consume raw s16le PCM on the host (C++ webrtcvad
per 10 ms frame, auditok energy validator, torch silero —
ffsubsync/speech_transformers.py:101-296). Here the per-window feature math
runs on the TPU over whole ~100 s chunks at once:

- PCM chunks are framed into ``[T, W]`` windows (``W = frame_rate //
  sample_rate``, 480 @ 48 kHz / 100 Hz);
- window power/energy is a single fused reduction;
- sub-band energies come from an rFFT followed by a ``[F, B]`` band-selector
  matmul (MXU work), giving the webrtc-class detector its 6 classic bands
  (80-250-500-1k-2k-3k-4k Hz);
- log-mel features for the neural VAD use a mel filterbank matmul.

All functions are jit-compatible with static shapes; the last (short) chunk is
padded to the canonical chunk length by the host and masked by ``n_valid``.
"""
import math
import os
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

WEBRTC_BAND_EDGES_HZ = (80.0, 250.0, 500.0, 1000.0, 2000.0, 3000.0, 4000.0)


def frames_per_window(frame_rate: int, sample_rate: int) -> int:
    """Audio samples per 10 ms analysis window (= per output label)."""
    return frame_rate // sample_rate


def frame_chunk(pcm: jnp.ndarray, window: int) -> jnp.ndarray:
    """[N] samples → [N // window, window] (N must be a multiple of window)."""
    n_windows = pcm.shape[0] // window
    return pcm[: n_windows * window].reshape(n_windows, window)


@partial(jax.jit, static_argnames=("window",))
def window_energies_db(pcm_i16: jnp.ndarray, window: int) -> jnp.ndarray:
    """Per-window signal energy in dB over int16 amplitudes.

    ``10·log10(mean(x²))`` — the auditok ``AudioEnergyValidator`` convention,
    so the default threshold of 50 keeps its meaning.
    """
    frames = frame_chunk(pcm_i16.astype(jnp.float32), window)
    power = jnp.mean(frames * frames, axis=-1)
    return 10.0 * jnp.log10(jnp.maximum(power, 1e-10))


def band_selector_matrix(
    n_freqs: int, frame_rate: int, window: int, edges_hz=WEBRTC_BAND_EDGES_HZ
) -> np.ndarray:
    """[n_freqs, n_bands] 0/1 matrix mapping rFFT bins to sub-bands."""
    freqs = np.fft.rfftfreq(window, d=1.0 / frame_rate)[:n_freqs]
    n_bands = len(edges_hz) - 1
    sel = np.zeros((n_freqs, n_bands), dtype=np.float32)
    for b in range(n_bands):
        lo, hi = edges_hz[b], edges_hz[b + 1]
        sel[(freqs >= lo) & (freqs < hi), b] = 1.0
    return sel


@partial(jax.jit, static_argnames=("window",))
def band_energies(pcm_i16: jnp.ndarray, band_sel: jnp.ndarray, window: int):
    """Per-window sub-band powers [T, B] plus total power [T].

    rFFT over each window, power spectrum, then a [F, B] matmul onto the MXU.
    """
    frames = frame_chunk(pcm_i16.astype(jnp.float32) / 32768.0, window)
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # [T, F]
    bands = jnp.dot(power, band_sel, preferred_element_type=jnp.float32)
    total = jnp.mean(frames * frames, axis=-1)
    return bands, total


def mel_filterbank(
    n_freqs: int, frame_rate: int, n_mels: int = 40,
    fmin: float = 60.0, fmax: float = 8000.0,
) -> np.ndarray:
    """[n_freqs, n_mels] triangular mel filterbank (HTK mel scale)."""
    def hz_to_mel(f):
        return 2595.0 * math.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    fmax = min(fmax, frame_rate / 2.0)
    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = np.array([mel_to_hz(m) for m in mels])
    freqs = np.linspace(0.0, frame_rate / 2.0, n_freqs)
    fb = np.zeros((n_freqs, n_mels), dtype=np.float32)
    for m in range(n_mels):
        lo, mid, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        rising = (freqs - lo) / max(mid - lo, 1e-6)
        falling = (hi - freqs) / max(hi - mid, 1e-6)
        fb[:, m] = np.clip(np.minimum(rising, falling), 0.0, 1.0)
    return fb


@partial(jax.jit, static_argnames=("window",))
def log_mel_features(pcm_i16: jnp.ndarray, mel_fb: jnp.ndarray, window: int):
    """Per-window log-mel features [T, M] for the neural VAD."""
    frames = frame_chunk(pcm_i16.astype(jnp.float32) / 32768.0, window)
    # Hann window tames spectral leakage; computed inline so the whole
    # framing→fft→mel chain fuses into one launch
    hann = 0.5 - 0.5 * jnp.cos(
        2.0 * jnp.pi * jnp.arange(window, dtype=jnp.float32) / window
    )
    spec = jnp.fft.rfft(frames * hann[None, :], axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    mel = jnp.dot(power, mel_fb, preferred_element_type=jnp.float32)
    return jnp.log(mel + 1e-6)


# --------------------------------------------------------------------------
# Unified frontend: one pass over the PCM produces every feature any VAD
# backend consumes. On TPU this is the fused Pallas kernel
# (ops/pallas/frontend.py); elsewhere the jnp composition below (identical
# math, same matrices).
# --------------------------------------------------------------------------

_MATS_CACHE: dict = {}


def _pallas_enabled() -> bool:
    if os.environ.get("FFS_TPU_DISABLE_PALLAS") == "1":
        return False
    if os.environ.get("FFS_TPU_PALLAS_INTERPRET") == "1":
        return True
    return jax.default_backend() == "tpu"


def _get_frontend_mats(frame_rate: int, window: int):
    from ffsubsync_tpu.ops.pallas.frontend import make_frontend_mats

    key = (frame_rate, window)
    if key not in _MATS_CACHE:
        _MATS_CACHE[key] = make_frontend_mats(frame_rate, window)
    return _MATS_CACHE[key]


@partial(jax.jit, static_argnames=("window",))
def _frontend_jnp(pcm_i16, mel_fb, band_sel, window):
    if pcm_i16.dtype == jnp.int8:  # µ-law wire codes
        from ffsubsync_tpu.ops.pallas.frontend import mulaw_decode

        samples = mulaw_decode(pcm_i16)
    else:
        samples = pcm_i16.astype(jnp.float32)
    raw = frame_chunk(samples, window)
    norm = raw / 32768.0
    hann = 0.5 - 0.5 * jnp.cos(
        2.0 * jnp.pi * jnp.arange(window, dtype=jnp.float32) / window
    )
    spec_m = jnp.fft.rfft(norm * hann[None, :], axis=-1)
    p_mel = jnp.real(spec_m) ** 2 + jnp.imag(spec_m) ** 2
    logmel = jnp.log(
        jnp.dot(p_mel, mel_fb, preferred_element_type=jnp.float32) + 1e-6
    )
    spec_p = jnp.fft.rfft(norm, axis=-1)
    p_pl = jnp.real(spec_p) ** 2 + jnp.imag(spec_p) ** 2
    bands = jnp.dot(p_pl, band_sel, preferred_element_type=jnp.float32)
    total = jnp.mean(raw * raw, axis=-1)
    return logmel, bands, total


_MIN_ANALYSIS_RATE = 12000


def analysis_rate(frame_rate: int, sample_rate: int) -> int:
    """The audio rate VAD features are actually computed at.

    High decode rates carry no information the detectors use (webrtc bands
    ≤4 kHz; speech harmonicity/syllabic cues live well below 6 kHz), and the
    PCM's trip across the host→device link is the pipeline bottleneck — so
    audio is half-band decimated by 2 on the host (repeatedly) down to
    ≥12 kHz before staging. At 12 kHz the 10 ms window is 120 samples,
    padding to exactly one 128-lane group — zero wasted wire bytes. The
    100 Hz window grid is unchanged (window counts are identical). Disable
    with ``FFS_TPU_ANALYSIS_DECIMATE=0``.
    """
    if os.environ.get("FFS_TPU_ANALYSIS_DECIMATE", "1") == "0":
        return frame_rate
    rate = frame_rate
    while rate // 2 >= _MIN_ANALYSIS_RATE and (rate // 2) % sample_rate == 0:
        rate //= 2
    return rate


def prepare_staged_input(
    pcm_i16: np.ndarray, frame_rate: int, sample_rate: int
):
    """Host staging for the device frontend (pallas path): decimate to the
    analysis rate, wire-encode, and frame lane-aligned — one native pass.

    Returns ``(framed [t_pad, wpad] np, mats, n_windows)``.
    """
    from ffsubsync_tpu import native
    from ffsubsync_tpu.ops.pallas import frontend as plf

    pcm = np.asarray(pcm_i16)
    rate = analysis_rate(frame_rate, sample_rate)
    decim_stages = 0
    while frame_rate > rate:
        decim_stages += 1
        frame_rate //= 2
    window = frames_per_window(frame_rate, sample_rate)
    n_dec = len(pcm)
    for _ in range(decim_stages):
        n_dec = (n_dec + 1) // 2
    n_windows = int(np.ceil(n_dec / float(window)))
    t_pad = plf.padded_window_count(max(1, n_windows))
    mats = _get_frontend_mats(frame_rate, window)
    wire = os.environ.get("FFS_TPU_WIRE", "mulaw")
    if wire == "mulaw6" and window % 4 == 0:
        # packed 6-bit µ-law: 25% fewer wire bytes; decoded on device by
        # ops/pallas/frontend.wire_to_frame (called inside each program)
        framed = native.stage_for_device_p6(pcm, decim_stages, window, t_pad)
    elif wire == "mulaw" or (wire == "mulaw6" and window % 4 != 0):
        # 8-bit µ-law, shipped at the NARROW window width: the zero pad
        # columns up to wpad are appended on device (wire_to_frame), so
        # they never cross the host→device link (wpad/window − 1 ≈ 6.7%
        # of the bytes at the 12 kHz tier). Bit-exact vs the padded frame.
        framed = native.stage_for_device(
            pcm, decim_stages, window, window, t_pad
        )
    else:
        for _ in range(decim_stages):
            pcm = native.decimate2(pcm)
        framed = native.frame_for_device(pcm, window, mats.wpad, t_pad, False)
    return framed, mats, n_windows


def compute_frontend(
    pcm_i16: np.ndarray, frame_rate: int, sample_rate: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, int]:
    """Full-signal audio frontend over one PCM buffer (any length).

    Returns device-resident ``(logmel [T,40], bands [T,6], total_power [T],
    n_windows)`` where ``T ≥ n_windows`` is the geometrically-bucketed padded
    window count (slice ``[:n_windows]``; the padding is zero PCM). ``total``
    is in raw int16² scale so ``10·log10(total)`` matches
    :func:`window_energies_db`.

    Wire format: µ-law int8 halves the bytes crossing the host→device link
    (the end-to-end bottleneck); decode is exact arithmetic on device.
    ``FFS_TPU_WIRE=i16`` ships raw samples instead (bit-exact features).
    """
    from ffsubsync_tpu.ops.pallas import frontend as plf

    from ffsubsync_tpu import native

    if _pallas_enabled():
        framed, mats, n_windows = prepare_staged_input(
            pcm_i16, frame_rate, sample_rate
        )
        interpret = os.environ.get("FFS_TPU_PALLAS_INTERPRET") == "1"
        logmel, bands, total = plf.fused_frontend(
            jnp.asarray(framed), mats, interpret=interpret
        )
    else:
        pcm = np.asarray(pcm_i16)
        rate = analysis_rate(frame_rate, sample_rate)
        while frame_rate > rate:
            pcm = native.decimate2(pcm)
            frame_rate //= 2
        window = frames_per_window(frame_rate, sample_rate)
        n_windows = int(np.ceil(len(pcm) / float(window)))
        t_pad = plf.padded_window_count(max(1, n_windows))
        mulaw = os.environ.get("FFS_TPU_WIRE", "mulaw") == "mulaw"
        wire_dtype = np.int8 if mulaw else np.int16
        flat = np.zeros(t_pad * window, wire_dtype)
        if mulaw:
            flat[: len(pcm)] = plf.mulaw_encode_host(pcm)
        else:
            flat[: len(pcm)] = pcm
        dev = jnp.asarray(flat)
        n_freqs = window // 2 + 1
        key = ("jnp", frame_rate, window)
        if key not in _MATS_CACHE:
            _MATS_CACHE[key] = (
                jnp.asarray(mel_filterbank(n_freqs, frame_rate, 40)),
                jnp.asarray(band_selector_matrix(n_freqs, frame_rate, window)),
            )
        mel_fb, band_sel = _MATS_CACHE[key]
        logmel, bands, total = _frontend_jnp(dev, mel_fb, band_sel, window)
    return logmel, bands, total, n_windows
