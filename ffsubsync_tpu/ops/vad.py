# -*- coding: utf-8 -*-
"""Voice-activity-detection backends, TPU-native.

The reference drives three out-of-tree native detectors — webrtcvad (C++ GMM),
silero (torch), auditok (energy tokenizer) — one 10 ms frame at a time on the
host (ffsubsync/speech_transformers.py:101-296). Here each ``--vad`` choice
maps to an in-tree device kernel, fed by ONE shared fused-frontend pass over
the PCM (ops/features.compute_frontend → the Pallas kernel on TPU), whether
the audio arrives as ~100 s streamed chunks or as one whole-movie buffer:

- ``webrtc`` → spectral sub-band SNR detector: band energies from the
  frontend, adaptive minimum-statistics noise floor, a spectral-flux
  speech/music gate, and hangover, all evaluated as *parallel* associative
  scans (no serial loop). Frames judged non-speech emit
  ``non_speech_label`` ("not sure", parity with
  speech_transformers.py:179-180).
- ``auditok`` → device window energies + the reference's energy-tokenizer
  semantics (min length 0.2 s, max 5 s, max continuous silence 0.25 s,
  50 dB threshold) as a host pass over the tiny 100 Hz validity string.
- ``silero`` → in-tree neural VAD (dilated-conv net over log-mel, see
  models/neural_vad.py); probability blended as ``1-(1-p)(1-nsl)``
  (parity: speech_transformers.py:233).
- ``fused[:strategy]`` → combine webrtc-class and neural outputs clipped to
  common length: ``intersection`` = min, ``union`` = max, ``weighted`` =
  ``0.6·silero + 0.4·webrtc`` (parity: speech_transformers.py:282-294).

Detectors are callables ``chunk_bytes -> np.ndarray`` of per-window labels,
matching the reference's detector-factory contract, and carry adaptive state
across chunks.
"""
import logging
from functools import partial
from typing import Callable, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ffsubsync_tpu.ops.features import compute_frontend

logger = logging.getLogger(__name__)

_FUSION_STRATEGIES: Tuple[str, ...] = ("weighted", "intersection", "union")

# auditok-parity tokenizer constants (speech_transformers.py:125-131)
ENERGY_THRESHOLD_DB = 50.0
MIN_TOKEN_FACTOR = 0.2  # × sample_rate windows
MAX_TOKEN_FACTOR = 5.0
MAX_SILENCE_FACTOR = 0.25

# webrtc-class detector tuning (empirically set on synthetic speech: EMA
# smoothing keeps instantaneous noise fluctuations from beating the
# minimum-statistics floor)
_ENERGY_EMA_ALPHA = 0.35
_NOISE_FLOOR_GROWTH = 1.0030  # per 10 ms; floor doubles in ~2.3 s
_BAND_WEIGHTS = np.array([0.6, 1.0, 1.0, 0.9, 0.7, 0.5], dtype=np.float32)
_SNR_THRESHOLD_DB = 6.0
_HANGOVER_WINDOWS = 8
# Pre-hangover (lookahead) — symmetrizes the label dilation. The causal
# machinery is asymmetric around a true speech span: onsets are detected
# essentially on time (the EMA jump α·E clears the 6 dB threshold within a
# window on every tuning draw measured), but releases overhang by the EMA
# decay through the threshold (~1.9 dB/window from plateau ≈ +5..10
# windows) plus the trailing hangover (+8) — measured median release
# overhang +10..+19 windows on clean/strings, up to +51 under vocals beds.
# One-sided late mass drags the FFT correlation peak late by a
# draw-dependent amount: across tuning seeds 1–8 the music-scenario offset
# error averaged +0.10 s (21/24 slots past the then-10 ms bar, all but one
# LATE). Marking the _PRE_HANGOVER_WINDOWS windows BEFORE each raw vote as
# speech at HALF weight balances the trailing overhang's full-weight mass
# (P·w ≈ release overhang: a full-weight sweep measured P=13 as the
# symmetry point — mean error −0.004 s on the same draws — so the
# half-weight tail doubles it; protocol + artifact:
# scripts/probe_webrtc_bias.py / EVAL_webrtc_bias.json). The tail is
# half-weight, NOT full, because on clean high-SNR audio the correlation
# peak is a PLATEAU (detector mass strictly contains every rasterized
# cue): a full-weight pre-tail extends the plateau early and the
# reference-parity tie-break then lands P windows early on pristine
# audio, while a fractional tail leaves the full-weight plateau — and the
# tie-break's landing spot — exactly where the old kernel put it (window
# scoring also still reads pre windows as non-speech: 0.5 is not > 0.5).
# The residual ±0.1 s variance at 3-minute clip length is short-clip
# measurement noise (40 spans); at 10-minute length the music scenarios
# bind tightly (see EVAL.md bars). Streaming chunk boundaries truncate
# the lookahead at the right edge, the same exact-left/truncated-right
# policy as every centered box here.
_PRE_HANGOVER_WINDOWS = 26
_PRE_HANGOVER_WEIGHT = 0.5
_N_BANDS = len(_BAND_WEIGHTS)

# Spectral-flux speech/music discriminator. Energy SNR alone cannot tell
# dialogue from a music bed — note onsets beat the adaptive floor exactly
# like syllables do (real webrtcvad shares this failure on movie audio).
# What separates them is the DUTY CYCLE of spectral motion: formants glide
# through whole syllables, so nearly every 10 ms window of speech moves the
# normalized mel spectrum, while music moves only at note onsets and is
# spectrally frozen inside each note (amplitude decay cancels under
# normalization). An EMA of flux cannot exploit this — onset rates (2-6/s)
# overlap syllable rates — but the FRACTION of "moving" windows among the
# SNR-ACTIVE windows of a centered ±0.6 s box separates cleanly: ~80% for
# speech vs ~25% for plucked music (normalizing over active windows only
# keeps surrounding silence from diluting utterance edges). Per-window flux
# is first corrected by the estimated noise fraction (floor/EMA band
# energy): noise has a random spectrum every window, so noise-dominated
# moments (note decay tails, silence) would otherwise count as motion. A
# vote additionally requires the window ITSELF to be moving — inside an
# onset-dense music run, the frozen note bodies still stay silent.
# Constants tuned on the adversarial eval generators (models/eval_data.py)
# at the 12 kHz analysis rate: music_bed end-to-end offset error 0 ms with
# every speech scenario at its SNR-limited maximum recall.
_FLUX_NOISE_C = 0.38  # typical flux of pure noise through the mel frontend
_FLUX_MOVE_THRESHOLD = 0.08  # corrected flux above this = a "moving" window
_FLUX_BOX_K = 60  # box half-width (windows): duty cycle over ±0.6 s
_FLUX_FRAC_THRESHOLD = 0.45  # moving fraction (of active) required to vote

# Sustained-music veto. The duty-cycle gate's premise — music is spectrally
# frozen inside each note — is FALSE for sung vocals, legato strings, and
# orchestral beds: vibrato sweeps every harmonic continuously, portamento
# glides between notes, sections swell — measured duty cycles of 0.58-0.90
# on such beds, square in the speech range. What still separates them is
# ENERGY modulation at the syllabic rate: syllable stress cycles and
# inter-word gaps modulate speech energy by several dB at 1-7 Hz, while a
# sustained bed's energy moves at bow/phrase rate (≲0.25 Hz) and vibrato is
# frequency- not amplitude-modulation (the classic Scheirer-Slaney 4 Hz
# modulation-energy feature, recast in this kernel's box machinery). The
# measure: band-pass the dB energy track by differencing two centered box
# means (±50 ms passes syllabic AM; ±250 ms tracks level and slow swells),
# then average |bandpassed| over the same ±0.6 s box as the duty cycle.
# Energy is clamped at the noise floor first so inter-utterance silence
# reads as floor-level, not -120 dB (which would score utterance EDGES
# instead of syllabic interiors). Measured on the tuning family (seed-0
# eval generators, 12 kHz): speech interiors run 2-10 dB (noisy 4 dB-SNR
# speech ~0.85-0.97), sustained beds 0.1-0.5 dB with orchestral/legato
# vanishing entirely at 0.75 — plucked music's note decays DO modulate
# (3-8 dB) but the motion gate already rejects those.
_SYL_SHORT_K = 5  # box half-width (windows): ±50 ms mean passes syllabic AM
_SYL_LONG_K = 25  # ±250 ms mean tracks level + slow swells
_SYL_MOD_THRESHOLD = 0.75  # dB of syllabic-band |AM| required to vote
_SYL_LOOKBACK = _FLUX_BOX_K + _SYL_LONG_K  # ldb history for exact left edges

# Transient-train veto. Applause-class clap/impact trains beat every prior
# gate: each transient is a fresh broadband noise burst, so the normalized
# mel spectrum redraws almost every window (motion duty cycle ~0.98 —
# HIGHER than speech), and Poisson-arriving transients are shot noise whose
# energy-modulation spectrum is flat, putting several dB of AM in the
# syllabic band too (measured applause sylmod 3.4-4.4 dB — past the 0.75
# gate). What still separates them is WHERE the AM concentrates: speech
# energy is smooth at the 10 ms window scale (pitch harmonics live far
# above the label rate; syllables dominate the envelope), while a clap
# train's envelope is spiky at the window scale itself. Measure: band-pass
# the dB track with ±10 ms vs ±50 ms box means (a super-syllabic ~10-50 Hz
# band, vs the syllabic gate's 2-10 Hz) and box |AM| over the same ±0.6 s.
# Measured on the tuning family (seed-0 eval generators, 12 kHz, ACTIVE
# windows): applause 5.7-6.8 dB; every speech condition — µ-law, telephone,
# whisper, clipped, 2-6 dB-SNR pink, speech-over-music — 0.4-1.2 dB; the
# threshold sits in the dead zone (sweeping it 2.0→3.0 moves nothing).
# Effect: applause window accuracy 0.004 → 1.000, all other conditions
# bit-identical. Crowd laughter (voiced 4-6 Hz bursts: genuinely syllabic
# AM, fastmod ~1.1-1.5) is NOT caught — its bound stays end-to-end, like
# real webrtcvad's.
_FAST_SHORT_K = 1  # box half-width (windows): ±10 ms passes super-syllabic AM
_FAST_MOD_MAX = 2.5  # dB of super-syllabic |AM| above which votes are vetoed


def _pcm_bytes_to_i16(chunk: bytes) -> np.ndarray:
    if isinstance(chunk, np.ndarray):
        if chunk.dtype == np.uint8:  # reference passes uint8 views of s16le
            return chunk.view(np.int16)
        if chunk.dtype == np.int16:
            return chunk  # already s16 (possibly a zero-copy memmap slice)
        return chunk.astype(np.int16)
    return np.frombuffer(chunk, np.int16)


_SCAN_BLOCK = 4096  # inner block length of the two-level scans


def _affine(left, right):
    """Composition of first-order affine maps ``y -> a*y + b`` (the EMA
    recurrence's associative combine; shared with the sequence-parallel
    cross-chip prefix in parallel/vad_shard.py)."""
    a1, b1 = left
    a2, b2 = right
    return a1 * a2, a2 * b1 + b2


def _select_labels(mode, webrtc_labels, silero_labels):
    """--vad mode -> label stream (parity: speech_transformers.py:282-294).
    XLA dead-code-eliminates the branch a mode doesn't read."""
    if mode == "webrtc":
        return webrtc_labels
    if mode == "silero":
        return silero_labels
    if mode == "intersection":
        return jnp.minimum(webrtc_labels, silero_labels)
    if mode == "union":
        return jnp.maximum(webrtc_labels, silero_labels)
    return 0.6 * silero_labels + 0.4 * webrtc_labels


def _blocked_scan(fn, elems, identity):
    """Associative scan along axis 0, evaluated in two levels.

    A flat ``jax.lax.associative_scan`` at movie-scale T (≈540k windows for
    90 min) makes XLA:TPU's compile time explode (>10 min observed; the
    recursive odd/even decomposition emits thousands of odd-shaped slices).
    Splitting into fixed ``_SCAN_BLOCK``-sized inner scans (vmapped over
    blocks) plus one tiny scan over per-block summaries keeps the compiled
    program size — and thus compile time — independent of T, with the same
    O(T) work and O(log T) depth.

    ``fn(left, right)`` must be associative and elementwise (broadcastable);
    ``elems`` is a pytree of [T, ...] arrays; ``identity`` a matching pytree
    of scalars (fn's identity). T must be a multiple of ``_SCAN_BLOCK`` or
    smaller than it.
    """
    leaves = jax.tree_util.tree_leaves(elems)
    t = leaves[0].shape[0]
    if t <= _SCAN_BLOCK:
        return jax.lax.associative_scan(fn, elems, axis=0)
    rem = (-t) % _SCAN_BLOCK
    if rem:  # identity-pad so padding can't affect any prefix
        elems = jax.tree_util.tree_map(
            lambda x, ident: jnp.concatenate(
                [x, jnp.full((rem,) + x.shape[1:], ident, x.dtype)], axis=0
            ),
            elems,
            identity,
        )
        out = _blocked_scan(fn, elems, identity)
        return jax.tree_util.tree_map(lambda x: x[:t], out)
    n_blocks = t // _SCAN_BLOCK
    blocks = jax.tree_util.tree_map(
        lambda x: x.reshape((n_blocks, _SCAN_BLOCK) + x.shape[1:]), elems
    )
    local = jax.vmap(lambda b: jax.lax.associative_scan(fn, b, axis=0))(blocks)
    block_last = jax.tree_util.tree_map(lambda x: x[:, -1], local)
    block_incl = jax.lax.associative_scan(fn, block_last, axis=0)
    prefix = jax.tree_util.tree_map(
        lambda inc, ident: jnp.concatenate(
            [jnp.full_like(inc[:1], ident), inc[:-1]], axis=0
        )[:, None],
        block_incl,
        identity,
    )
    combined = fn(prefix, local)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((t,) + x.shape[2:]), combined
    )


def _spectral_flux(logmel, prev_p_in):
    """Per-window normalized-mel-spectrum flux ([T], plus p [T, M]).

    ``prev_p_in`` is the previous chunk's last normalized spectrum; ``+inf``
    marks a fresh stream (the first window then diffs against itself, so
    ``flux[0] == 0`` exactly).
    """
    mel = jnp.exp(logmel)
    p = mel / jnp.sum(mel, axis=1, keepdims=True)
    prev = jnp.concatenate([prev_p_in[None, :], p[:-1]], axis=0)
    prev = jnp.where(jnp.isinf(prev), p, prev)
    flux = 0.5 * jnp.sum(jnp.abs(p - prev), axis=1)
    return flux, p


@jax.jit
def _webrtc_from_bands(bands, logmel, n_valid, ema_in, noise_in, prev_p_in,
                       prev_m_in, prev_m_len, prev_ldb_in, prev_ldb_len):
    """Band energies -> EMA smoothing -> adaptive min-statistics noise floor ->
    weighted SNR vote, gated by spectral-motion duty cycle, with hangover --
    all in *parallel* (log-depth) form.

    The sequential per-window recurrences become (two-level blocked)
    associative scans so a 90-minute signal (540k windows) is one launch
    with no serial loop:

    - the EMA is a first-order affine recurrence, scanned as composed
      ``(a, b)`` pairs;
    - the min-statistics floor ``noise[t] = min(ema[t], noise[t-1]*g)`` is,
      in log domain, ``t*ln(g) + cummin(ln_ema - t*ln(g))`` -- a running
      minimum;
    - the flux gate marks each window "moving" when its noise-corrected
      spectral flux clears ``_FLUX_MOVE_THRESHOLD``, then takes the moving
      fraction of the SNR-ACTIVE windows in a centered ±``_FLUX_BOX_K`` box
      — a prefix sum plus two shifted gathers. The left box edge is exact
      across streamed chunks (the last K indicator pairs are carried
      state); the right edge truncates at the chunk boundary (negligible
      for the ≥600 s pipeline chunks);
    - the sustained-music veto (constants block above) band-passes the dB
      energy track with two more box means and requires the boxed
      syllabic-band |AM| to clear ``_SYL_MOD_THRESHOLD`` — three more
      prefix sums over a carried ±``_SYL_LOOKBACK`` dB history, with the
      same exact-left / truncated-right chunk-edge policy;
    - the hangover ("speech for H windows after any raw vote") is
      ``t - last_raw_index[t] < H`` via a running maximum.

    ``bands``/``logmel`` may be padded past ``n_valid`` (time-axis bucketing
    keeps the compile count bounded); padded elements are scan identities,
    and the carried-out state is read at ``n_valid - 1`` so streaming chunked
    use sees exactly the unpadded recurrence. ``+inf`` in the carried-in
    state means "uninitialized" (first chunk): the first window's energies
    seed the EMA and the floor. Returns (speech_strength [T] float — the
    standalone stream: 1.0 on raw/trailing-hangover windows,
    _PRE_HANGOVER_WEIGHT on pre-hangover-only windows; speech_fuse_bool
    [T] — the trailing-only stream the fusion modes consume; ema_state [B],
    noise_floor [B], prev_p [M], prev_m [K, 2], prev_m_len, prev_ldb [L],
    prev_ldb_len).
    """
    t_pad = bands.shape[0]
    t_idx = jnp.arange(t_pad, dtype=jnp.int32)
    valid = (t_idx < n_valid)[:, None]
    e = jnp.maximum(bands, 1e-12)  # [T, B]
    carry0 = jnp.where(jnp.isinf(ema_in), e[0], ema_in)
    coef_a = jnp.where(valid, 1.0 - _ENERGY_EMA_ALPHA, 1.0)
    coef_b = jnp.where(valid, _ENERGY_EMA_ALPHA * e, 0.0)

    big_a, big_b = _blocked_scan(
        _affine, (coef_a, coef_b), (jnp.float32(1.0), jnp.float32(0.0))
    )
    ema_seq = big_a * carry0[None, :] + big_b  # [T, B]
    ln_ema = jnp.log(ema_seq)
    lng = jnp.float32(np.log(_NOISE_FLOOR_GROWTH))
    tt = t_idx.astype(jnp.float32)[:, None] * lng
    cummin = _blocked_scan(
        jnp.minimum, jnp.where(valid, ln_ema - tt, jnp.inf), jnp.float32(jnp.inf)
    )
    ln_noise = jnp.minimum(tt + cummin, jnp.log(noise_in)[None, :] + tt + lng)
    snr_db = (10.0 / np.log(10.0)) * (ln_ema - ln_noise)
    weights = jnp.asarray(_BAND_WEIGHTS)
    score = jnp.dot(snr_db, weights) / _BAND_WEIGHTS.sum()

    flux, p = _spectral_flux(logmel, prev_p_in)
    noise_frac = jnp.sum(jnp.exp(ln_noise), axis=1) / jnp.sum(ema_seq, axis=1)
    flux_c = jnp.maximum(flux - _FLUX_NOISE_C * noise_frac, 0.0)
    k = _FLUX_BOX_K
    active = (score > _SNR_THRESHOLD_DB) & valid[:, 0]
    moving = (flux_c > _FLUX_MOVE_THRESHOLD) & valid[:, 0]
    ind = jnp.stack(
        [jnp.where(moving & active, 1.0, 0.0), jnp.where(active, 1.0, 0.0)],
        axis=1,
    )  # [T, 2]: (moving-and-active, active) indicators
    ind_ext = jnp.concatenate([prev_m_in, ind], axis=0)  # [K + T, 2]
    s_pad = jnp.concatenate(
        [
            jnp.zeros((1, 2), jnp.float32),
            _blocked_scan(jnp.add, ind_ext, jnp.float32(0.0)),
        ],
        axis=0,
    )
    # box edges in ind_ext coordinates (window t sits at t + K)
    lo = jnp.maximum(t_idx, k - prev_m_len)
    hi = jnp.minimum(t_idx + 2 * k, k + n_valid - 1)
    sums = jnp.take(s_pad, hi + 1, axis=0) - jnp.take(s_pad, lo, axis=0)
    frac = sums[:, 0] / jnp.maximum(sums[:, 1], 1.0)

    # sustained-music veto: syllabic-band energy modulation (constants block)
    big_l = _SYL_LOOKBACK
    v1 = valid[:, 0]
    ldb = (10.0 / np.log(10.0)) * jnp.log(
        jnp.maximum(jnp.sum(e, axis=1), jnp.sum(jnp.exp(ln_noise), axis=1))
    )
    prev_valid = jnp.arange(big_l, dtype=jnp.int32) >= big_l - prev_ldb_len
    ldb_ext = jnp.concatenate(
        [jnp.where(prev_valid, prev_ldb_in, 0.0), jnp.where(v1, ldb, 0.0)]
    )
    valid_ext = jnp.concatenate([prev_valid, v1]).astype(jnp.float32)
    ps_ldb = jnp.concatenate(
        [
            jnp.zeros((1, 2), jnp.float32),
            _blocked_scan(
                jnp.add,
                jnp.stack([ldb_ext, valid_ext], axis=1),
                jnp.float32(0.0),
            ),
        ],
        axis=0,
    )

    def _boxmean(prefix, pos, k0):
        b_lo = jnp.maximum(pos - k0, 0)
        b_hi = jnp.minimum(pos + k0, prefix.shape[0] - 2)
        s = jnp.take(prefix, b_hi + 1, axis=0) - jnp.take(prefix, b_lo, axis=0)
        return s[:, 0] / jnp.maximum(s[:, 1], 1.0)

    ext_idx = jnp.arange(big_l + t_pad, dtype=jnp.int32)
    bp = _boxmean(ps_ldb, ext_idx, _SYL_SHORT_K) - _boxmean(
        ps_ldb, ext_idx, _SYL_LONG_K
    )
    ps_bp = jnp.concatenate(
        [
            jnp.zeros((1, 2), jnp.float32),
            _blocked_scan(
                jnp.add,
                jnp.stack([jnp.abs(bp) * valid_ext, valid_ext], axis=1),
                jnp.float32(0.0),
            ),
        ],
        axis=0,
    )
    sylmod = _boxmean(ps_bp, t_idx + big_l, _FLUX_BOX_K)

    # transient-train veto: super-syllabic |AM| via ±_FAST_SHORT_K vs
    # ±_SYL_SHORT_K box means over the same carried dB history
    bpf = _boxmean(ps_ldb, ext_idx, _FAST_SHORT_K) - _boxmean(
        ps_ldb, ext_idx, _SYL_SHORT_K
    )
    ps_bpf = jnp.concatenate(
        [
            jnp.zeros((1, 2), jnp.float32),
            _blocked_scan(
                jnp.add,
                jnp.stack([jnp.abs(bpf) * valid_ext, valid_ext], axis=1),
                jnp.float32(0.0),
            ),
        ],
        axis=0,
    )
    fastmod = _boxmean(ps_bpf, t_idx + big_l, _FLUX_BOX_K)

    raw = (
        active
        & moving
        & (frac > _FLUX_FRAC_THRESHOLD)
        & (sylmod > _SYL_MOD_THRESHOLD)
        & (fastmod <= _FAST_MOD_MAX)
    )
    last = _blocked_scan(
        jnp.maximum, jnp.where(raw, t_idx, -(1 << 30)), jnp.int32(-(1 << 30))
    )
    nxt = jnp.flip(
        _blocked_scan(
            jnp.minimum,
            jnp.flip(jnp.where(raw, t_idx, (1 << 30))),
            jnp.int32(1 << 30),
        )
    )
    # two label streams from the same raw votes: the STANDALONE stream adds
    # the HALF-WEIGHT pre-hangover (symmetrizing the dilation that
    # otherwise biases the --vad webrtc aligner late — constants block),
    # while the FUSION stream keeps the trailing-only hangover: inside
    # fused the neural backend's precise onsets dominate the peak, and
    # dilated webrtc mass only adds early noise there (measured: fused
    # seed-0 agreement MAE 0.001 s with the trailing-only stream vs
    # 0.007 s consuming the dilated one).
    speech_fuse = t_idx - last < _HANGOVER_WINDOWS
    pre = nxt - t_idx < _PRE_HANGOVER_WINDOWS
    speech_strength = jnp.where(
        speech_fuse, 1.0, jnp.where(pre, _PRE_HANGOVER_WEIGHT, 0.0)
    )
    out_t = jnp.maximum(n_valid - 1, 0)
    prev_m_out = jax.lax.dynamic_slice(ind_ext, (n_valid, 0), (k, 2))
    prev_ldb_out = jax.lax.dynamic_slice(ldb_ext, (n_valid,), (big_l,))
    return (
        speech_strength,
        speech_fuse,
        ema_seq[out_t],
        jnp.exp(ln_noise[out_t]),
        p[out_t],
        prev_m_out,
        jnp.minimum(prev_m_len + n_valid, k),
        prev_ldb_out,
        jnp.minimum(prev_ldb_len + n_valid, big_l),
    )


@partial(jax.jit, static_argnames=("n",))
def _compact_chunks(arrays, n_valids, n):
    """Scatter bucket-padded label chunks into one zero-filled [n] buffer.

    Chunk i's masked write covers its full padded extent; the pad tail it
    zeroes is immediately overwritten by chunk i+1's (later) write, and the
    final chunk's tail lands in the buffer's zero region — so the result is
    the exact concatenation of the valid prefixes, computed entirely from
    *bucketed* static shapes (the per-chunk ``n_valid``s are traced scalars,
    so no program ever specializes on a movie's exact length — the
    CLAUDE.md bounded-compile-count invariant).
    """
    max_tpad = max(a.shape[0] for a in arrays)
    out = jnp.zeros((n + max_tpad,), jnp.float32)
    off = jnp.int32(0)
    for arr, nv in zip(arrays, n_valids):
        idx = jnp.arange(arr.shape[0], dtype=jnp.int32)
        masked = jnp.where(idx < nv, arr.astype(jnp.float32), 0.0)
        out = jax.lax.dynamic_update_slice(out, masked, (off,))
        off = off + nv
    return out[:n]


class LazySpeechSignal:
    """VAD labels that stay on the device until host values are demanded.

    The audio pipeline's speech signal is consumed by the *device* aligner:
    round-tripping it through the host (pull ~MB of labels, then push an
    FFT-padded copy right back) costs more link time than the entire device
    computation. Chunk handles stay lazy as ``(padded_labels, n_valid)``
    pairs; :meth:`padded_values` compacts them on device into a target-length
    buffer, :meth:`materialize` is the ONE host pull (cached), and
    ``__array__`` makes the wrapper a drop-in for numpy consumers
    (serialization, the CPU fallback paths, tests).
    """

    def __init__(self, parts) -> None:
        self._parts = []
        for p in parts:
            arr, nv = p if isinstance(p, tuple) else (p, int(p.shape[0]))
            nv = min(int(nv), int(arr.shape[0]))
            if nv > 0:
                self._parts.append((arr, nv))
        self._np: Optional[np.ndarray] = None
        self._dev_cache: dict = {}  # n -> compacted device buffer
        if self._parts and all(
            isinstance(a, np.ndarray) for a, _ in self._parts
        ):
            # host-resident labels (fallback/tokenizer paths): joining on
            # the host up front avoids repeated device uploads from sum(),
            # alignment, and serialization each compacting independently
            self._np = np.concatenate(
                [np.asarray(a[:nv], np.float64) for a, nv in self._parts]
            )

    def __len__(self) -> int:
        if self._np is not None:
            return len(self._np)
        return sum(nv for _, nv in self._parts)

    def padded_values(self, n: int):
        """The signal as a device f32 [n] buffer, zeros beyond its length."""
        assert n >= len(self), "target buffer shorter than the signal"
        if n in self._dev_cache:
            return self._dev_cache[n]
        if self._np is not None:  # already pulled once: cheap host pad
            out = np.zeros(n, np.float32)
            out[: len(self._np)] = self._np
            buf = jnp.asarray(out)
        elif not self._parts:
            buf = jnp.zeros((n,), jnp.float32)
        else:
            arrays = tuple(jnp.asarray(a) for a, _ in self._parts)
            n_valids = tuple(jnp.int32(nv) for _, nv in self._parts)
            buf = _compact_chunks(arrays, n_valids, n)
        self._dev_cache[n] = buf
        return buf

    def materialize(self) -> np.ndarray:
        if self._np is None:
            from ffsubsync_tpu.ops.pallas.frontend import padded_window_count

            total = len(self)
            if total == 0:
                self._np = np.zeros(0)
            else:
                buf = self.padded_values(padded_window_count(total))
                self._np = np.asarray(buf, dtype=np.float64)[:total]
        return self._np

    def __array__(self, dtype=None, copy=None):
        out = self.materialize()
        return out.astype(dtype) if dtype is not None else out

    def sum(self) -> float:
        """Device-side reduce; pulls one scalar (for the headline log line)."""
        if self._np is not None:
            return float(np.sum(self._np))
        if not self._parts:
            return 0.0
        from ffsubsync_tpu.ops.pallas.frontend import padded_window_count

        return float(jnp.sum(self.padded_values(padded_window_count(len(self)))))


def _gather_parts(handles) -> "LazySpeechSignal":
    """Collect dispatched handles WITHOUT pulling to the host: returns a
    :class:`LazySpeechSignal` (numpy consumers get values via its
    ``__array__``; the device aligner reads ``padded_values()``)."""
    flat = []
    for h in handles:
        flat.extend(h) if isinstance(h, list) else flat.append(h)
    return LazySpeechSignal(flat)


def _device_dispatch(mode, sample_rate, frame_rate, non_speech_label,
                     fallback):
    """Shared chunk dispatch: the one-launch device program when the Pallas
    path is on, otherwise the split-path ``fallback(pcm)``.

    The returned callable also carries a pipelining API for callers that
    stream PCM in (media/audio.py buffered mode): ``dispatch_async(chunk)``
    enqueues a chunk and returns a lazy handle without blocking on the
    device, and ``gather(handles)`` pulls all results in one blocking pass.
    On the fallback path ``dispatch_async`` computes eagerly (still correct;
    no overlap to win on a host-only detector).
    """
    onelaunch = {"fn": None}

    def _resolve():
        from ffsubsync_tpu.ops.features import _pallas_enabled

        if not _pallas_enabled():
            return None
        if onelaunch["fn"] is None:
            onelaunch["fn"] = _make_onelaunch_detector(
                mode, sample_rate, frame_rate, non_speech_label
            )
        return onelaunch["fn"]

    def _detect(chunk) -> np.ndarray:
        pcm = _pcm_bytes_to_i16(chunk)
        if len(pcm) == 0:
            return np.zeros(0)
        fn = _resolve()
        return fn(pcm) if fn is not None else fallback(pcm)

    def _dispatch_async(chunk):
        """Returns a list of result handles (lazy device arrays on the
        device path, eager np arrays on the fallback path)."""
        pcm = _pcm_bytes_to_i16(chunk)
        if len(pcm) == 0:
            return []
        fn = _resolve()
        if fn is not None:
            return fn.dispatch_async(pcm)
        return [fallback(pcm)]

    _detect.dispatch_async = _dispatch_async
    _detect.gather = _gather_parts
    return _detect


def make_webrtc_detector(
    sample_rate: int, frame_rate: int, non_speech_label: float
) -> Callable[[bytes], np.ndarray]:
    """WebRTC-class detector: flux-gated sub-band SNR kernel on device."""
    from ffsubsync_tpu.models.neural_vad import N_MELS

    state = {
        "ema": jnp.full((_N_BANDS,), jnp.inf, jnp.float32),
        "noise": jnp.full((_N_BANDS,), jnp.inf, jnp.float32),
        "prev_p": jnp.full((N_MELS,), jnp.inf, jnp.float32),
        "prev_m": jnp.zeros((_FLUX_BOX_K, 2), jnp.float32),
        "prev_m_len": jnp.int32(0),
        "prev_ldb": jnp.zeros((_SYL_LOOKBACK,), jnp.float32),
        "prev_ldb_len": jnp.int32(0),
    }

    def _from_frontend(
        logmel, bands, n_windows: int, for_fusion: bool = False
    ) -> np.ndarray:
        (
            speech,
            speech_fuse,
            state["ema"],
            state["noise"],
            state["prev_p"],
            state["prev_m"],
            state["prev_m_len"],
            state["prev_ldb"],
            state["prev_ldb_len"],
        ) = _webrtc_from_bands(
            bands, logmel, jnp.int32(n_windows), state["ema"], state["noise"],
            state["prev_p"], state["prev_m"], state["prev_m_len"],
            state["prev_ldb"], state["prev_ldb_len"],
        )
        # standalone callers get the pre-hangover strength stream; fusion
        # callers the trailing-only boolean one (_webrtc_from_bands
        # docstring)
        if for_fusion:
            return np.where(
                np.asarray(speech_fuse[:n_windows]), 1.0, non_speech_label
            )
        strength = np.asarray(speech[:n_windows], np.float32)
        return non_speech_label + (1.0 - non_speech_label) * strength

    def _fallback(pcm) -> np.ndarray:
        logmel, bands, _total, n_windows = compute_frontend(
            pcm, frame_rate, sample_rate
        )
        return _from_frontend(logmel, bands, n_windows)

    _detect = _device_dispatch(
        "webrtc", sample_rate, frame_rate, non_speech_label, _fallback
    )
    _detect.from_frontend = _from_frontend
    return _detect


def tokenize_validity(
    valid: np.ndarray,
    min_length: int,
    max_length: int,
    max_continuous_silence: int,
) -> List[Tuple[int, int]]:
    """auditok-class stream tokenization of a boolean validity string.

    Dispatches to the native C++ state machine when libffs_native.so is
    built (this is a sequential 100 Hz pass — exactly the control flow the
    device is wrong for and a Python loop is slow at); the Python
    implementation below is the behavioral definition and fallback.
    """
    from ffsubsync_tpu import native

    if native.AVAILABLE:
        return native.tokenize(valid, min_length, max_length,
                               max_continuous_silence)
    return _tokenize_validity_py(valid, min_length, max_length,
                                 max_continuous_silence)


def _tokenize_validity_py(
    valid: np.ndarray,
    min_length: int,
    max_length: int,
    max_continuous_silence: int,
) -> List[Tuple[int, int]]:
    """Reference Python implementation of :func:`tokenize_validity`.

    Tokens begin at a valid frame, tolerate up to ``max_continuous_silence``
    consecutive invalid frames (which stay part of the token), end when
    silence exceeds that, are split at ``max_length``, and are dropped when
    shorter than ``min_length``.
    """
    tokens: List[Tuple[int, int]] = []
    start: Optional[int] = None
    silence_run = 0
    length = 0
    for i, v in enumerate(np.asarray(valid, dtype=bool)):
        if start is None:
            if v:
                start = i
                length = 1
                silence_run = 0
        else:
            if v:
                silence_run = 0
            else:
                silence_run += 1
            length += 1
            if silence_run > max_continuous_silence:
                end = i - silence_run
                if end - start + 1 >= min_length:
                    tokens.append((start, end + silence_run))  # keep trailing silence
                start = None
                length = 0
                silence_run = 0
                continue
            if length >= max_length:
                tokens.append((start, i))
                start = None
                length = 0
                silence_run = 0
    if start is not None:
        end = len(valid) - 1 - silence_run
        if end - start + 1 >= min_length:
            tokens.append((start, min(end + silence_run, len(valid) - 1)))
    return tokens


def make_auditok_detector(
    sample_rate: int, frame_rate: int, non_speech_label: float
) -> Callable[[bytes], np.ndarray]:
    """Energy tokenizer: device per-window dB energies + host token pass.

    Output shaping matches the reference's cumsum trick
    (speech_transformers.py:144-150): 1.0 inside each token, a
    ``non_speech_label``-floored 0 elsewhere, one label per 10 ms window plus
    the reference's ceil-division length convention.
    """
    min_length = int(MIN_TOKEN_FACTOR * sample_rate)
    max_length = int(MAX_TOKEN_FACTOR * sample_rate)
    max_silence = int(MAX_SILENCE_FACTOR * sample_rate)

    def _detect(chunk) -> np.ndarray:
        pcm = _pcm_bytes_to_i16(chunk)
        if len(pcm) == 0:
            return np.zeros(0)
        _logmel, _bands, total, n_windows = compute_frontend(
            pcm, frame_rate, sample_rate
        )
        energies = 10.0 * np.log10(
            np.maximum(np.asarray(total[:n_windows]), 1e-10)
        )
        valid = energies >= ENERGY_THRESHOLD_DB
        media_bstring = np.zeros(n_windows + 1)
        for tok_start, tok_end in tokenize_validity(
            valid, min_length, max_length, max_silence
        ):
            media_bstring[tok_start] = 1.0
            media_bstring[tok_end + 1] = non_speech_label - 1.0
        return np.clip(np.cumsum(media_bstring)[:-1], 0.0, 1.0)

    # uniform detector protocol WITHOUT changing tokenizer semantics:
    # dispatch buffers raw PCM and gather tokenizes the WHOLE signal in one
    # pass — token boundaries must not depend on pipeline chunking (a token
    # straddling a chunk edge would split, and fragments under min_length
    # would vanish). buffers_pcm tells the media layer the handles retain
    # the signal, so it must not pipeline when the duration (and thus the
    # memory bound) is unknown — media/audio.py's spill cap stays reachable.
    _detect.dispatch_async = lambda chunk: [("auditok_pcm", _pcm_bytes_to_i16(chunk))]
    _detect.buffers_pcm = True

    def _gather(handles):
        pcm_parts = []
        for h in handles:
            for tag, part in h if isinstance(h, list) else [h]:
                assert tag == "auditok_pcm"
                pcm_parts.append(part)
        if not pcm_parts:
            return LazySpeechSignal([])
        joined = (
            pcm_parts[0]
            if len(pcm_parts) == 1
            else np.concatenate(pcm_parts)
        )
        return LazySpeechSignal([_detect(joined)])

    _detect.gather = _gather
    return _detect


def make_silero_detector(
    sample_rate: int, frame_rate: int, non_speech_label: float
) -> Callable[[bytes], np.ndarray]:
    """Neural VAD detector (in-tree silero-class model, device inference)."""
    from ffsubsync_tpu.models.neural_vad import NeuralVAD

    model = NeuralVAD.load_default(frame_rate=frame_rate, sample_rate=sample_rate)

    def _from_frontend(logmel, n_windows: int) -> np.ndarray:
        probs = model.predict_from_frontend(logmel, n_windows)
        return 1.0 - (1.0 - probs) * (1.0 - non_speech_label)

    def _fallback(pcm) -> np.ndarray:
        logmel, _bands, _total, n_windows = compute_frontend(
            pcm, frame_rate, sample_rate
        )
        return _from_frontend(logmel, n_windows)

    _detect = _device_dispatch(
        "silero", sample_rate, frame_rate, non_speech_label, _fallback
    )
    _detect.from_frontend = _from_frontend
    return _detect


@partial(jax.jit, static_argnames=("window", "wpad", "mode", "interpret"))
def _vad_program(
    framed, dft_mel, dft_plain, mel_fb, band_sel, carry_feats, carry_len,
    n_valid, ema_in, noise_in, prev_p_in, prev_m_in, prev_m_len,
    prev_ldb_in, prev_ldb_len, nv_params,
    non_speech_label, window, wpad, mode, interpret,
):
    """A whole VAD chunk as ONE device program.

    Pallas frontend -> detector backend(s) -> labels, plus all carried state
    updates, compiled together: one host->device dispatch and one result
    pull per chunk. (Issuing the stages as separate launches costs a full
    host round trip each — the dominant latency on remote-attached TPU
    frontends.) ``mode`` picks the labels: "webrtc", "silero", or a fusion
    strategy; XLA dead-code-eliminates the backend the mode doesn't read.

    The neural context is handled statically: ``carry_feats`` is a fixed
    [CONTEXT, M] buffer whose last ``carry_len`` rows are valid; rows outside
    the valid window are zeroed *after* normalization, which is exactly the
    SAME-padding the conv would have seen at a true signal boundary.
    """
    from ffsubsync_tpu.models import neural_vad as nv
    from ffsubsync_tpu.ops.pallas import frontend as plf

    out = plf._frontend_call(
        plf.wire_to_frame(framed, window, wpad),
        dft_mel, dft_plain, mel_fb, band_sel, window, wpad, interpret,
    )
    logmel = out[:, plf.MEL_OFF : plf.MEL_OFF + plf.N_MELS]
    bands = out[:, plf.BAND_OFF : plf.BAND_OFF + plf.N_BANDS]
    (
        speech,
        speech_fuse,
        ema_out,
        noise_out,
        prev_p_out,
        prev_m_out,
        prev_m_len_out,
        prev_ldb_out,
        prev_ldb_len_out,
    ) = _webrtc_from_bands(
        bands, logmel, n_valid, ema_in, noise_in, prev_p_in, prev_m_in,
        prev_m_len, prev_ldb_in, prev_ldb_len,
    )
    # standalone --vad webrtc reads the pre-hangover strength stream;
    # fusion modes read the trailing-only boolean one (_webrtc_from_bands
    # docstring)
    if mode == "webrtc":
        webrtc_labels = non_speech_label + (1.0 - non_speech_label) * speech
    else:
        webrtc_labels = jnp.where(speech_fuse, 1.0, non_speech_label)

    ctx = nv.CONTEXT
    feats = jnp.concatenate([carry_feats, logmel], axis=0)  # [ctx+T, M]
    rows = jnp.arange(feats.shape[0])
    valid_rows = (rows >= ctx - carry_len) & (rows < ctx + n_valid)
    mask = valid_rows[:, None]
    denom = jnp.maximum(carry_len + n_valid, 1)
    mean = jnp.sum(feats * mask, axis=0, keepdims=True) / denom
    var = jnp.sum(((feats - mean) * mask) ** 2, axis=0, keepdims=True) / denom
    x = (feats - mean) / (jnp.sqrt(var) + 1e-3)
    x = jnp.where(mask, x, 0.0)
    probs = nv._net(nv_params, x, valid_rows.astype(x.dtype))[ctx:]
    silero_labels = 1.0 - (1.0 - probs) * (1.0 - non_speech_label)

    labels = _select_labels(mode, webrtc_labels, silero_labels)

    carry_out = jax.lax.dynamic_slice(
        feats, (n_valid, 0), (ctx, feats.shape[1])
    )
    carry_len_out = jnp.minimum(carry_len + n_valid, ctx)
    return (
        labels, ema_out, noise_out, prev_p_out, prev_m_out, prev_m_len_out,
        prev_ldb_out, prev_ldb_len_out, carry_out, carry_len_out,
    )


def _pipeline_chunk_samples(frame_rate: int, sample_rate: int) -> int:
    """Input samples per pipelined dispatch of the buffered VAD.

    Default 2700 s (45 min): launch COUNT, not launch size, is what costs
    time on a remote-attached TPU frontend — each state-carrying chunk
    program serializes behind the previous one plus a relay round trip, and
    measured 90-min totals scale with it (1 launch 0.114 s, 2 launches
    0.116 s, 4 launches 0.186 s, 9 launches 1.27 s, 18 launches 3.29 s —
    scripts/diag_chunks.py). 45-min chunks keep a feature-length movie at
    ≤2 launches while bounding per-chunk device memory (~100 MB of neural
    activations) and still overlapping staging/wire with compute when the
    decode streams in faster than the device drains. Always a whole number
    of analysis windows and of decimation strides. Override with
    ``FFS_TPU_PIPELINE_SECONDS`` (0 disables chunking).
    """
    import os

    seconds = float(os.environ.get("FFS_TPU_PIPELINE_SECONDS", "2700"))
    if seconds <= 0:
        return 0
    return int(seconds * sample_rate) * (frame_rate // sample_rate)


def _make_onelaunch_detector(
    mode: str, sample_rate: int, frame_rate: int, non_speech_label: float
) -> Callable[[np.ndarray], np.ndarray]:
    """Stateful chunk detector built on :func:`_vad_program` (device path).

    Large buffers are internally split into fixed pipeline chunks that are
    dispatched back-to-back WITHOUT pulling results in between: jax's async
    dispatch lets the host stage + ship chunk k+1 while the device runs
    chunk k, hiding the host→device link time that otherwise serializes in
    front of compute. Detector state (noise floor EMA, neural context) flows
    chunk to chunk as lazy device values, so semantics match the streaming
    path's chunking.
    """
    import os

    from ffsubsync_tpu.models.neural_vad import CONTEXT, N_MELS, NeuralVAD
    from ffsubsync_tpu.ops.features import prepare_staged_input

    state = {
        "ema": jnp.full((_N_BANDS,), jnp.inf, jnp.float32),
        "noise": jnp.full((_N_BANDS,), jnp.inf, jnp.float32),
        "prev_p": jnp.full((N_MELS,), jnp.inf, jnp.float32),
        "prev_m": jnp.zeros((_FLUX_BOX_K, 2), jnp.float32),
        "prev_m_len": jnp.int32(0),
        "prev_ldb": jnp.zeros((_SYL_LOOKBACK,), jnp.float32),
        "prev_ldb_len": jnp.int32(0),
        "carry": jnp.zeros((CONTEXT, N_MELS), jnp.float32),
        "carry_len": jnp.int32(0),
        "params": None,
    }

    def _ensure_params() -> None:
        if state["params"] is None:
            if mode == "webrtc":
                # the silero branch is dead code under this mode; zero
                # params of the right shapes keep tracing happy without
                # loading (or warning about) neural weights
                from ffsubsync_tpu.models.neural_vad import init_params

                state["params"] = jax.tree_util.tree_map(
                    jnp.zeros_like, init_params(jax.random.PRNGKey(0))
                )
            else:
                state["params"] = NeuralVAD.load_default(
                    frame_rate=frame_rate, sample_rate=sample_rate
                ).params

    def _dispatch(pcm):
        """Stage + enqueue one device program; returns a LAZY
        ``(padded_labels, n_valid)`` pair. The labels keep their bucketed
        pad so every downstream program sees bucketed static shapes only
        (no executable ever specializes on a movie's exact length)."""
        framed, mats, n_windows = prepare_staged_input(
            pcm, frame_rate, sample_rate
        )
        interpret = os.environ.get("FFS_TPU_PALLAS_INTERPRET") == "1"
        (
            labels,
            state["ema"],
            state["noise"],
            state["prev_p"],
            state["prev_m"],
            state["prev_m_len"],
            state["prev_ldb"],
            state["prev_ldb_len"],
            state["carry"],
            state["carry_len"],
        ) = _vad_program(
            jnp.asarray(framed),
            mats.dft_mel,
            mats.dft_plain,
            mats.mel_fb,
            mats.band_sel,
            state["carry"],
            state["carry_len"],
            jnp.int32(n_windows),
            state["ema"],
            state["noise"],
            state["prev_p"],
            state["prev_m"],
            state["prev_m_len"],
            state["prev_ldb"],
            state["prev_ldb_len"],
            state["params"],
            jnp.float32(non_speech_label),
            mats.window,
            mats.wpad,
            mode,
            interpret,
        )
        return labels, n_windows

    def _detect(pcm) -> np.ndarray:
        _ensure_params()
        pcm = _pcm_bytes_to_i16(pcm) if isinstance(pcm, bytes) else pcm
        chunk = _pipeline_chunk_samples(frame_rate, sample_rate)
        if chunk <= 0 or len(pcm) <= chunk:
            return LazySpeechSignal([_dispatch(pcm)]).materialize()
        # enqueue every chunk before pulling any result: host staging and
        # wire transfers of later chunks overlap device compute of earlier
        # ones; chunks are compacted ON DEVICE so the host pays exactly
        # one pull round trip for the whole signal
        pending = [
            _dispatch(pcm[pos : pos + chunk])
            for pos in range(0, len(pcm), chunk)
        ]
        return LazySpeechSignal(pending).materialize()

    def _detect_async(pcm) -> list:
        """Enqueue a buffer; returns a LIST of lazy device labels (no host
        pull). Splits at the same pipeline-chunk boundaries as ``_detect``
        so async and sync entry points are the same computation."""
        _ensure_params()
        pcm = _pcm_bytes_to_i16(pcm) if isinstance(pcm, bytes) else pcm
        chunk = _pipeline_chunk_samples(frame_rate, sample_rate)
        if chunk <= 0 or len(pcm) <= chunk:
            return [_dispatch(pcm)]
        return [
            _dispatch(pcm[pos : pos + chunk])
            for pos in range(0, len(pcm), chunk)
        ]

    _detect.dispatch_async = _detect_async
    return _detect


def make_fused_detector(
    sample_rate: int,
    frame_rate: int,
    non_speech_label: float,
    fusion_strategy: str = "weighted",
) -> Callable[[bytes], np.ndarray]:
    """Combine the webrtc-class and neural detectors.

    On the device path the entire chunk — frontend, both backends, fusion,
    state carry — is ONE compiled program and one launch
    (:func:`_vad_program`). Elsewhere (CPU jnp fallback, or substitute
    backends without the shared-frontend hook) the stages run separately on
    one shared frontend pass.
    """
    if fusion_strategy not in _FUSION_STRATEGIES:
        raise ValueError(
            "unknown fused VAD strategy %r; choose one of %s"
            % (fusion_strategy, ", ".join(_FUSION_STRATEGIES))
        )
    webrtc_detector = make_webrtc_detector(sample_rate, frame_rate, non_speech_label)
    silero_detector = make_silero_detector(sample_rate, frame_rate, non_speech_label)

    webrtc_from = getattr(webrtc_detector, "from_frontend", None)
    silero_from = getattr(silero_detector, "from_frontend", None)

    def _fuse(webrtc_result, silero_result) -> np.ndarray:
        # detectors can disagree by a frame at the tail; clip to common length
        min_len = min(len(webrtc_result), len(silero_result))
        webrtc_result = webrtc_result[:min_len]
        silero_result = silero_result[:min_len]
        if fusion_strategy == "intersection":
            return np.minimum(webrtc_result, silero_result)
        if fusion_strategy == "union":
            return np.maximum(webrtc_result, silero_result)
        return 0.6 * silero_result + 0.4 * webrtc_result

    if webrtc_from is None or silero_from is None:
        # substitute backends without the shared-frontend hook
        return lambda chunk: _fuse(webrtc_detector(chunk), silero_detector(chunk))

    def _fallback(pcm) -> np.ndarray:
        logmel, bands, _total, n_windows = compute_frontend(
            pcm, frame_rate, sample_rate
        )
        return _fuse(
            webrtc_from(logmel, bands, n_windows, for_fusion=True),
            silero_from(logmel, n_windows),
        )

    return _device_dispatch(
        fusion_strategy, sample_rate, frame_rate, non_speech_label, _fallback
    )


def make_detector(
    vad: str, sample_rate: int, frame_rate: int, non_speech_label: float
) -> Callable[[bytes], np.ndarray]:
    """Dispatch a ``--vad`` name (possibly ``subs_then_``-prefixed) to a kernel.

    Mirrors the reference's selection order (speech_transformers.py:655-679).
    """
    if "fused" in vad:
        fusion_strategy = vad.split(":", 1)[1] if ":" in vad else "weighted"
        return make_fused_detector(
            sample_rate, frame_rate, non_speech_label, fusion_strategy
        )
    if "webrtc" in vad:
        return make_webrtc_detector(sample_rate, frame_rate, non_speech_label)
    if "auditok" in vad:
        return make_auditok_detector(sample_rate, frame_rate, non_speech_label)
    if "silero" in vad:
        return make_silero_detector(sample_rate, frame_rate, non_speech_label)
    raise ValueError("unknown vad: %s" % vad)
