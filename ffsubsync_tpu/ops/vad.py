# -*- coding: utf-8 -*-
"""Voice-activity-detection backends, TPU-native.

The reference drives three out-of-tree native detectors — webrtcvad (C++ GMM),
silero (torch), auditok (energy tokenizer) — one 10 ms frame at a time on the
host (ffsubsync/speech_transformers.py:101-296). Here each ``--vad`` choice
maps to an in-tree device kernel operating on whole ~100 s chunks:

- ``webrtc`` → spectral sub-band SNR detector: band energies on device
  (rfft + band matmul), adaptive minimum-statistics noise floor tracked by a
  ``lax.scan``, weighted-SNR vote with hangover. Frames judged non-speech
  emit ``non_speech_label`` ("not sure", parity with
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

from ffsubsync_tpu.ops.features import (
    band_energies,
    band_selector_matrix,
    frames_per_window,
    window_energies_db,
)

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


def _pcm_bytes_to_i16(chunk: bytes) -> np.ndarray:
    if isinstance(chunk, np.ndarray):
        if chunk.dtype == np.uint8:  # reference passes uint8 views of s16le
            return chunk.view(np.int16)
        return chunk.astype(np.int16)
    return np.frombuffer(chunk, np.int16)


@partial(jax.jit, static_argnames=("window",))
def _webrtc_chunk_kernel(pcm_i16, band_sel, ema_state, noise_floor, window):
    """Band energies → EMA smoothing → adaptive min-statistics noise floor →
    weighted SNR vote with hangover.

    ``+inf`` in the carried state means "uninitialized" (first chunk): the
    first window's energies seed both the EMA and the floor. Returns
    (speech_bool [T], ema_state [B], noise_floor [B]).
    """
    bands, _total = band_energies(pcm_i16, band_sel, window)
    bands = jnp.maximum(bands, 1e-12)

    def track(carry, e):
        ema, noise = carry
        ema = jnp.where(
            jnp.isinf(ema), e, _ENERGY_EMA_ALPHA * e + (1.0 - _ENERGY_EMA_ALPHA) * ema
        )
        noise = jnp.minimum(ema, noise * _NOISE_FLOOR_GROWTH + 1e-12)
        return (ema, noise), (ema, noise)

    (ema_state, noise_floor), (ema_seq, noise_seq) = jax.lax.scan(
        track, (ema_state, noise_floor), bands
    )
    snr_db = 10.0 * (jnp.log10(ema_seq) - jnp.log10(noise_seq + 1e-12))
    score = jnp.dot(snr_db, jnp.asarray(_BAND_WEIGHTS)) / _BAND_WEIGHTS.sum()
    raw = score > _SNR_THRESHOLD_DB

    def hang(carry, s):
        carry = jnp.where(s, _HANGOVER_WINDOWS, jnp.maximum(carry - 1, 0))
        return carry, carry > 0

    _, speech = jax.lax.scan(hang, jnp.int32(0), raw)
    return speech, ema_state, noise_floor


def make_webrtc_detector(
    sample_rate: int, frame_rate: int, non_speech_label: float
) -> Callable[[bytes], np.ndarray]:
    """WebRTC-class detector: spectral sub-band SNR kernel on device."""
    window = frames_per_window(frame_rate, sample_rate)
    n_freqs = window // 2 + 1
    band_sel = jnp.asarray(band_selector_matrix(n_freqs, frame_rate, window))
    n_bands = band_sel.shape[1]
    state = {
        "ema": jnp.full((n_bands,), jnp.inf, jnp.float32),
        "noise": jnp.full((n_bands,), jnp.inf, jnp.float32),
    }

    def _detect(chunk) -> np.ndarray:
        pcm = _pcm_bytes_to_i16(chunk)
        n_windows = int(np.ceil(len(pcm) / float(window)))
        if n_windows == 0:
            return np.zeros(0)
        padded = np.zeros(n_windows * window, np.int16)
        padded[: len(pcm)] = pcm
        speech, state["ema"], state["noise"] = _webrtc_chunk_kernel(
            jnp.asarray(padded), band_sel, state["ema"], state["noise"], window
        )
        speech = np.asarray(speech[:n_windows])
        return np.where(speech, 1.0, non_speech_label)

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
    window = frames_per_window(frame_rate, sample_rate)
    min_length = int(MIN_TOKEN_FACTOR * sample_rate)
    max_length = int(MAX_TOKEN_FACTOR * sample_rate)
    max_silence = int(MAX_SILENCE_FACTOR * sample_rate)

    def _detect(chunk) -> np.ndarray:
        pcm = _pcm_bytes_to_i16(chunk)
        n_windows = int(np.ceil(len(pcm) / float(window)))
        if n_windows == 0:
            return np.zeros(0)
        padded = np.zeros(n_windows * window, np.int16)
        padded[: len(pcm)] = pcm
        energies = np.asarray(window_energies_db(jnp.asarray(padded), window))
        valid = energies[:n_windows] >= ENERGY_THRESHOLD_DB
        length = n_windows
        media_bstring = np.zeros(length + 1)
        for tok_start, tok_end in tokenize_validity(
            valid, min_length, max_length, max_silence
        ):
            media_bstring[tok_start] = 1.0
            media_bstring[tok_end + 1] = non_speech_label - 1.0
        return np.clip(np.cumsum(media_bstring)[:-1], 0.0, 1.0)

    return _detect


def make_silero_detector(
    sample_rate: int, frame_rate: int, non_speech_label: float
) -> Callable[[bytes], np.ndarray]:
    """Neural VAD detector (in-tree silero-class model, device inference)."""
    from ffsubsync_tpu.models.neural_vad import NeuralVAD

    model = NeuralVAD.load_default(frame_rate=frame_rate, sample_rate=sample_rate)

    def _detect(chunk) -> np.ndarray:
        pcm = _pcm_bytes_to_i16(chunk)
        probs = model.predict_chunk(pcm)
        return 1.0 - (1.0 - probs) * (1.0 - non_speech_label)

    return _detect


def make_fused_detector(
    sample_rate: int,
    frame_rate: int,
    non_speech_label: float,
    fusion_strategy: str = "weighted",
) -> Callable[[bytes], np.ndarray]:
    """Combine the webrtc-class and neural detectors."""
    if fusion_strategy not in _FUSION_STRATEGIES:
        raise ValueError(
            "unknown fused VAD strategy %r; choose one of %s"
            % (fusion_strategy, ", ".join(_FUSION_STRATEGIES))
        )
    webrtc_detector = make_webrtc_detector(sample_rate, frame_rate, non_speech_label)
    silero_detector = make_silero_detector(sample_rate, frame_rate, non_speech_label)

    def _detect(chunk) -> np.ndarray:
        webrtc_result = webrtc_detector(chunk)
        silero_result = silero_detector(chunk)
        # detectors can disagree by a frame at the tail; clip to common length
        min_len = min(len(webrtc_result), len(silero_result))
        webrtc_result = webrtc_result[:min_len]
        silero_result = silero_result[:min_len]
        if fusion_strategy == "intersection":
            return np.minimum(webrtc_result, silero_result)
        if fusion_strategy == "union":
            return np.maximum(webrtc_result, silero_result)
        return 0.6 * silero_result + 0.4 * webrtc_result

    return _detect


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
