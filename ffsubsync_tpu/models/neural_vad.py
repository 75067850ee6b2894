# -*- coding: utf-8 -*-
"""In-tree neural VAD (the framework's "silero-class" detector).

The reference shells out to the torch-hub silero-vad model one 10 ms frame at
a time (ffsubsync/speech_transformers.py:186-236). This is a from-scratch
TPU-first replacement:

- **architecture**: log-mel features per 10 ms window → channel-mixing dense →
  four *dilated* temporal convolutions (kernel 5, dilations 1/2/4/8, ~0.6 s
  receptive field) → per-window speech probability. Dilated convs rather than
  an RNN keep the whole chunk's time axis parallel on the MXU — no
  sequential ``scan`` in the hot path.
- **chunking**: inference runs on ~100 s chunks; the last `CONTEXT` windows of
  mel features carry over between chunks so convolution context does not
  truncate at chunk boundaries. Chunks are padded to a bucket length so XLA
  compiles a handful of shapes, not one per chunk.
- **weights**: trained in-repo on synthetic speech/non-speech (see
  scripts/train_neural_vad.py) and shipped as an .npz; torch stays a
  non-dependency. Missing weights fall back to a deterministic random init
  with a loud warning (alignment still usually works because the energy
  detectors remain available).
"""
import logging
import os
from functools import partial
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ffsubsync_tpu.ops.features import (
    frames_per_window,
    log_mel_features,
    mel_filterbank,
)

logger = logging.getLogger(__name__)

N_MELS = 40
HIDDEN = 64
KERNEL = 5
DILATIONS = (1, 2, 4, 8)
CONTEXT = 64  # windows of left context carried across chunks
BUCKET = 1024  # time-axis padding granularity (limits recompiles)

WEIGHTS_FILENAME = "neural_vad_weights.npz"


def init_params(rng: jax.Array) -> Dict[str, jnp.ndarray]:
    keys = jax.random.split(rng, 2 + len(DILATIONS))
    params: Dict[str, jnp.ndarray] = {
        "w_in": jax.random.normal(keys[0], (N_MELS, HIDDEN)) * (1.0 / np.sqrt(N_MELS)),
        "b_in": jnp.zeros((HIDDEN,)),
        "w_out": jax.random.normal(keys[1], (HIDDEN, 1)) * (1.0 / np.sqrt(HIDDEN)),
        "b_out": jnp.zeros((1,)),
    }
    for i, _d in enumerate(DILATIONS):
        params["w_conv%d" % i] = jax.random.normal(
            keys[2 + i], (KERNEL, HIDDEN, HIDDEN)
        ) * (1.0 / np.sqrt(KERNEL * HIDDEN))
        params["b_conv%d" % i] = jnp.zeros((HIDDEN,))
    return params


def apply_model(params: Dict[str, jnp.ndarray], feats: jnp.ndarray) -> jnp.ndarray:
    """feats [T, N_MELS] → speech probability [T]."""
    # per-chunk feature normalization makes the net level-invariant
    mean = jnp.mean(feats, axis=0, keepdims=True)
    std = jnp.std(feats, axis=0, keepdims=True) + 1e-3
    x = (feats - mean) / std
    x = jax.nn.relu(jnp.dot(x, params["w_in"]) + params["b_in"])  # [T, H]
    x = x[None, :, :]  # [N=1, T, C]
    for i, d in enumerate(DILATIONS):
        y = jax.lax.conv_general_dilated(
            x,
            params["w_conv%d" % i],
            window_strides=(1,),
            padding="SAME",
            rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        x = jax.nn.relu(y + params["b_conv%d" % i]) + x  # residual
    logits = jnp.dot(x[0], params["w_out"])[:, 0] + params["b_out"][0]
    return jax.nn.sigmoid(logits)


@partial(jax.jit, static_argnames=("window",))
def _features_and_probs(params, mel_fb, pcm_i16, n_valid, window):
    feats = log_mel_features(pcm_i16, mel_fb, window)
    # mask padded windows out of the normalization statistics
    t = jnp.arange(feats.shape[0])
    mask = (t < n_valid)[:, None]
    mean = jnp.sum(feats * mask, axis=0, keepdims=True) / jnp.maximum(
        n_valid, 1
    )
    var = jnp.sum(((feats - mean) * mask) ** 2, axis=0, keepdims=True) / jnp.maximum(
        n_valid, 1
    )
    x = (feats - mean) / (jnp.sqrt(var) + 1e-3)
    x = jax.nn.relu(jnp.dot(x, params["w_in"]) + params["b_in"])
    x = x[None, :, :]
    for i, d in enumerate(DILATIONS):
        y = jax.lax.conv_general_dilated(
            x,
            params["w_conv%d" % i],
            window_strides=(1,),
            padding="SAME",
            rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        x = jax.nn.relu(y + params["b_conv%d" % i]) + x
    logits = jnp.dot(x[0], params["w_out"])[:, 0] + params["b_out"][0]
    return jax.nn.sigmoid(logits)


def default_weights_path() -> str:
    return os.path.join(os.path.dirname(__file__), "weights", WEIGHTS_FILENAME)


class NeuralVAD:
    """Chunked neural VAD inference with cross-chunk context carry."""

    def __init__(
        self,
        params: Dict[str, jnp.ndarray],
        frame_rate: int,
        sample_rate: int,
    ) -> None:
        self.params = params
        self.frame_rate = frame_rate
        self.sample_rate = sample_rate
        self.window = frames_per_window(frame_rate, sample_rate)
        n_freqs = self.window // 2 + 1
        self.mel_fb = jnp.asarray(mel_filterbank(n_freqs, frame_rate, N_MELS))
        self._carry_pcm = np.zeros(0, np.int16)

    @classmethod
    def load_default(cls, frame_rate: int, sample_rate: int) -> "NeuralVAD":
        path = default_weights_path()
        if os.path.exists(path):
            loaded = np.load(path)
            params = {k: jnp.asarray(loaded[k]) for k in loaded.files}
        else:
            logger.warning(
                "neural VAD weights not found at %s; using deterministic "
                "random initialization (detection quality will be poor — "
                "run scripts/train_neural_vad.py)",
                path,
            )
            params = init_params(jax.random.PRNGKey(0))
        return cls(params, frame_rate=frame_rate, sample_rate=sample_rate)

    def predict_chunk(self, pcm_i16: np.ndarray) -> np.ndarray:
        """Per-window speech probabilities for one PCM chunk."""
        n_windows = int(np.ceil(len(pcm_i16) / float(self.window)))
        if n_windows == 0:
            return np.zeros(0)
        context_windows = len(self._carry_pcm) // self.window
        pcm_full = np.concatenate([self._carry_pcm, np.asarray(pcm_i16, np.int16)])
        total_windows = context_windows + n_windows
        bucket_windows = -(-total_windows // BUCKET) * BUCKET
        padded = np.zeros(bucket_windows * self.window, np.int16)
        padded[: len(pcm_full)] = pcm_full
        probs = _features_and_probs(
            self.params,
            self.mel_fb,
            jnp.asarray(padded),
            jnp.int32(total_windows),
            self.window,
        )
        probs = np.asarray(probs)[context_windows:total_windows]
        # carry the last CONTEXT windows of raw pcm for the next chunk
        keep = min(CONTEXT * self.window, len(pcm_full))
        self._carry_pcm = pcm_full[len(pcm_full) - keep :]
        return probs.astype(np.float64)
