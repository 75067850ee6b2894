# -*- coding: utf-8 -*-
"""In-tree neural VAD (the framework's "silero-class" detector).

The reference shells out to the torch-hub silero-vad model one 10 ms frame at
a time (ffsubsync/speech_transformers.py:186-236). This is a from-scratch
TPU-first replacement:

- **architecture**: log-mel features per 10 ms window, augmented with three
  engineered temporal channels (spectral flux, its ±0.3 s box mean, local
  energy-modulation depth — :func:`_aux_channels`; computed inside the net
  from its own input so every call site feeds plain log-mel) →
  channel-mixing dense → seven *dilated* temporal convolutions (kernel 5,
  dilations 1/2/4/8/16/32/64, ±2.54 s receptive field — wide enough to see
  phrase structure) → per-window speech probability. Dilated convs rather
  than an RNN keep the whole chunk's time axis parallel on the MXU — no
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
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ffsubsync_tpu.ops.features import frames_per_window

logger = logging.getLogger(__name__)

N_MELS = 40
HIDDEN = 96
KERNEL = 5
# receptive field: ±2·Σd windows = ±2.54 s — wide enough to see phrase
# structure (pauses between utterances) AND the seconds-scale texture that
# separates a momentarily-dominant voice inside crowd babble from a real
# dialogue turn (the babble failure mode is sub-second voice dominance;
# only surrounding seconds of context disambiguate it)
DILATIONS = (1, 2, 4, 8, 16, 32, 64)
# One-sided data dependency of the aux channels (_aux_channels). The widest
# chain is the modulation channel: row i's ±30 box averages em rows i±30,
# and each em row j subtracts a ±15 box of the energy series — so row i
# reads energies out to i±45. (The flux chain is narrower: ±30 box over a
# prev-row diff = 31.)
AUX_RADIUS = 45
# windows of left context carried across chunks: the conv stack's one-sided
# receptive field PLUS the aux radius at its farthest input row, so chunked
# and unchunked inference are exactly equal
CONTEXT = 320

# The chunk carry here AND the sequence-parallel halo exchange
# (parallel/vad_shard.py) both move exactly CONTEXT rows of features; if the
# net's one-sided receptive field ever outgrew that, sharded labels would
# silently desynchronize from the monolithic program instead of failing.
assert (KERNEL // 2) * sum(DILATIONS) + AUX_RADIUS <= CONTEXT, (
    "neural VAD receptive field exceeds the carried context window"
)

WEIGHTS_FILENAME = "neural_vad_weights.npz"


N_AUX = 3  # engineered channels appended inside _net (_aux_channels)


def expected_param_shapes() -> Dict[str, Tuple[int, ...]]:
    """Parameter name -> shape for the CURRENT architecture (static)."""
    shapes: Dict[str, Tuple[int, ...]] = {
        "w_in": (N_MELS + N_AUX, HIDDEN),
        "b_in": (HIDDEN,),
        "w_out": (HIDDEN, 1),
        "b_out": (1,),
    }
    for i in range(len(DILATIONS)):
        shapes["w_conv%d" % i] = (KERNEL, HIDDEN, HIDDEN)
        shapes["b_conv%d" % i] = (HIDDEN,)
    return shapes


def init_params(rng: jax.Array) -> Dict[str, jnp.ndarray]:
    n_in = N_MELS + N_AUX
    keys = jax.random.split(rng, 2 + len(DILATIONS))
    params: Dict[str, jnp.ndarray] = {
        "w_in": jax.random.normal(keys[0], (n_in, HIDDEN)) * (1.0 / np.sqrt(n_in)),
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


def _dilated_conv(x: jnp.ndarray, w: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """SAME-padded dilated temporal conv as K shifted matmuls.

    Equivalent to ``lax.conv_general_dilated(x[None], w, rhs_dilation=(d,),
    padding="SAME", dimension_numbers=("NWC","WIO","NWC"))[0]`` but expressed
    as ``K`` plain ``[T,H]@[H,H]`` matmuls on time-shifted inputs: XLA's TPU
    conv lowering compiles slowly (minutes at movie-length T) and gains
    nothing here, while shifted matmuls compile in seconds and run straight
    on the MXU.
    """
    t = x.shape[0]
    idx = jnp.arange(t)
    y = jnp.zeros_like(x)
    for j in range(KERNEL):
        off = (j - KERNEL // 2) * dilation
        shifted = jnp.roll(x, -off, axis=0)
        valid = (idx + off >= 0) & (idx + off < t)
        shifted = jnp.where(valid[:, None], shifted, 0.0)
        y = y + jnp.dot(shifted, w[j], preferred_element_type=jnp.float32)
    return y


def _box_mean(
    v: jnp.ndarray, vm: jnp.ndarray, k: int, nonneg: bool = False
) -> jnp.ndarray:
    """Centered ±k box mean of a [T] series over its VALID rows only.

    ``vm`` is a {0,1} float mask of valid rows: invalid rows contribute
    nothing to the numerator and are not counted in the denominator. On a
    fully-valid series this is the classic edge-clamped box mean — and
    because every call site layouts its valid rows as one contiguous run,
    a box at the run's edge sees exactly the same sum/count no matter how
    many masked rows (chunk-carry slots, bucket padding) sit around the
    run. That invariance is what makes the one-launch fused program, the
    split host path, and the sequence-parallel shards produce bit-equal
    aux channels (they pad in different places).

    ``nonneg=True`` declares the input elementwise non-negative and clamps
    the result at zero. This is NOT redundant: the box sum is a difference
    of float32 prefix sums, and XLA:TPU lowers ``cumsum`` as a *parallel*
    scan whose rounding is non-monotone — for a movie-length series the
    prefix magnitude reaches ~1e4, so ``s[hi+1] - s[lo]`` over a near-zero
    stretch can come out a few 1e-4 NEGATIVE. Feeding that to ``sqrt`` makes
    a NaN that the dilated convs then smear ±2.5 s into valid windows and
    one NaN label poisons every alignment score (observed on-device as a
    bound-pinned +60 s sync; the host/interpret path's sequential cumsum is
    monotone and never shows it). The count cumsum is safe: {0,1} addends
    are exact in float32 far beyond movie length.
    """
    s = jnp.concatenate([jnp.zeros((1,), v.dtype), jnp.cumsum(v * vm)])
    c = jnp.concatenate([jnp.zeros((1,), vm.dtype), jnp.cumsum(vm)])
    t = v.shape[0]
    i = jnp.arange(t)
    lo = jnp.maximum(i - k, 0)
    hi = jnp.minimum(i + k, t - 1)
    num = jnp.take(s, hi + 1) - jnp.take(s, lo)
    if nonneg:
        num = jnp.maximum(num, 0.0)
    den = jnp.maximum(jnp.take(c, hi + 1) - jnp.take(c, lo), 1.0)
    return num / den


def _aux_channels(x: jnp.ndarray, vm: jnp.ndarray) -> jnp.ndarray:
    """Engineered temporal discriminators appended to the mel channels.

    The dilated stack CAN synthesize these from raw mel, but handing them
    over directly is inductive bias the hard negatives need — crowd babble
    in particular: a dozen overlapped talkers average into a spectrum whose
    per-window flux dynamics and energy-modulation depth differ measurably
    from one dominant voice with real pauses (the cocktail-party statistics
    classic VAD literature keys on). All three are parallel box/prefix ops:

    - per-window total-variation flux of the softmax-normalized spectrum;
    - its ±0.3 s box mean (sustained motion, not single transients);
    - local energy-modulation depth: RMS of the mean-channel's deviation
      from its ±0.15 s box mean, box-averaged over ±0.3 s — syllabic AM
      depth, which overlapped crowds fill in.

    ``vm`` masks the rows that hold real signal (see :func:`_net`). Every
    channel is exactly zero at masked rows, flux is additionally gated on
    the PREVIOUS row being valid (the run's first row diffs against
    nothing, matching the classic self-prev convention), and box means
    average over valid rows only — so the channels a valid row sees depend
    only on the valid run's contents, never on where a caller parked its
    padding.
    """
    p = jax.nn.softmax(x, axis=1)
    prev = jnp.concatenate([p[:1], p[:-1]], axis=0)
    prev_ok = jnp.concatenate([jnp.zeros((1,), vm.dtype), vm[:-1]])
    flux = 0.5 * jnp.sum(jnp.abs(p - prev), axis=1) * prev_ok * vm
    e = jnp.mean(x, axis=1) * vm
    em = (e - _box_mean(e, vm, 15)) * vm
    mod = jnp.sqrt(_box_mean(em * em, vm, 30, nonneg=True) + 1e-6) * vm
    return jnp.stack(
        [flux, _box_mean(flux, vm, 30, nonneg=True) * vm, mod], axis=1
    )


def _net(
    params: Dict[str, jnp.ndarray], x: jnp.ndarray, vm: jnp.ndarray
) -> jnp.ndarray:
    """Normalized feats [T, M] + valid mask [T] -> probability [T].

    ``vm`` marks the contiguous run of rows holding real (normalized)
    features; the caller must already have zeroed ``x`` outside it. The
    convolutions see plain zeros there (a true signal boundary's SAME
    padding), and the aux channels are computed mask-aware so chunk
    carries, bucket padding, and shard halos all reproduce the exact
    statistics of the unchunked signal.
    """
    x = jnp.concatenate([x, _aux_channels(x, vm)], axis=1)  # [T, M + N_AUX]
    # Masking the ACTIVATIONS (not just the inputs) at invalid rows is what
    # makes padding placement invisible: biases give an all-zero input row a
    # nonzero activation (relu(b)), so without this an in-array padding row
    # would leak different left-context into the convs than the true
    # out-of-array zeros _dilated_conv supplies at the array edge — the two
    # layouts (tail bucket padding vs head chunk carry) would disagree near
    # the signal boundary.
    vmc = vm[:, None]
    x = jax.nn.relu(jnp.dot(x, params["w_in"]) + params["b_in"]) * vmc  # [T, H]
    for i, d in enumerate(DILATIONS):
        y = _dilated_conv(x, params["w_conv%d" % i], d)
        x = (jax.nn.relu(y + params["b_conv%d" % i]) + x) * vmc  # residual
    logits = jnp.dot(x, params["w_out"])[:, 0] + params["b_out"][0]
    return jax.nn.sigmoid(logits)


def apply_model(params: Dict[str, jnp.ndarray], feats: jnp.ndarray) -> jnp.ndarray:
    """feats [T, N_MELS] -> speech probability [T]."""
    # per-chunk feature normalization makes the net level-invariant
    mean = jnp.mean(feats, axis=0, keepdims=True)
    std = jnp.std(feats, axis=0, keepdims=True) + 1e-3
    vm = jnp.ones((feats.shape[0],), feats.dtype)
    return _net(params, (feats - mean) / std, vm)


@jax.jit
def _probs_from_feats(params, feats, n_valid):
    """Masked-normalized log-mel feats [T, M] -> speech probability [T].

    Same network as :func:`apply_model`, but the normalization statistics
    exclude windows past ``n_valid`` (time-axis bucket padding).
    """
    t = jnp.arange(feats.shape[0])
    mask = (t < n_valid)[:, None]
    denom = jnp.maximum(n_valid, 1)
    mean = jnp.sum(feats * mask, axis=0, keepdims=True) / denom
    var = jnp.sum(((feats - mean) * mask) ** 2, axis=0, keepdims=True) / denom
    x = (feats - mean) / (jnp.sqrt(var) + 1e-3)
    # zero padded rows so the convs see true-boundary zeros (matches the
    # one-launch program in ops/vad._vad_program exactly)
    x = jnp.where(mask, x, 0.0)
    return _net(params, x, mask[:, 0].astype(feats.dtype))


def default_weights_path(rate: Optional[int] = None) -> str:
    """Weights file for a given *analysis* rate (log-mel layouts differ per
    rate); the rate-less legacy name is the 48 kHz fallback."""
    weights_dir = os.path.join(os.path.dirname(__file__), "weights")
    if rate is not None:
        rated = os.path.join(weights_dir, "neural_vad_weights_%d.npz" % rate)
        if os.path.exists(rated):
            return rated
    return os.path.join(weights_dir, WEIGHTS_FILENAME)


def has_trained_weights(rate: int) -> bool:
    """Whether USABLE rate-specific trained weights ship for this *analysis*
    rate.

    Callers that can choose the PCM rate (the native WAV reader) use this to
    avoid feeding the net a log-mel layout it was never trained on. Usable
    means shape-compatible with the current architecture: a stale file from
    an older architecture would silently route audio onto a random-init net
    (the loader's degraded fallback), which is strictly worse than picking a
    rate whose weights are current. The shape check reads only npz headers.
    """
    weights_dir = os.path.join(os.path.dirname(__file__), "weights")
    path = os.path.join(weights_dir, "neural_vad_weights_%d.npz" % rate)
    if not os.path.exists(path):
        return False
    try:
        expected = expected_param_shapes()
        with np.load(path) as loaded:
            return all(
                k in loaded.files and loaded[k].shape == shape
                for k, shape in expected.items()
            )
    except (OSError, ValueError):
        return False


class NeuralVAD:
    """Chunked neural VAD inference with cross-chunk context carry.

    Context is carried in the *feature* domain: log-mel windows are
    independent of each other, so prepending the last ``CONTEXT`` windows of
    features is exactly equivalent to re-running the frontend on the
    concatenated PCM -- and lets the fused detector share one frontend pass
    per chunk between the neural and spectral backends.
    """

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
        self._carry_feats: Optional[jnp.ndarray] = None  # [<=CONTEXT, N_MELS]

    # weights path -> device-resident params. A detector is constructed per
    # sync; re-reading the .npz and re-uploading identical parameters every
    # run wastes host I/O and link time (the link is the pipeline bottleneck)
    _params_cache: Dict[str, Dict[str, jnp.ndarray]] = {}

    @classmethod
    def load_default(cls, frame_rate: int, sample_rate: int) -> "NeuralVAD":
        from ffsubsync_tpu.ops.features import analysis_rate

        path = default_weights_path(analysis_rate(frame_rate, sample_rate))
        cached = cls._params_cache.get(path)
        if cached is not None:
            return cls(cached, frame_rate=frame_rate, sample_rate=sample_rate)
        params = None
        if os.path.exists(path):
            loaded = np.load(path)
            expected = expected_param_shapes()
            mismatched = sorted(
                set(expected)
                - {
                    k
                    for k in loaded.files
                    if k in expected and loaded[k].shape == expected[k]
                }
            )
            if not mismatched:
                params = {k: jnp.asarray(loaded[k]) for k in loaded.files}
            else:
                logger.warning(
                    "neural VAD weights at %s predate the current "
                    "architecture (missing/mis-shaped: %s); retrain with "
                    "scripts/train_neural_vad.py",
                    path,
                    mismatched,
                )
        if params is None:
            logger.warning(
                "no usable neural VAD weights at %s; using deterministic "
                "random initialization (detection quality will be poor -- "
                "run scripts/train_neural_vad.py)",
                path,
            )
            params = init_params(jax.random.PRNGKey(0))
        cls._params_cache[path] = params
        return cls(params, frame_rate=frame_rate, sample_rate=sample_rate)

    def predict_from_frontend(
        self, logmel: jnp.ndarray, n_windows: int
    ) -> np.ndarray:
        """Per-window speech probabilities from (padded) frontend features."""
        from ffsubsync_tpu.ops.pallas.frontend import padded_window_count

        if n_windows == 0:
            return np.zeros(0)
        feats_valid = logmel[:n_windows]
        n_ctx = 0
        if self._carry_feats is not None:
            n_ctx = int(self._carry_feats.shape[0])
            feats_valid = jnp.concatenate([self._carry_feats, feats_valid])
        total = n_ctx + n_windows
        t_pad = padded_window_count(total)
        feats = jnp.pad(feats_valid, ((0, t_pad - total), (0, 0)))
        probs = _probs_from_feats(self.params, feats, jnp.int32(total))
        keep = min(CONTEXT, total)
        self._carry_feats = feats_valid[total - keep :]
        return np.asarray(probs[n_ctx:total], dtype=np.float64)

    def predict_chunk(self, pcm_i16: np.ndarray) -> np.ndarray:
        """Per-window speech probabilities for one PCM chunk."""
        from ffsubsync_tpu.ops.features import compute_frontend

        logmel, _bands, _total, n_windows = compute_frontend(
            pcm_i16, self.frame_rate, self.sample_rate
        )
        return self.predict_from_frontend(logmel, n_windows)
