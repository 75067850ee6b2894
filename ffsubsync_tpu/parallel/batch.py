# -*- coding: utf-8 -*-
"""Batch / multi-chip sync: data-parallel alignment over a device mesh.

The reference is strictly single-process/single-file (SURVEY §2: its only
parallelism is a 4-thread ffmpeg fan-out). This module is the TPU-native
scale-out path with no reference equivalent: a *batch* of independent syncs
(e.g. a 10-episode season) is sharded over the chips of a slice along a
``data`` mesh axis. Each sync's FFT correlation is chip-local — the algorithm
needs no inter-chip collectives (each file is independent) — so the only
cross-chip traffic is the result gather XLA inserts at the end, riding ICI.

Shapes are padded to common batch-wide maxima so one compiled program serves
the whole batch.
"""
import logging
from functools import partial
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ffsubsync_tpu.ops.align import Alignment, next_pow2, _offset_window
from ffsubsync_tpu.subs.raster import RasterSpec

logger = logging.getLogger(__name__)


def _single_sync_kernel(
    ref_values, ref_len, starts, ends, weights, n_samples, start_offs, cnts, n,
    n_offsets,
):
    """Alignment of one reference against its K candidates (device-local).

    Same math as ops/align._align_specs_kernel, expressed over raw (value,
    geometry) arrays so it can be vmapped over a batch axis and sharded.
    """
    t = jnp.arange(n, dtype=jnp.int32)
    ref_pm = jnp.where(t < ref_len, 2.0 * ref_values.astype(jnp.float32) - 1.0, 0.0)

    def raster_pm(s, e, w, ns):
        diff = jnp.zeros((n + 1,), jnp.int32)
        diff = diff.at[s].add(1)
        diff = diff.at[e].add(-1)
        count = jnp.cumsum(diff)[:n]
        raw = jnp.where(count > 0, w, 0.0).astype(jnp.float32)
        return jnp.where(t < ns, 2.0 * raw - 1.0, 0.0)

    subs_pm = jax.vmap(raster_pm)(starts, ends, weights, n_samples)
    ref_f = jnp.fft.rfft(ref_pm)
    sub_f = jnp.fft.rfft(subs_pm, axis=-1)
    c2 = jnp.fft.irfft(jnp.conj(sub_f) * ref_f[None, :], n=n, axis=-1)
    j = jnp.arange(n_offsets, dtype=jnp.int32)[None, :]
    offs = start_offs[:, None] - j
    gathered = jnp.take_along_axis(c2, jnp.mod(offs, n), axis=-1)
    gathered = jnp.where(j < cnts[:, None], gathered, -jnp.inf)
    best_j = jnp.argmax(gathered, axis=-1)
    best_off = jnp.take_along_axis(offs, best_j[:, None], axis=-1)[:, 0]

    def rescore(sub_pm, off):
        return jnp.dot(sub_pm, jnp.roll(ref_pm, -off))

    best_score = jax.vmap(rescore)(subs_pm, best_off)
    return best_score, best_off


@partial(jax.jit, static_argnames=("n", "n_offsets"))
def _batched_sync_kernel(
    ref_values, ref_lens, starts, ends, weights, n_samples, start_offs, cnts,
    n, n_offsets,
):
    """vmap of the single-sync kernel over the (sharded) batch axis."""
    return jax.vmap(
        _single_sync_kernel, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None, None)
    )(ref_values, ref_lens, starts, ends, weights, n_samples, start_offs, cnts,
      n, n_offsets)


class BatchAligner:
    """Scores batches of (reference, candidates) pairs across a device mesh."""

    def __init__(self, mesh: Optional[Mesh] = None) -> None:
        if mesh is None:
            devices = jax.devices()
            mesh = Mesh(np.array(devices), ("data",))
        self.mesh = mesh

    def align_batch(
        self,
        refs: Sequence[np.ndarray],
        candidates_per_ref: Sequence[Sequence[RasterSpec]],
        max_offset_samples: Optional[int] = None,
    ) -> List[List[Alignment]]:
        """One sharded launch scoring every file's candidate set.

        ``refs`` are speech signals — host arrays or device-resident
        :class:`~ffsubsync_tpu.ops.vad.LazySpeechSignal`s (the batch VAD
        pipeline's output); lazy refs are padded and stacked on device so
        no label bytes cross the link. Geometry/shape padding is
        batch-global so the program compiles once per bucket.
        """
        b = len(refs)
        assert b == len(candidates_per_ref)
        k = max(len(c) for c in candidates_per_ref)
        c_pad = next_pow2(
            max(
                1,
                max(
                    len(spec.starts)
                    for cands in candidates_per_ref
                    for spec in cands
                ),
            )
        )
        max_sub = max(
            spec.n_samples for cands in candidates_per_ref for spec in cands
        )
        n = next_pow2(max(len(r) for r in refs) + max_sub)
        n_offsets = (
            n if max_offset_samples is None else min(2 * int(max_offset_samples), n)
        )
        n_offsets = max(1, n_offsets)  # degrade gracefully at max_offset=0
        n_devices = self.mesh.devices.size
        b_pad = -(-b // n_devices) * n_devices

        any_lazy = any(hasattr(r, "padded_values") for r in refs)
        ref_values = None if any_lazy else np.zeros((b_pad, n), np.float32)
        ref_lens = np.zeros(b_pad, np.int32)
        starts = np.zeros((b_pad, k, c_pad), np.int32)
        ends = np.zeros((b_pad, k, c_pad), np.int32)
        weights = np.zeros((b_pad, k), np.float32)
        n_samples = np.ones((b_pad, k), np.int32)
        start_offs = np.zeros((b_pad, k), np.int32)
        cnts = np.ones((b_pad, k), np.int32)
        for i in range(b):
            ref = refs[i]
            if not any_lazy:
                ref_values[i, : len(ref)] = ref
            ref_lens[i] = len(ref)
            for j, spec in enumerate(candidates_per_ref[i]):
                starts[i, j, : len(spec.starts)] = spec.starts
                ends[i, j, : len(spec.ends)] = spec.ends
                weights[i, j] = spec.weight
                n_samples[i, j] = spec.n_samples
                start_offs[i, j], cnts[i, j] = _offset_window(
                    n, spec.n_samples, max_offset_samples
                )
        sharding = NamedSharding(self.mesh, P("data"))
        if any_lazy:
            pads = []
            for i in range(b_pad):
                if i >= b:
                    pads.append(jnp.zeros((n,), jnp.float32))
                    continue
                r = refs[i]
                if hasattr(r, "padded_values"):
                    # device-side compact to [n]; zeros beyond the signal
                    pads.append(r.padded_values(n))
                else:
                    host = np.zeros(n, np.float32)
                    host[: len(r)] = r
                    pads.append(jnp.asarray(host))
            ref_values = jnp.stack(pads)
        args = [
            jax.device_put(a, sharding)
            for a in (ref_values, ref_lens, starts, ends, weights, n_samples,
                      start_offs, cnts)
        ]
        scores, offsets = _batched_sync_kernel(*args, n, n_offsets)
        scores = np.asarray(scores)
        offsets = np.asarray(offsets)
        return [
            [
                Alignment(float(scores[i, j]), int(offsets[i, j]))
                for j in range(len(candidates_per_ref[i]))
            ]
            for i in range(b)
        ]


def make_vad_train_step(mesh: Mesh, learning_rate: float = 3e-3):
    """Data-parallel neural-VAD training step over a device mesh.

    The framework's one trainable model. Batch axis sharded over ``data``;
    gradients are averaged by the mean reduction inside ``value_and_grad``
    under jit, with XLA inserting the cross-chip psum. Returns
    (step_fn, init_fn).
    """
    import optax

    from ffsubsync_tpu.models import neural_vad
    from ffsubsync_tpu.ops.features import log_mel_features, mel_filterbank

    opt = optax.adam(learning_rate)

    def init_fn(rng, frame_rate=48000, sample_rate=100):
        params = neural_vad.init_params(rng)
        window = frame_rate // sample_rate
        mel_fb = jnp.asarray(
            mel_filterbank(window // 2 + 1, frame_rate, neural_vad.N_MELS)
        )
        return params, opt.init(params), mel_fb, window

    def loss_fn(params, mel_fb, window, pcm_batch, label_batch):
        def clip_loss(pcm, labels):
            feats = log_mel_features(pcm, mel_fb, window)
            probs = neural_vad.apply_model(params, feats)[: labels.shape[0]]
            eps = 1e-6
            return -jnp.mean(
                labels * jnp.log(probs + eps)
                + (1 - labels) * jnp.log(1 - probs + eps)
            )

        return jnp.mean(jax.vmap(clip_loss)(pcm_batch, label_batch))

    @partial(jax.jit, static_argnames=("window",))
    def step_fn(params, opt_state, mel_fb, pcm_batch, label_batch, window):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, mel_fb, window, pcm_batch, label_batch
        )
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step_fn, init_fn
