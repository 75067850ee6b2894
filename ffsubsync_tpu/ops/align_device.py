# -*- coding: utf-8 -*-
"""Device half of the FFT alignment core (see :mod:`ffsubsync_tpu.ops.align`).

Split from the API module so that host-only syncs (srt↔srt, serialized
references) never pay the jax import: :func:`align.align_candidates` imports
this module lazily, only when it actually routes work to the device.
"""
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ffsubsync_tpu.subs.raster import RasterSpec


def _pm_kernel_raster(starts, ends, weight, n_valid_samples, n):
    """On-device: interval geometry → ±1-mapped signal of static length *n*.

    Padding cues are (0, 0) intervals whose +1/-1 scatter contributions cancel.
    Values: ``2·w - 1`` on covered samples, ``-1`` on uncovered samples inside
    the signal's true length, ``0`` beyond (the FFT zero-pad region).
    """
    diff = jnp.zeros((n + 1,), jnp.int32)
    diff = diff.at[starts].add(1)
    diff = diff.at[ends].add(-1)
    count = jnp.cumsum(diff)[:n]
    raw = jnp.where(count > 0, weight, 0.0).astype(jnp.float32)
    t = jnp.arange(n, dtype=jnp.int32)
    return jnp.where(t < n_valid_samples, 2.0 * raw - 1.0, 0.0)


@partial(jax.jit, static_argnames=("n",))
def _ref_pm_from_spec(starts, ends, weight, n_samples, n):
    return _pm_kernel_raster(starts, ends, weight, n_samples, n)


@partial(jax.jit, static_argnames=("n",))
def _ref_pm_from_signal(values, length, n):
    """±1-map a materialized signal (audio VAD / deserialized reference)."""
    t = jnp.arange(n, dtype=jnp.int32)
    return jnp.where(t < length, 2.0 * values.astype(jnp.float32) - 1.0, 0.0)


@partial(jax.jit, static_argnames=("n", "n_offsets"))
def _align_specs_kernel(
    ref_pm, starts, ends, weights, n_samples, start_offs, cnts, n, n_offsets
):
    """Batched rasterize + FFT cross-correlate + masked argmax + exact rescore.

    Args:
      ref_pm: f32[n] ±1-mapped reference (zeros beyond its true length).
      starts, ends: i32[K, C] candidate cue intervals (padded with (0, 0)).
      weights: f32[K] per-candidate written value ``min(1/ratio, 1)``.
      n_samples: i32[K] per-candidate true signal length.
      start_offs: i32[K] largest allowed offset per candidate.
      cnts: i32[K] number of allowed offsets (descending from start_offs).
    Returns:
      (scores f32[K], offsets i32[K]).
    """
    subs_pm = jax.vmap(_pm_kernel_raster, in_axes=(0, 0, 0, 0, None))(
        starts, ends, weights, n_samples, n
    )
    ref_f = jnp.fft.rfft(ref_pm)
    sub_f = jnp.fft.rfft(subs_pm, axis=-1)
    # c2[k, m] = sum_s subs_pm[k, s] * ref_pm[(s + m) mod n]
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
def _align_signals_kernel(ref_pm, subs_pm, start_offs, cnts, n, n_offsets):
    """Like :func:`_align_specs_kernel` but for pre-materialized ±1 signals."""
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


def prepare_ref_pm(ref, n: int) -> jnp.ndarray:
    """Build the device-resident ±1 reference signal of FFT length *n*."""
    if hasattr(ref, "padded_values"):  # LazySpeechSignal: already on device
        # device-side compact straight into the FFT buffer; the ±1-map
        # program is shared with the host-pushed path (same [n] aval)
        return _ref_pm_from_signal(
            ref.padded_values(n), jnp.int32(len(ref)), n
        )
    if isinstance(ref, RasterSpec):
        c = max(1, len(ref.starts))
        starts = np.zeros(c, np.int32)
        ends = np.zeros(c, np.int32)
        starts[: len(ref.starts)] = ref.starts
        ends[: len(ref.ends)] = ref.ends
        return _ref_pm_from_spec(
            jnp.asarray(starts),
            jnp.asarray(ends),
            jnp.float32(ref.weight),
            jnp.int32(ref.n_samples),
            n,
        )
    values = np.zeros(n, np.float32)
    values[: len(ref)] = ref
    return _ref_pm_from_signal(jnp.asarray(values), jnp.int32(len(ref)), n)
