# -*- coding: utf-8 -*-
"""TPU-native FFT alignment core.

The reference aligns one candidate at a time on the CPU: ±1-map both signals,
zero-pad to a power of two, ``ifft(fft(sub)·fft(flip(ref)))``, mask extreme
offsets with -inf, argmax (ffsubsync/aligners.py:24-86), looping serially over
the candidate framerate-ratio pipes (aligners.py:136-151). Here the whole
candidate search is **one jitted device launch**:

1. every candidate's 100 Hz signal is rasterized *on device* from its cue
   interval geometry (scatter ±1 counts → cumsum → threshold), so only tiny
   index arrays cross host→device;
2. the ±1 mapping applies over each signal's true length, zeros beyond — the
   same layout the reference's zero-padded FFT sees;
3. a single batched rFFT cross-correlation scores all candidates;
4. allowed offsets are gathered in *descending* order and argmax'd, which
   reproduces the reference's convolve indexing exactly: allowed offsets are
   ``(-max, max]`` (note the asymmetry: -max itself is masked,
   aligners.py:41-42) and ties break toward the largest offset
   (``np.argmax`` takes the first maximum of the reverse-ordered convolve);
5. the winning offset's score is re-computed with an exact dot product, so
   cross-candidate selection is immune to float32 FFT rounding.

Offset convention (derived from aligners.py:45-48, 70-74): a positive offset
means the subtitles fire *early* and must be shifted later;
``offset_seconds = offset_samples / sample_rate``.

This module is importable WITHOUT jax: the device kernels live in
:mod:`ffsubsync_tpu.ops.align_device` and are imported lazily, so host-only
syncs (srt↔srt, serialized references) skip the jax import and device
session entirely.
"""
import logging
import math
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from ffsubsync_tpu.subs.raster import RasterSpec

logger = logging.getLogger(__name__)


class FailedToFindAlignmentException(Exception):
    pass


def next_pow2(n: int) -> int:
    return 1 << max(0, math.ceil(math.log2(max(1, n))))


@dataclass
class Alignment:
    """Result of scoring one candidate: best (score, offset_samples)."""

    score: float
    offset: int


def _offset_window(
    n: int, n_sub: int, max_offset_samples: Optional[int]
) -> Tuple[int, int]:
    """(largest allowed offset, count) for one candidate.

    The representable offsets of an n-point circular correlation with an
    n_sub-long candidate are ``[-n_sub, n - 1 - n_sub]``; masking intersects
    that with ``(-max, max]``.
    """
    if max_offset_samples is None:
        hi = n - 1 - n_sub
        lo = -n_sub
    else:
        hi = min(max_offset_samples, n - 1 - n_sub)
        lo = max(-max_offset_samples + 1, -n_sub)
    return hi, hi - lo + 1


RefLike = Union[RasterSpec, np.ndarray]


def _resolve_host_align(prefer_host: bool) -> bool:
    """Whether to score candidates on the host instead of the device.

    ``FFS_TPU_HOST_ALIGN=1``/``0`` force the choice; otherwise the caller's
    preference stands. The host path exists because the alignment problem is
    host-sized whenever no audio pipeline is running: a movie-length 100 Hz
    signal is ~0.5M samples, a few rfft calls in numpy. Initializing a device
    session just for that costs orders of magnitude more than the math —
    especially on remote-attached TPU frontends — and it is exactly what the
    reference itself does on the host (ffsubsync/aligners.py:70-74).
    """
    env = os.environ.get("FFS_TPU_HOST_ALIGN")
    if env == "1":
        return True
    if env == "0":
        return False
    return prefer_host


def _host_pm(signal_or_spec: RefLike, n: int) -> np.ndarray:
    """±1-map a reference or candidate onto an FFT buffer of length *n*."""
    pm = np.zeros(n, np.float64)
    if isinstance(signal_or_spec, RasterSpec):
        raw = signal_or_spec.materialize()
    else:
        raw = np.asarray(signal_or_spec, np.float64)
    pm[: len(raw)] = 2.0 * raw - 1.0
    return pm


def _align_candidates_host(
    ref: RefLike,
    candidates: Sequence[RasterSpec],
    max_offset_samples: Optional[int],
    n: int,
) -> List["Alignment"]:
    """Numpy mirror of the device kernel — same contract surface.

    Candidates are scored one at a time (a [K, n] float64 batch would cost
    ~100 MB of host RAM for nothing; K is single-digit). Offsets are gathered
    in descending order so ``np.argmax``'s first-maximum tie-break matches the
    device kernel and the reference (aligners.py:41-48).

    Precision note: the host FFT runs in float64 (numpy's native width — and
    the width the reference itself correlates at) while the device kernel
    uses float32; the reported *score* is an exact dot product on both
    paths, so only the argmax over the raw correlation can see rounding.
    On a mathematically exact tie this path resolves by the descending-
    offset ordering (pinned by tests/test_alignment.py::
    test_exact_tie_breaks_same_on_both_paths); the device kernel's pick
    among exactly-tied offsets is float32-FFT-rounding-determined — real
    audio correlations never tie exactly, and cross-candidate selection is
    protected by the exact rescore either way.
    """
    ref_pm = _host_pm(ref, n)
    ref_f = np.fft.rfft(ref_pm)
    out: List[Alignment] = []
    for cand in candidates:
        sub_pm = _host_pm(cand, n)
        c2 = np.fft.irfft(np.conj(np.fft.rfft(sub_pm)) * ref_f, n=n)
        hi, cnt = _offset_window(n, cand.n_samples, max_offset_samples)
        # cnt can be 0 (max_offset_seconds=0): the device kernel degrades to
        # scoring the single masked offset `hi` — mirror that exactly
        offs = hi - np.arange(max(cnt, 1))
        best_off = int(offs[int(np.argmax(c2[np.mod(offs, n)]))])
        score = float(np.dot(sub_pm, np.roll(ref_pm, -best_off)))
        out.append(Alignment(score, best_off))
    return out


def _ref_length(ref: RefLike) -> int:
    if isinstance(ref, RasterSpec):
        return ref.n_samples
    return int(len(ref))


def prepare_ref_pm(ref: RefLike, n: int):
    """Build the device-resident ±1 reference signal of FFT length *n*."""
    from ffsubsync_tpu.ops import align_device

    return align_device.prepare_ref_pm(ref, n)


def align_candidates(
    ref: RefLike,
    candidates: Sequence[RasterSpec],
    max_offset_samples: Optional[int] = None,
    prefer_host: bool = False,
) -> List[Alignment]:
    """Score every candidate against the reference in one device launch.

    With ``prefer_host`` (or ``FFS_TPU_HOST_ALIGN=1``) the same search runs
    in numpy on the host — the right call when no device session exists yet
    (subtitle↔subtitle or serialized-speech references), where spinning one
    up would dwarf the math.

    Raises :class:`FailedToFindAlignmentException` when either side is empty,
    matching the reference's guard (aligners.py:58-66).
    """
    n_ref = _ref_length(ref)
    if n_ref == 0 or any(c.n_samples == 0 for c in candidates):
        bad = min((c.n_samples for c in candidates), default=0)
        raise FailedToFindAlignmentException(
            "cannot align empty speech data "
            "(reference length=%d, subtitle length=%d); "
            "the reference or subtitles may contain no detectable speech"
            % (n_ref, bad)
        )
    if not candidates:
        return []
    n = next_pow2(n_ref + max(c.n_samples for c in candidates))
    if _resolve_host_align(prefer_host):
        return _align_candidates_host(ref, candidates, max_offset_samples, n)
    import jax.numpy as jnp

    from ffsubsync_tpu.ops import align_device

    k = len(candidates)
    c_pad = next_pow2(max(1, max(len(c.starts) for c in candidates)))
    starts = np.zeros((k, c_pad), np.int32)
    ends = np.zeros((k, c_pad), np.int32)
    weights = np.zeros(k, np.float32)
    n_samples = np.zeros(k, np.int32)
    start_offs = np.zeros(k, np.int32)
    cnts = np.zeros(k, np.int32)
    for i, cand in enumerate(candidates):
        starts[i, : len(cand.starts)] = cand.starts
        ends[i, : len(cand.ends)] = cand.ends
        weights[i] = cand.weight
        n_samples[i] = cand.n_samples
        start_offs[i], cnts[i] = _offset_window(n, cand.n_samples, max_offset_samples)
    n_offsets = (
        n if max_offset_samples is None else min(2 * int(max_offset_samples), n)
    )
    n_offsets = max(1, n_offsets)
    ref_pm = align_device.prepare_ref_pm(ref, n)
    scores, offsets = align_device._align_specs_kernel(
        ref_pm,
        jnp.asarray(starts),
        jnp.asarray(ends),
        jnp.asarray(weights),
        jnp.asarray(n_samples),
        jnp.asarray(start_offs),
        jnp.asarray(cnts),
        n,
        n_offsets,
    )
    scores = np.asarray(scores)
    offsets = np.asarray(offsets)
    return [Alignment(float(s), int(o)) for s, o in zip(scores, offsets)]


def align_signal_pair(
    refstring: Union[str, np.ndarray, Sequence[float]],
    substring: Union[str, np.ndarray, Sequence[float]],
    max_offset_samples: Optional[int] = None,
) -> Alignment:
    """Align two raw 0/1 signals (string or array form) — library parity shim.

    Accepts "10110"-style bitstrings like the reference's ``FFTAligner.fit``
    (aligners.py:51-54). Runs on the host (numpy) unless
    ``FFS_TPU_HOST_ALIGN=0`` forces the device kernel — these are host-sized
    100 Hz signals.
    """
    def _to_array(s):
        if isinstance(s, str):
            return np.array([int(ch) for ch in s], dtype=np.float64)
        return np.asarray(s, dtype=np.float64)

    ref = _to_array(refstring)
    sub = _to_array(substring)
    if len(ref) == 0 or len(sub) == 0:
        raise FailedToFindAlignmentException(
            "cannot align empty speech data "
            "(reference length=%d, subtitle length=%d); "
            "the reference or subtitles may contain no detectable speech"
            % (len(ref), len(sub))
        )
    n = next_pow2(len(ref) + len(sub))
    if _resolve_host_align(True):
        ref_pm = _host_pm(ref, n)
        sub_pm = _host_pm(sub, n)
        c2 = np.fft.irfft(
            np.conj(np.fft.rfft(sub_pm)) * np.fft.rfft(ref_pm), n=n
        )
        hi, cnt = _offset_window(n, len(sub), max_offset_samples)
        offs = hi - np.arange(max(cnt, 1))
        best_off = int(offs[int(np.argmax(c2[np.mod(offs, n)]))])
        score = float(np.dot(sub_pm, np.roll(ref_pm, -best_off)))
        return Alignment(score, best_off)
    import jax.numpy as jnp

    from ffsubsync_tpu.ops import align_device

    ref_pm = align_device.prepare_ref_pm(ref.astype(np.float32), n)
    sub_values = np.zeros(n, np.float32)
    sub_values[: len(sub)] = sub
    sub_pm = align_device._ref_pm_from_signal(
        jnp.asarray(sub_values), jnp.int32(len(sub)), n
    )
    hi, cnt = _offset_window(n, len(sub), max_offset_samples)
    n_offsets = n if max_offset_samples is None else min(2 * int(max_offset_samples), n)
    n_offsets = max(1, n_offsets)
    scores, offsets = align_device._align_signals_kernel(
        ref_pm,
        sub_pm[None, :],
        jnp.asarray([hi], jnp.int32),
        jnp.asarray([cnt], jnp.int32),
        n,
        n_offsets,
    )
    return Alignment(float(np.asarray(scores)[0]), int(np.asarray(offsets)[0]))
