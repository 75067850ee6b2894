# -*- coding: utf-8 -*-
"""Alignment core tests: parity with the reference's conventions
(tests/test_alignment.py:7-27 plus an independent numpy oracle)."""
import math

import numpy as np
import pytest

from ffsubsync_tpu.ops.align import (
    Alignment,
    FailedToFindAlignmentException,
    align_candidates,
    align_signal_pair,
    next_pow2,
)
from ffsubsync_tpu.subs.raster import RasterSpec


def oracle_align(ref, sub, max_offset_samples=None):
    """Independent float64 implementation of the documented algorithm:
    ±1 map, pad to 2^ceil(log2(m+n)), FFT cross-correlation, mask offsets
    outside (-max, max], argmax with first-max (= largest offset) tie-break.
    """
    ref = 2.0 * np.asarray(ref, dtype=float) - 1.0
    sub = 2.0 * np.asarray(sub, dtype=float) - 1.0
    n = 1 << int(math.ceil(math.log2(len(ref) + len(sub))))
    refpad = np.zeros(n)
    refpad[: len(ref)] = ref
    subpad = np.zeros(n)
    subpad[: len(sub)] = sub
    c2 = np.real(np.fft.ifft(np.conj(np.fft.fft(subpad)) * np.fft.fft(refpad)))
    # offsets in the reference's descending order
    offsets = list(range(n - 1 - len(sub), -len(sub) - 1, -1))
    best_score, best_off = -np.inf, None
    for o in offsets:
        if max_offset_samples is not None and not (
            -max_offset_samples < o <= max_offset_samples
        ):
            continue
        score = c2[o % n]
        if score > best_score + 1e-9:
            best_score, best_off = score, o
    return best_score, best_off


@pytest.mark.parametrize(
    "s1, s2, true_offset",
    [("111001", "11001", -1), ("1001", "1001", 0), ("10010", "01001", 1)],
)
def test_fft_alignment(s1, s2, true_offset):
    result = align_signal_pair(s2, s1)
    assert result.offset == true_offset


@pytest.mark.parametrize(
    "refstring, substring",
    [
        (np.array([]), np.array([1, 0, 1])),
        (np.array([1, 0, 1]), np.array([])),
        (np.array([]), np.array([])),
    ],
)
def test_fft_alignment_rejects_empty_speech(refstring, substring):
    with pytest.raises(FailedToFindAlignmentException, match="empty speech data"):
        align_signal_pair(refstring, substring)


@pytest.mark.parametrize("seed", range(5))
def test_alignment_matches_oracle_random(seed):
    rng = np.random.RandomState(seed)
    ref = (rng.rand(1000) > 0.7).astype(float)
    true_offset = int(rng.randint(-80, 80))
    # derive sub from ref shifted by true_offset: sub[t] = ref[t + offset]
    sub = np.zeros(900)
    for t in range(900):
        src = t + true_offset
        if 0 <= src < len(ref):
            sub[t] = ref[src]
    result = align_signal_pair(ref, sub, max_offset_samples=200)
    oracle_score, oracle_off = oracle_align(ref, sub, max_offset_samples=200)
    assert result.offset == oracle_off
    assert result.score == pytest.approx(oracle_score, abs=1e-2)
    assert result.offset == true_offset


def test_offset_mask_excludes_negative_bound():
    """Allowed offsets are (-max, max]: -max masked, +max kept (parity with
    aligners.py:41-42)."""
    rng = np.random.RandomState(0)
    ref = (rng.rand(400) > 0.5).astype(float)
    max_off = 10
    for true_offset in (max_off, -max_off):
        sub = np.zeros(300)
        for t in range(300):
            src = t + true_offset
            if 0 <= src < len(ref):
                sub[t] = ref[src]
        result = align_signal_pair(ref, sub, max_offset_samples=max_off)
        oracle_score, oracle_off = oracle_align(ref, sub, max_offset_samples=max_off)
        assert result.offset == oracle_off
        if true_offset == max_off:
            assert result.offset == max_off


@pytest.mark.parametrize("prefer_host", [False, True])
def test_align_candidates_batched_matches_single(prefer_host):
    rng = np.random.RandomState(1)
    ref = (rng.rand(2000) > 0.75).astype(float)
    ref_starts = np.nonzero(np.diff(np.concatenate([[0], ref])) > 0)[0]
    ref_ends = np.nonzero(np.diff(np.concatenate([ref, [0]])) < 0)[0] + 1
    ref_spec = RasterSpec(
        n_samples=len(ref),
        starts=ref_starts.astype(np.int32),
        ends=ref_ends.astype(np.int32),
        weight=1.0,
        max_time=len(ref) / 100.0,
        sample_rate=100,
    )
    assert np.array_equal(ref_spec.materialize(), ref)
    candidates = []
    expected = []
    for shift in (-30, 0, 17):
        starts = np.clip(ref_starts - shift, 0, 1500).astype(np.int32)
        ends = np.clip(ref_ends - shift, 0, 1500).astype(np.int32)
        spec = RasterSpec(
            n_samples=1500,
            starts=starts,
            ends=ends,
            weight=1.0,
            max_time=15.0,
            sample_rate=100,
        )
        candidates.append(spec)
        expected.append(
            oracle_align(ref, spec.materialize(), max_offset_samples=100)
        )
    # batched launch must match per-candidate oracles
    results = align_candidates(
        ref_spec, candidates, max_offset_samples=100, prefer_host=prefer_host
    )
    for result, (escore, eoff) in zip(results, expected):
        assert result.offset == eoff
        assert result.score == pytest.approx(escore, abs=1e-2)


@pytest.mark.parametrize("seed", range(4))
def test_host_align_matches_device(seed):
    """The numpy host path and the device kernel are the same contract:
    identical offsets, matching exact-dot scores, on both RasterSpec and
    materialized ndarray references."""
    rng = np.random.RandomState(seed)
    ref = (rng.rand(1500) > 0.72).astype(float)
    starts = np.nonzero(np.diff(np.concatenate([[0], ref])) > 0)[0]
    ends = np.nonzero(np.diff(np.concatenate([ref, [0]])) < 0)[0] + 1
    candidates = []
    for shift, weight in ((-40, 1.0), (25, 0.958), (0, 1.0)):
        candidates.append(
            RasterSpec(
                n_samples=1400,
                starts=np.clip(starts - shift, 0, 1400).astype(np.int32),
                ends=np.clip(ends - shift, 0, 1400).astype(np.int32),
                weight=weight,
                max_time=14.0,
                sample_rate=100,
            )
        )
    for ref_arg in (
        ref,
        RasterSpec(
            n_samples=len(ref),
            starts=starts.astype(np.int32),
            ends=ends.astype(np.int32),
            weight=1.0,
            max_time=len(ref) / 100.0,
            sample_rate=100,
        ),
    ):
        on_device = align_candidates(
            ref_arg, candidates, max_offset_samples=120, prefer_host=False
        )
        on_host = align_candidates(
            ref_arg, candidates, max_offset_samples=120, prefer_host=True
        )
        for d, h in zip(on_device, on_host):
            assert d.offset == h.offset
            assert d.score == pytest.approx(h.score, abs=1e-2)


def test_exact_tie_breaks_same_on_both_paths():
    """A mathematically exact correlation tie resolves by the pinned
    descending-offset rule on the float64 host path (the reference's own
    numeric width, aligners.py:41-48). The float32 device kernel's outcome
    on degenerate ties is FFT-rounding-determined (documented in
    ops/align._align_candidates_host) — real audio correlations never tie
    exactly, and cross-candidate *selection* is protected by the exact-dot
    rescore on both paths."""
    prefer_host = True
    # reference repeats the same burst at t=100 and t=300; a single-burst
    # candidate correlates identically at offsets 100 and 300
    ref = np.zeros(512)
    ref[100:120] = 1.0
    ref[300:320] = 1.0
    cand = RasterSpec(
        n_samples=128,
        starts=np.array([0], np.int32),
        ends=np.array([20], np.int32),
        weight=1.0,
        max_time=1.28,
        sample_rate=100,
    )
    result = align_candidates(
        ref, [cand], max_offset_samples=400, prefer_host=prefer_host
    )[0]
    assert result.offset == 300  # largest offset wins the tie


def test_host_align_env_override(monkeypatch):
    """FFS_TPU_HOST_ALIGN forces the path regardless of caller preference."""
    from ffsubsync_tpu.ops import align as align_mod

    calls = []
    real = align_mod._align_candidates_host

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(align_mod, "_align_candidates_host", spy)
    spec = RasterSpec(
        n_samples=64,
        starts=np.array([5], np.int32),
        ends=np.array([20], np.int32),
        weight=1.0,
        max_time=0.64,
        sample_rate=100,
    )
    monkeypatch.setenv("FFS_TPU_HOST_ALIGN", "1")
    align_mod.align_candidates(spec, [spec], prefer_host=False)
    assert calls  # env forced host
    calls.clear()
    monkeypatch.setenv("FFS_TPU_HOST_ALIGN", "0")
    align_mod.align_candidates(spec, [spec], prefer_host=True)
    assert not calls  # env forced device


def test_next_pow2():
    assert next_pow2(1) == 1
    assert next_pow2(2) == 2
    assert next_pow2(3) == 4
    assert next_pow2(1025) == 2048


def test_zero_max_offset_host_matches_device():
    """max_offset_samples=0 masks every offset; both paths must degrade to
    the same Alignment (offset 0 scored) instead of crashing."""
    spec = RasterSpec(
        n_samples=256,
        starts=np.array([10, 60], np.int32),
        ends=np.array([30, 90], np.int32),
        weight=1.0,
        max_time=2.56,
        sample_rate=100,
    )
    dev = align_candidates(spec, [spec], max_offset_samples=0, prefer_host=False)[0]
    host = align_candidates(spec, [spec], max_offset_samples=0, prefer_host=True)[0]
    assert dev.offset == host.offset
    assert host.score == pytest.approx(dev.score, abs=1e-2)
