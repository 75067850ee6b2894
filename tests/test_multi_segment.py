# -*- coding: utf-8 -*-
"""Multi-segment sparse assembly + the synthetic (ratio, offset) recovery
oracle (modeled on the reference's tests/test_multi_segment.py:57-167)."""
import numpy as np
import pytest

from ffsubsync_tpu.media.segments import MultiSegmentVideoSpeechSource
from ffsubsync_tpu.ops.align import align_candidates
from ffsubsync_tpu.subs.raster import RasterSpec
from ffsubsync_tpu.constants import FRAMERATE_RATIOS


def _source(**kw):
    defaults = dict(
        vad="webrtc", sample_rate=100, frame_rate=48000, non_speech_label=0.0
    )
    defaults.update(kw)
    return MultiSegmentVideoSpeechSource(**defaults)


def test_segment_starts_even_spacing():
    src = _source(segment_count=4, segment_duration=60)
    starts = src._segment_starts(3600.0)
    assert len(starts) == 4
    assert starts[0] == 0
    assert starts[-1] == 3540
    gaps = np.diff(starts)
    assert np.allclose(gaps, gaps[0], atol=1)


def test_segment_starts_short_reference():
    src = _source(segment_count=8, segment_duration=60)
    assert src._segment_starts(45.0) == [0]


def test_segment_starts_margins():
    src = _source(segment_count=3, segment_duration=60, skip_intro_outro=True)
    starts = src._segment_starts(1000.0)
    assert starts[0] >= 30
    assert starts[-1] <= 1000 - 60 - 60


def test_subs_then_prefix_stripped():
    src = _source(vad="subs_then_webrtc")
    assert src.vad == "webrtc"


def test_sparse_assembly_and_partial_failures(monkeypatch):
    src = _source(segment_count=4, parallel_workers=2)
    monkeypatch.setattr(src, "_probe_total_duration", lambda fname: 400.0)

    def fake_extract(fname, start):
        if start > 250:
            raise RuntimeError("flaky segment")
        return start, np.ones(60 * 100)

    monkeypatch.setattr(src, "_extract_segment_speech", fake_extract)
    src.fit("movie.mkv")
    signal = src.transform()
    assert len(signal) == 400 * 100 + 2
    starts = src._segment_starts(400.0)
    good = [s for s in starts if s <= 250]
    for s in good:
        assert signal[s * 100 + 10] == 1.0
    bad = [s for s in starts if s > 250]
    for s in bad:
        assert signal[s * 100 + 10] == 0.0


def test_all_segments_failing_raises(monkeypatch):
    src = _source(segment_count=4)
    monkeypatch.setattr(src, "_probe_total_duration", lambda fname: 400.0)

    def fail(fname, start):
        raise RuntimeError("down")

    monkeypatch.setattr(src, "_extract_segment_speech", fail)
    with pytest.raises(ValueError, match="Unable to detect speech"):
        src.fit("movie.mkv")


def test_probe_failure_raises_actionable(monkeypatch):
    src = _source()
    def boom(fname):
        raise RuntimeError("no ffprobe")
    monkeypatch.setattr(src, "_probe_total_duration", boom)
    with pytest.raises(ValueError, match="multi-segment sync needs"):
        src.fit("movie.mkv")


def test_synthetic_recovery_from_sparse_segments():
    """The flagship numerical acceptance test: a sparse sampled signal still
    recovers the true (scale, offset) through the candidate-ratio search."""
    rng = np.random.RandomState(42)
    sample_rate = 100
    total = 1800.0  # 30 min
    true_ratio = FRAMERATE_RATIOS[1]  # 25/23.976
    true_offset = 12.34

    # random reference speech bitstring
    ref = (rng.rand(int(total * sample_rate)) > 0.8).astype(float)
    # subtitle timeline: t_sub = (t_ref - offset) / ratio
    # candidate scaling multiplies sub times by ratio, recovering t_ref - offset
    sub_len = int((total - true_offset) / true_ratio * sample_rate) + 10
    sub = np.zeros(sub_len)
    for t_sub in range(sub_len):
        t_ref = int(round((t_sub / sample_rate * true_ratio + true_offset) * sample_rate))
        if 0 <= t_ref < len(ref):
            sub[t_sub] = ref[t_ref]

    # sample 8 × 60 s segments of the reference into a sparse signal
    sparse = np.zeros_like(ref)
    seg_starts = np.linspace(0, total - 60, 8).astype(int)
    for s in seg_starts:
        sparse[s * sample_rate:(s + 60) * sample_rate] = (
            ref[s * sample_rate:(s + 60) * sample_rate]
        )

    # build candidate specs: rescale subtitle signal at each grid ratio
    candidates = []
    ratios = [1.0] + FRAMERATE_RATIOS + [1.0 / r for r in FRAMERATE_RATIOS]
    starts_idx = np.nonzero(np.diff(np.concatenate([[0], sub])) > 0)[0]
    ends_idx = np.nonzero(np.diff(np.concatenate([sub, [0]])) < 0)[0] + 1
    for ratio in ratios:
        s_scaled = np.round(starts_idx * ratio).astype(np.int32)
        e_scaled = np.round(ends_idx * ratio).astype(np.int32)
        n = int(sub_len * ratio) + 2
        candidates.append(
            RasterSpec(
                n_samples=n,
                starts=np.clip(s_scaled, 0, n),
                ends=np.clip(e_scaled, 0, n),
                weight=min(1.0 / ratio, 1.0),
                max_time=n / 100.0,
                sample_rate=sample_rate,
            )
        )
    results = align_candidates(sparse, candidates, max_offset_samples=6000)
    best = max(range(len(results)), key=lambda i: results[i].score)
    assert ratios[best] == pytest.approx(true_ratio, abs=1e-3)
    assert results[best].offset / sample_rate == pytest.approx(
        true_offset, abs=0.05
    )
