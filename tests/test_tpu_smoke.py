# -*- coding: utf-8 -*-
"""Real-TPU smoke tier: the COMPILED Mosaic kernel vs the jnp fallback.

The regular suite runs pallas in interpret mode on the virtual CPU mesh
(tests/conftest.py), which validates semantics but never executes the
compiled Mosaic artifact — a real-TPU miscompile (layout, masking,
tiling) would only surface in the benchmark. This tier runs on the bench
box:

    FFS_TPU_TEST_PLATFORM=axon python -m pytest tests/test_tpu_smoke.py -v

and is skipped automatically anywhere the default backend is not a TPU.
First-run compiles go through the persistent XLA cache
(scripts/precompile.py warms it).
"""
import os

import numpy as np
import pytest

import jax


requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="needs a real TPU backend (run with FFS_TPU_TEST_PLATFORM=axon)",
)


def _speech_pcm(frame_rate: int) -> np.ndarray:
    from ffsubsync_tpu.models.synth_data import speech_signal_for_spans

    spans = [(2.0, 4.5), (8.0, 11.0), (15.0, 18.5), (24.0, 27.0)]
    wav = speech_signal_for_spans(30.0, spans, frame_rate, speech_level=0.4)
    return np.clip(wav * 32767, -32768, 32767).astype(np.int16)


@requires_tpu
def test_compiled_frontend_matches_jnp_on_device(monkeypatch):
    """Pallas (compiled Mosaic) frontend features == jnp composition."""
    from ffsubsync_tpu.ops import features

    frame_rate, sample_rate = 12000, 100
    pcm = _speech_pcm(frame_rate)
    monkeypatch.delenv("FFS_TPU_PALLAS_INTERPRET", raising=False)
    monkeypatch.delenv("FFS_TPU_DISABLE_PALLAS", raising=False)
    lm_k, bands_k, total_k, nw = features.compute_frontend(
        pcm, frame_rate, sample_rate
    )
    monkeypatch.setenv("FFS_TPU_DISABLE_PALLAS", "1")
    lm_j, bands_j, total_j, nw_j = features.compute_frontend(
        pcm, frame_rate, sample_rate
    )
    assert nw == nw_j
    # the MXU multiplies in bf16 (f32 accumulate): near-empty mel bins can
    # land ~0.4 apart in the log domain. A miscompile (bad layout/masking)
    # corrupts whole tiles, not 0.03% of scattered low-energy bins — so the
    # assertion is distributional plus a hard cap
    ref = np.asarray(lm_j)[:nw]
    lm_err = np.abs(np.asarray(lm_k)[:nw] - ref)
    tol = 2e-2 + 2e-2 * np.abs(ref)
    assert (lm_err < tol).mean() > 0.998, (lm_err < tol).mean()
    assert lm_err.max() < 1.0, lm_err.max()
    np.testing.assert_allclose(
        np.asarray(total_k)[:nw], np.asarray(total_j)[:nw], rtol=1e-2
    )


@requires_tpu
def test_movie_length_labels_finite_on_device(monkeypatch):
    """Movie-length neural-VAD labels are finite on the real chip.

    Regression guard for the parallel-cumsum NaN: XLA:TPU lowers
    ``jnp.cumsum`` as a parallel scan whose float32 rounding is
    non-monotone, so over ~18k windows a box sum taken as a prefix-sum
    difference can come out slightly negative on a near-silent stretch —
    ``sqrt`` of that is NaN, the dilated convs smear it into valid
    windows, and one NaN label pins the alignment at the offset bound
    (models/neural_vad._box_mean documents the clamp). Short signals
    never trip it: the prefix magnitude has to dwarf the addends. CPU
    cumsum is sequential (monotone), so only this tier can catch it.
    """
    from ffsubsync_tpu.models.synth_data import speech_signal_for_spans
    from ffsubsync_tpu.ops import vad as vad_mod

    frame_rate, sample_rate = 12000, 100
    # 3 min: dialogue up front, then a long near-silent tail — the
    # big-prefix + tiny-addend shape the rounding bug needs
    spans = [(5.0 + 9.0 * k, 9.0 + 9.0 * k) for k in range(6)]
    wav = speech_signal_for_spans(180.0, spans, frame_rate, speech_level=0.4)
    pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)
    monkeypatch.delenv("FFS_TPU_PALLAS_INTERPRET", raising=False)
    monkeypatch.delenv("FFS_TPU_DISABLE_PALLAS", raising=False)
    labels = np.asarray(
        vad_mod.make_silero_detector(sample_rate, frame_rate, 0.0)(pcm)
    )
    assert np.isfinite(labels).all(), (
        "%d non-finite labels" % int((~np.isfinite(labels)).sum())
    )
    # sanity: it still finds the dialogue (not just a finite constant)
    mid = labels[int(5.5 * sample_rate) : int(8.5 * sample_rate)]
    tail = labels[int(100 * sample_rate) : int(170 * sample_rate)]
    assert mid.mean() > tail.mean() + 0.2


@requires_tpu
def test_compiled_vad_labels_match_jnp_on_device(monkeypatch):
    """End-to-end: the one-launch fused program (compiled kernel) produces
    the same labels as the split jnp path, on the real chip."""
    from ffsubsync_tpu.ops import vad as vad_mod

    frame_rate, sample_rate = 12000, 100
    pcm = _speech_pcm(frame_rate)
    monkeypatch.delenv("FFS_TPU_PALLAS_INTERPRET", raising=False)
    monkeypatch.delenv("FFS_TPU_DISABLE_PALLAS", raising=False)
    compiled = np.asarray(
        vad_mod.make_fused_detector(sample_rate, frame_rate, 0.0)(pcm)
    )
    monkeypatch.setenv("FFS_TPU_DISABLE_PALLAS", "1")
    fallback = np.asarray(
        vad_mod.make_fused_detector(sample_rate, frame_rate, 0.0)(pcm)
    )
    assert len(compiled) == len(fallback)
    # continuous labels; decisions live at 0.5 — µ-law wire + fp reorder
    # keep soft values within a few 1e-2
    agree = np.mean(np.abs(compiled - fallback) < 0.05)
    assert agree > 0.995, "label agreement %.4f" % agree
