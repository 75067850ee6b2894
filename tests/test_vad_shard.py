# -*- coding: utf-8 -*-
"""Sequence-parallel VAD (parallel/vad_shard.py) vs the monolithic program.

Runs on the virtual 8-device CPU mesh (tests/conftest.py): the whole fused
VAD of one signal sharded over a ``time`` mesh axis must reproduce the
single-device ``_vad_program`` (fresh state, single chunk) — the cross-chip
scan prefixes, the psum normalization, and the ppermute context halos are
all exact restatements of the monolithic math.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ffsubsync_tpu.models.neural_vad import CONTEXT, N_MELS, NeuralVAD
from ffsubsync_tpu.models.synth_data import speech_signal_for_spans
from ffsubsync_tpu.ops import vad as V
from ffsubsync_tpu.ops.features import prepare_staged_input
from ffsubsync_tpu.parallel.vad_shard import make_sharded_detector


def _monolithic_labels(pcm, mode, frame_rate, sample_rate, nsl):
    framed, mats, n_windows = prepare_staged_input(pcm, frame_rate, sample_rate)
    params = NeuralVAD.load_default(
        frame_rate=frame_rate, sample_rate=sample_rate
    ).params
    labels, *_ = V._vad_program(
        jnp.asarray(framed),
        mats.dft_mel,
        mats.dft_plain,
        mats.mel_fb,
        mats.band_sel,
        jnp.zeros((CONTEXT, N_MELS), jnp.float32),
        jnp.int32(0),
        jnp.int32(n_windows),
        jnp.full((V._N_BANDS,), jnp.inf, jnp.float32),
        jnp.full((V._N_BANDS,), jnp.inf, jnp.float32),
        jnp.full((N_MELS,), jnp.inf, jnp.float32),
        jnp.zeros((V._FLUX_BOX_K, 2), jnp.float32),
        jnp.int32(0),
        jnp.zeros((V._SYL_LOOKBACK,), jnp.float32),
        jnp.int32(0),
        params,
        jnp.float32(nsl),
        mats.window,
        mats.wpad,
        mode,
        True,  # interpret (CPU)
    )
    return np.asarray(labels, np.float64)[:n_windows]


@pytest.mark.parametrize("mode", ["webrtc", "silero", "weighted"])
def test_sharded_vad_matches_monolithic(mode, monkeypatch):
    monkeypatch.setenv("FFS_TPU_PALLAS_INTERPRET", "1")
    frame_rate, sample_rate, nsl = 8000, 100, 0.0
    spans = [(3.0, 6.5), (12.0, 17.0), (25.0, 29.0), (40.0, 44.0), (55.0, 58.0)]
    wav = speech_signal_for_spans(64.0, spans, frame_rate, speech_level=0.35)
    pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)

    mesh = Mesh(np.array(jax.devices()), ("time",))
    detect = make_sharded_detector(mesh, mode, sample_rate, frame_rate, nsl)
    sharded = np.asarray(detect(pcm))
    mono = _monolithic_labels(pcm, mode, frame_rate, sample_rate, nsl)
    assert sharded.shape == mono.shape
    # float drift from reduction-order differences (psum vs single-device
    # sums, cross-chip affine composition) shifts continuous probabilities
    # by ~1e-3 in soft regions; the decision scale is 0.5, so 0.02 is
    # still a *tight* equivalence bound
    agree = np.mean(np.abs(sharded - mono) < 0.02)
    assert agree > 0.999, "label agreement %.4f" % agree
    assert np.abs(sharded - mono).max() < 0.05


def test_sharded_vad_alignment_end_to_end(monkeypatch):
    """The sharded signal must drive the aligner to the same offset."""
    monkeypatch.setenv("FFS_TPU_PALLAS_INTERPRET", "1")
    from ffsubsync_tpu.ops.align import align_candidates
    from ffsubsync_tpu.subs.raster import rasterize_intervals

    frame_rate = 8000
    spans = [(2.0, 5.0), (9.0, 13.0), (20.0, 24.0), (33.0, 37.0)]
    wav = speech_signal_for_spans(42.0, spans, frame_rate, speech_level=0.35)
    pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)
    mesh = Mesh(np.array(jax.devices()), ("time",))
    detect = make_sharded_detector(mesh, "weighted", 100, frame_rate, 0.0)
    signal = detect(pcm)  # stays lazy on device; the aligner reads it there
    shift = 1.75
    cand = rasterize_intervals([(a - shift, b - shift) for a, b in spans], 100)
    result = align_candidates(signal, [cand], max_offset_samples=500)[0]
    # the detector's hangover extends span tails asymmetrically, which can
    # move the correlation argmax by one 10 ms window
    assert abs(result.offset - int(shift * 100)) <= 1


def test_sp_vad_product_wiring(tmp_path, monkeypatch):
    """FFS_TPU_SP_VAD=1 routes the buffered audio path through the
    sequence-parallel detector; the sync result must match the normal
    single-chip pipeline."""
    monkeypatch.setenv("FFS_TPU_PALLAS_INTERPRET", "1")
    from ffsubsync_tpu.media.audio import VideoSpeechSource
    from tests.helpers import write_wav

    frame_rate = 8000
    spans = [(2.0, 5.0), (9.0, 12.0), (18.0, 22.0)]
    wav = speech_signal_for_spans(26.0, spans, frame_rate, speech_level=0.35)
    path = str(tmp_path / "m.wav")
    write_wav(path, wav, frame_rate)

    def fit(sp):
        if sp:
            monkeypatch.setenv("FFS_TPU_SP_VAD", "1")
        else:
            monkeypatch.delenv("FFS_TPU_SP_VAD", raising=False)
        src = VideoSpeechSource(
            vad="fused", sample_rate=100, frame_rate=frame_rate,
            non_speech_label=0.0,
        )
        src.fit(path)
        return np.asarray(src.transform())

    normal = fit(False)
    sharded = fit(True)
    assert normal.shape == sharded.shape
    agree = np.mean(np.abs(normal - sharded) < 1e-2)
    assert agree > 0.99, agree


def test_sharded_vad_odd_mesh_size(monkeypatch):
    """Non-power-of-two meshes (3 devices) must still match the monolithic
    program — exercises uneven padding and the D-element prefix scan."""
    monkeypatch.setenv("FFS_TPU_PALLAS_INTERPRET", "1")
    frame_rate = 8000
    spans = [(2.0, 4.0), (8.0, 11.0), (16.0, 19.0)]
    wav = speech_signal_for_spans(23.0, spans, frame_rate, speech_level=0.35)
    pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)
    mesh = Mesh(np.array(jax.devices()[:3]), ("time",))
    detect = make_sharded_detector(mesh, "weighted", 100, frame_rate, 0.0)
    sharded = np.asarray(detect(pcm))
    mono = _monolithic_labels(pcm, "weighted", frame_rate, 100, 0.0)
    agree = np.mean(np.abs(sharded - mono) < 0.02)
    assert agree > 0.999, "label agreement %.4f" % agree
    assert np.abs(sharded - mono).max() < 0.05
