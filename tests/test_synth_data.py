# -*- coding: utf-8 -*-
"""Training/eval data generator contracts (models/synth_data, models/eval_data).

The generators back the in-tree neural VAD (the reference instead downloads
pretrained silero weights, ffsubsync/speech_transformers.py:205-210); these
tests pin the API shape and statistical sanity, not the audio itself.
"""
import numpy as np

from ffsubsync_tpu.models.synth_data import (
    _negative_mode,
    _pulse_train_vowels,
    synth_batch,
    synth_nonspeech,
    synth_speech,
)

FRAME_RATE = 12000
SAMPLE_RATE = 100


def test_synth_batch_shapes_and_weights():
    rng = np.random.RandomState(0)
    pcm, labels, weights = synth_batch(
        rng, 6, 4.0, FRAME_RATE, SAMPLE_RATE, return_weights=True
    )
    assert pcm.shape == (6, 4 * FRAME_RATE)
    assert labels.shape == (6, 4 * SAMPLE_RATE)
    assert weights.shape == (6,)
    assert pcm.dtype == np.int16
    assert set(np.unique(labels)) <= {0.0, 1.0}
    assert (weights >= 1.0).all()
    # legacy two-tuple signature still works
    pcm2, labels2 = synth_batch(rng, 2, 2.0, FRAME_RATE, SAMPLE_RATE)
    assert pcm2.shape == (2, 2 * FRAME_RATE) and labels2.shape == (2, 200)


def test_negative_clips_upweighted():
    """Hard clips carry extra loss weight: babble/laughter negatives (2.5),
    moving-spectrum music (2.0), note-onset music (1.5), and interlude
    speech/bed boundary clips (2.0). Speech clips never draw the
    adversarial-negative weights."""
    rng = np.random.RandomState(1)
    pcm, labels, weights = synth_batch(
        rng, 64, 1.0, FRAME_RATE, SAMPLE_RATE, return_weights=True
    )
    speechy = labels.max(axis=1) > 0
    # speechy clips: baseline, hard-SNR boost, or interlude boundary weight
    assert set(np.unique(weights[speechy])) <= {1.0, 1.75, 2.0}
    assert set(np.unique(weights[~speechy])) <= {1.0, 1.5, 2.0, 2.5}
    assert (weights > 1.0).any()  # some hard clips drew


def test_negative_mode_distribution():
    """Voiced adversarial classes dominate the negative stream."""
    rng = np.random.RandomState(2)
    modes = np.array([_negative_mode(rng) for _ in range(2000)])
    frac_babble_laughter = np.mean((modes == 6) | (modes == 7))
    assert 0.4 < frac_babble_laughter < 0.6
    assert set(np.unique(modes)) <= set(range(8))


def test_speech_modes_finite_and_active():
    rng = np.random.RandomState(3)
    n = 3 * FRAME_RATE
    for _ in range(10):  # covers all five modes with high probability
        x, active = synth_speech(rng, n, FRAME_RATE)
        assert np.isfinite(x).all()
        assert active.shape == (n,)
        assert active.max() == 1.0
    v = _pulse_train_vowels(rng, n, FRAME_RATE)
    assert np.isfinite(v).all() and np.abs(v).max() <= 1.0 + 1e-6


def test_nonspeech_modes_all_finite():
    rng = np.random.RandomState(4)
    n = 2 * FRAME_RATE
    for mode in range(8):
        x = synth_nonspeech(rng, n, FRAME_RATE, mode=mode)
        assert x.shape == (n,)
        assert np.isfinite(x).all()


def test_eval_conditions_disjoint_api():
    """Every eval condition yields (pcm, labels) at the analysis grid."""
    from ffsubsync_tpu.models.eval_data import CONDITIONS, condition_clips

    rng_seed = 5
    for name in CONDITIONS:
        clips = condition_clips(name, 1, 3.0, FRAME_RATE, SAMPLE_RATE, seed=rng_seed)
        pcm, labels, mask = clips[0]
        assert len(pcm) == 3 * FRAME_RATE
        assert len(labels) == 3 * SAMPLE_RATE
        assert len(mask) == len(labels) and mask.dtype == bool
        assert np.isfinite(pcm).all()
