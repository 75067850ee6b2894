# -*- coding: utf-8 -*-
"""Native C++ data-plane library: parity with the Python/numpy fallbacks."""
import numpy as np
import pytest

from ffsubsync_tpu import native
from ffsubsync_tpu.ops.vad import _tokenize_validity_py

needs_native = pytest.mark.skipif(
    not native.AVAILABLE, reason="libffs_native.so not built"
)


@needs_native
def test_pcm_conversion_parity():
    rng = np.random.RandomState(0)
    pcm = rng.randint(-32768, 32767, size=100001).astype(np.int16)
    out = native.pcm_s16_to_f32(pcm, 1.0 / 32768.0)
    expected = pcm.astype(np.float32) / 32768.0
    assert np.array_equal(out, expected)


@needs_native
def test_mixdown_parity():
    rng = np.random.RandomState(1)
    frames = rng.randint(-30000, 30000, size=(5000, 2)).astype(np.int16)
    out = native.mix_to_mono_i16(frames)
    # C++ integer division truncates toward zero
    expected = (frames.astype(np.int32).sum(axis=1) / 2).astype(np.int16)
    assert np.array_equal(out, expected)


@needs_native
def test_window_energy_matches_device_kernel():
    import jax.numpy as jnp

    from ffsubsync_tpu.ops.features import window_energies_db

    rng = np.random.RandomState(2)
    pcm = (rng.randn(480 * 100) * 3000).astype(np.int16)
    host = native.window_energy_db(pcm, 480)
    device = np.asarray(window_energies_db(jnp.asarray(pcm), 480))
    assert np.allclose(host, device, atol=1e-3)


@needs_native
@pytest.mark.parametrize("seed", range(8))
def test_tokenizer_native_python_parity(seed):
    rng = np.random.RandomState(seed)
    # bursty validity strings exercise every state transition
    valid = rng.rand(2000) > rng.uniform(0.3, 0.9)
    for min_len, max_len, max_sil in [(20, 500, 25), (3, 8, 2), (1, 1000, 0)]:
        py = _tokenize_validity_py(valid, min_len, max_len, max_sil)
        cpp = native.tokenize(valid, min_len, max_len, max_sil)
        assert cpp == py, (min_len, max_len, max_sil)


def test_fallbacks_work_without_native(monkeypatch):
    monkeypatch.setattr(native, "_lib", None)
    pcm = np.arange(-5, 5, dtype=np.int16)
    out = native.pcm_s16_to_f32(pcm, 2.0)
    assert np.array_equal(out, pcm.astype(np.float32) * 2.0)
    frames = np.array([[2, 4], [10, 20]], np.int16)
    assert np.array_equal(native.mix_to_mono_i16(frames), [3, 15])
