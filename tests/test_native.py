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


def test_frame_for_device_matches_numpy_fallback():
    """C++ encode+frame is bit-exact vs the numpy construction (incl. µ-law
    round-half-even) and zero-fills pad columns/tail windows."""
    import numpy as np
    from ffsubsync_tpu import native
    from ffsubsync_tpu.ops.pallas.frontend import mulaw_encode_host

    rng = np.random.RandomState(0)
    pcm = (rng.randn(10_000) * 8000).clip(-32768, 32767).astype(np.int16)
    window, wpad, t_pad = 80, 128, 256
    for mulaw in (True, False):
        got = native.frame_for_device(pcm, window, wpad, t_pad, mulaw)
        dtype = np.int8 if mulaw else np.int16
        flat = np.zeros(t_pad * window, dtype)
        flat[: len(pcm)] = mulaw_encode_host(pcm) if mulaw else pcm
        want = np.zeros((t_pad, wpad), dtype)
        want[:, :window] = flat.reshape(t_pad, window)
        assert np.array_equal(got, want)


def test_decimate2_cpp_matches_numpy():
    """Half-band decimator: C++ and numpy paths are bit-exact; spectral
    content below the mel ceiling survives."""
    import numpy as np
    import ffsubsync_tpu.native as native

    rng = np.random.RandomState(0)
    pcm = (rng.randn(48_000) * 8000).clip(-32768, 32767).astype(np.int16)

    got = native.decimate2(pcm)
    assert len(got) == 24_000
    # force the numpy fallback and compare bit-exactly
    lib, native._lib = native._lib, None
    try:
        want = native.decimate2(pcm)
    finally:
        native._lib = lib
    if lib is not None:
        assert np.array_equal(got, want)

    # a 1 kHz tone at 48 kHz keeps its amplitude through the decimator
    t = np.arange(48_000) / 48_000.0
    tone = (10_000 * np.sin(2 * np.pi * 1000 * t)).astype(np.int16)
    dec = native.decimate2(tone).astype(np.float64)
    ratio = dec[100:-100].std() / tone.astype(np.float64)[100:-100].std()
    assert abs(ratio - 1.0) < 0.02


def test_analysis_rate_policy(monkeypatch):
    from ffsubsync_tpu.ops.features import analysis_rate

    assert analysis_rate(48000, 100) == 12000  # /4: zero lane-pad waste
    assert analysis_rate(44100, 100) == 44100  # 22050 not divisible by 100
    assert analysis_rate(32000, 100) == 16000  # /2; /4 would be < 12 kHz
    assert analysis_rate(16000, 100) == 16000  # 8000 < 12 kHz floor
    assert analysis_rate(8000, 100) == 8000
    monkeypatch.setenv("FFS_TPU_ANALYSIS_DECIMATE", "0")
    assert analysis_rate(48000, 100) == 48000


def test_compute_frontend_window_count_invariant_under_decimation():
    """Decimation must not change the 100 Hz window grid."""
    import numpy as np
    from ffsubsync_tpu.ops.features import compute_frontend

    rng = np.random.RandomState(1)
    for n in (480 * 300, 480 * 300 + 1, 480 * 300 + 479):
        pcm = (rng.randn(n) * 3000).astype(np.int16)
        *_, nw = compute_frontend(pcm, 48000, 100)
        assert nw == -(-n // 480)
