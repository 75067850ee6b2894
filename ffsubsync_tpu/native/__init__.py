# -*- coding: utf-8 -*-
"""ctypes bindings for the native host data-plane library (libffs_native.so).

Every entry point has a numpy fallback, so the package works without the
compiled library; with it, the host side of the decode path (PCM conversion,
mono mixdown, the energy tokenizer's sequential state machine) runs in C++.
Build with ``make -C native`` from the repo root.
"""
import ctypes
import logging
import os
from typing import List, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libffs_native.so")


def _try_autobuild() -> None:
    """Build libffs_native.so from source on first import if a toolchain is
    present (the binary is machine-specific and not committed)."""
    if os.environ.get("FFS_TPU_AUTO_BUILD_NATIVE") == "0":
        return
    src = os.path.join(
        os.path.dirname(__file__), "..", "..", "native", "ffs_native.cpp"
    )
    if not os.path.exists(src):
        return
    import shutil
    import subprocess

    cxx = shutil.which("g++") or shutil.which("clang++")
    if cxx is None:
        return
    try:
        subprocess.run(
            [cxx, "-O3", "-march=native", "-fPIC", "-std=c++17", "-shared",
             "-o", _LIB_PATH, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        logger.info("built native library at %s", _LIB_PATH)
    except Exception as e:
        logger.debug("native library autobuild failed: %s", e)


if not os.path.exists(_LIB_PATH):
    _try_autobuild()

_lib = None
if os.path.exists(_LIB_PATH):
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.ffs_pcm_s16_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_float,
        ]
        _lib.ffs_pcm_s16_to_f32.restype = None
        _lib.ffs_mix_to_mono_i16.argtypes = [
            ctypes.POINTER(ctypes.c_int16),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16),
        ]
        _lib.ffs_mix_to_mono_i16.restype = None
        _lib.ffs_window_energy_db.argtypes = [
            ctypes.POINTER(ctypes.c_int16),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib.ffs_window_energy_db.restype = ctypes.c_int64
        _lib.ffs_tokenize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        _lib.ffs_tokenize.restype = ctypes.c_int64
        if getattr(_lib, "ffs_decimate2_i16", None) is not None:
            _lib.ffs_decimate2_i16.argtypes = [
                ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int16),
            ]
            _lib.ffs_decimate2_i16.restype = ctypes.c_int64
        if getattr(_lib, "ffs_stage_i8", None) is not None:
            _lib.ffs_stage_i8.argtypes = [
                ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int8),
            ]
            _lib.ffs_stage_i8.restype = None
        if getattr(_lib, "ffs_stage_p6", None) is not None:
            _lib.ffs_stage_p6.argtypes = [
                ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            _lib.ffs_stage_p6.restype = None
        for name, elem in (("ffs_mulaw_frame_i8", ctypes.c_int8),
                           ("ffs_frame_i16", ctypes.c_int16)):
            fn = getattr(_lib, name, None)
            if fn is None:  # stale library built from older sources
                continue
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int64,
                ctypes.POINTER(elem),
            ]
            fn.restype = None
    except OSError as e:  # pragma: no cover
        logger.warning("failed to load native library: %s", e)
        _lib = None

AVAILABLE = _lib is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def pcm_s16_to_f32(pcm: np.ndarray, scale: float = 1.0) -> np.ndarray:
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    if _lib is None:
        return pcm.astype(np.float32) * scale
    out = np.empty(len(pcm), np.float32)
    _lib.ffs_pcm_s16_to_f32(
        _ptr(pcm, ctypes.c_int16), _ptr(out, ctypes.c_float), len(pcm), scale
    )
    return out


def mix_to_mono_i16(frames: np.ndarray) -> np.ndarray:
    """[frames, channels] int16 → mono int16 (mean of channels)."""
    frames = np.ascontiguousarray(frames, dtype=np.int16)
    if frames.ndim == 1:
        return frames
    n, channels = frames.shape
    if _lib is None:
        # truncate toward zero, matching C++ integer division
        return (
            frames.astype(np.int32).sum(axis=1) / channels
        ).astype(np.int16)
    out = np.empty(n, np.int16)
    _lib.ffs_mix_to_mono_i16(
        _ptr(frames, ctypes.c_int16), n, channels, _ptr(out, ctypes.c_int16)
    )
    return out


def window_energy_db(pcm: np.ndarray, window: int) -> np.ndarray:
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    n_windows = -(-len(pcm) // window)
    if _lib is None:
        padded = np.zeros(n_windows * window, np.float64)
        padded[: len(pcm)] = pcm.astype(np.float64)
        frames = padded.reshape(n_windows, window)
        # fallback divides by the full window; the native path divides by the
        # true tail length (matches the device kernel's padded semantics)
        power = np.maximum((frames**2).mean(axis=1), 1e-10)
        return (10.0 * np.log10(power)).astype(np.float32)
    out = np.empty(n_windows, np.float32)
    _lib.ffs_window_energy_db(
        _ptr(pcm, ctypes.c_int16), len(pcm), window, _ptr(out, ctypes.c_float)
    )
    return out


# 23-tap Q15 half-band decimator taps (offset, coefficient); kept in sync
# with kHalfband* in native/ffs_native.cpp
_HALFBAND = ((0, 16418), (1, 10259), (3, -2931), (5, 1266), (7, -521),
             (9, 178), (11, -76))


def decimate2(pcm: np.ndarray) -> np.ndarray:
    """Half-band decimate int16 PCM by 2 (bit-exact C++/numpy parity)."""
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    n = len(pcm)
    n_out = (n + 1) // 2
    if _lib is not None and getattr(_lib, "ffs_decimate2_i16", None) is not None:
        out = np.empty(n_out, np.int16)
        _lib.ffs_decimate2_i16(_ptr(pcm, ctypes.c_int16), n,
                               _ptr(out, ctypes.c_int16))
        return out
    x = pcm.astype(np.int64)
    centers = np.arange(n_out) * 2
    acc = _HALFBAND[0][1] * x[centers]
    for off, tap in _HALFBAND[1:]:
        lo = centers - off
        hi = centers + off
        xlo = np.where(lo >= 0, x[np.maximum(lo, 0)], 0)
        xhi = np.where(hi < n, x[np.minimum(hi, n - 1)], 0)
        acc += tap * (xlo + xhi)
    return np.clip(acc >> 15, -32768, 32767).astype(np.int16)


def stage_for_device(
    pcm: np.ndarray, decim_stages: int, window: int, wpad: int, t_pad: int
) -> np.ndarray:
    """Half-band decimate ``decim_stages`` times, µ-law encode, and frame —
    all in one native pass over the raw PCM (this host is memory-bandwidth
    bound; separate passes each re-touch hundreds of MB). Bit-exact vs
    composing :func:`decimate2` then :func:`frame_for_device`."""
    pcm = np.asarray(pcm)
    if pcm.dtype != np.int16:
        pcm = pcm.astype(np.int16)
    pcm = np.ascontiguousarray(pcm)
    if _lib is not None and getattr(_lib, "ffs_stage_i8", None) is not None:
        out = np.empty((t_pad, wpad), np.int8)
        _lib.ffs_stage_i8(
            _ptr(pcm, ctypes.c_int16),
            len(pcm),
            decim_stages,
            window,
            wpad,
            t_pad,
            _ptr(out, ctypes.c_int8),
        )
        return out
    for _ in range(decim_stages):
        pcm = decimate2(pcm)
    return frame_for_device(pcm, window, wpad, t_pad, mulaw=True)


def mulaw6_encode_host(pcm_i16: np.ndarray) -> np.ndarray:
    """Vectorized 6-bit µ-law encode int16 → biased uint8 codes in [0, 62].

    Same compander as :func:`ops.pallas.frontend.mulaw_encode_host`,
    quantized to 31 levels per sign and biased by +31 (signed 0 → 31)."""
    x = pcm_i16.astype(np.float32) / 32768.0
    y = np.sign(x) * np.log1p(255.0 * np.abs(x)) / np.log1p(255.0)
    return (np.round(y * 31.0) + 31.0).astype(np.uint8)


def pack6(codes_u8: np.ndarray) -> np.ndarray:
    """Pack biased 6-bit codes [..., 4k] → bytes [..., 3k] (4 codes → 3)."""
    u = codes_u8.astype(np.uint32).reshape(codes_u8.shape[:-1] + (-1, 4))
    b0 = (u[..., 0] << 2) | (u[..., 1] >> 4)
    b1 = ((u[..., 1] & 15) << 4) | (u[..., 2] >> 2)
    b2 = ((u[..., 2] & 3) << 6) | u[..., 3]
    out = np.stack([b0, b1, b2], axis=-1).astype(np.uint8)
    return out.reshape(codes_u8.shape[:-1] + (-1,))


def stage_for_device_p6(
    pcm: np.ndarray, decim_stages: int, window: int, t_pad: int
) -> np.ndarray:
    """6-bit µ-law wire staging: decimate + encode + pack + frame in one
    native pass → ``[t_pad, window*3//4]`` int8 (bit patterns; decode with
    :func:`ops.pallas.frontend.unpack_mulaw6` on device). 25% fewer bytes
    than the 8-bit wire over the host→device link. Padding rows/tails hold
    the packed silence pattern (biased code 31), never zero bytes."""
    if window % 4 != 0:
        raise ValueError("mulaw6 wire needs window %% 4 == 0, got %d" % window)
    row_bytes = window * 3 // 4
    pcm = np.asarray(pcm)
    if pcm.dtype != np.int16:
        pcm = pcm.astype(np.int16)
    pcm = np.ascontiguousarray(pcm)
    if _lib is not None and getattr(_lib, "ffs_stage_p6", None) is not None:
        out = np.empty((t_pad, row_bytes), np.uint8)
        _lib.ffs_stage_p6(
            _ptr(pcm, ctypes.c_int16),
            len(pcm),
            decim_stages,
            window,
            row_bytes,
            t_pad,
            _ptr(out, ctypes.c_uint8),
        )
        return out.view(np.int8)
    for _ in range(decim_stages):
        pcm = decimate2(pcm)
    codes = np.full(t_pad * window, 31, np.uint8)
    codes[: len(pcm)] = mulaw6_encode_host(pcm)
    return pack6(codes.reshape(t_pad, window)).view(np.int8)


def frame_for_device(
    pcm: np.ndarray, window: int, wpad: int, t_pad: int, mulaw: bool
) -> np.ndarray:
    """Encode (µ-law, optionally) + frame PCM into the ``[t_pad, wpad]``
    lane-aligned layout the frontend kernel reads, in one native pass."""
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    native_fn = None
    if _lib is not None:
        native_fn = getattr(
            _lib, "ffs_mulaw_frame_i8" if mulaw else "ffs_frame_i16", None
        )
    if native_fn is None:
        from ffsubsync_tpu.ops.pallas.frontend import mulaw_encode_host

        dtype = np.int8 if mulaw else np.int16
        flat = np.zeros(t_pad * window, dtype)
        flat[: len(pcm)] = mulaw_encode_host(pcm) if mulaw else pcm
        framed = np.zeros((t_pad, wpad), dtype)
        framed[:, :window] = flat.reshape(t_pad, window)
        return framed
    out = np.empty((t_pad, wpad), np.int8 if mulaw else np.int16)
    native_fn(
        _ptr(pcm, ctypes.c_int16),
        len(pcm),
        window,
        wpad,
        t_pad,
        _ptr(out, ctypes.c_int8 if mulaw else ctypes.c_int16),
    )
    return out


def tokenize(
    valid: np.ndarray, min_length: int, max_length: int, max_silence: int
) -> List[Tuple[int, int]]:
    """Native auditok-class tokenizer; falls back to the Python state machine."""
    if _lib is None:
        from ffsubsync_tpu.ops.vad import _tokenize_validity_py

        return _tokenize_validity_py(valid, min_length, max_length, max_silence)
    valid_u8 = np.ascontiguousarray(np.asarray(valid, dtype=bool), dtype=np.uint8)
    cap = max(1, len(valid_u8))
    starts = np.empty(cap, np.int64)
    ends = np.empty(cap, np.int64)
    count = _lib.ffs_tokenize(
        _ptr(valid_u8, ctypes.c_uint8),
        len(valid_u8),
        min_length,
        max_length,
        max_silence,
        _ptr(starts, ctypes.c_int64),
        _ptr(ends, ctypes.c_int64),
        cap,
    )
    return [(int(starts[i]), int(ends[i])) for i in range(count)]
