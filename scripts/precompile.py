#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Ahead-of-time warm the persistent XLA kernel cache.

Compiles every device program the sync pipeline needs for a given reference
duration (frontend kernel, spectral + neural VAD, alignment search) and
stores the executables in the persistent cache
(utils/xla_cache.enable_persistent_cache), so production processes start
with zero compile latency. Useful after deploying a new build or before
benchmarking.

Usage: python scripts/precompile.py [minutes ...]   (default: 90)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def warm(minutes: float) -> None:
    import numpy as np

    from ffsubsync_tpu.constants import FRAMERATE_RATIOS, SAMPLE_RATE
    from ffsubsync_tpu.ops.align import align_candidates
    from ffsubsync_tpu.ops.vad import make_detector
    from ffsubsync_tpu.subs.raster import RasterSpec

    frame_rate = 48000
    window = frame_rate // SAMPLE_RATE
    n_windows = int(minutes * 60 * SAMPLE_RATE)
    rng = np.random.RandomState(0)
    pcm = (rng.randn(n_windows * window) * 2000).astype(np.int16)

    # warm the REAL production programs: each --vad mode's detector is one
    # compiled device program per bucketed shape
    signal = None
    for vad in ("fused", "webrtc", "silero", "auditok"):
        t0 = time.perf_counter()
        det = make_detector(vad, SAMPLE_RATE, frame_rate, 0.0)
        # the production path keeps labels on device (LazySpeechSignal)
        out = det.gather([det.dispatch_async(pcm)])
        if vad == "fused":
            # align below must see the UNmaterialized signal so the
            # device-compact program compiles at the alignment FFT
            # length (the shape the bench's hot path hits)
            signal = out
        else:
            out.materialize()
        log("  vad %s: %.1f s" % (vad, time.perf_counter() - t0))

    t0 = time.perf_counter()
    if signal is None:
        signal = (rng.rand(n_windows) > 0.8).astype(np.float64)
    cands = []
    for ratio in [1.0] + FRAMERATE_RATIOS + [1.0 / r for r in FRAMERATE_RATIOS]:
        starts = np.sort(
            rng.randint(0, n_windows - 500, size=1024).astype(np.int32)
        )
        cands.append(
            RasterSpec(
                n_samples=int(n_windows * ratio) + 2,
                starts=starts,
                ends=(starts + 150).astype(np.int32),
                weight=min(1.0 / ratio, 1.0),
                max_time=n_windows / float(SAMPLE_RATE),
                sample_rate=SAMPLE_RATE,
            )
        )
    align_candidates(signal, cands, max_offset_samples=60 * SAMPLE_RATE)
    if hasattr(signal, "materialize"):
        signal.materialize()  # warm the bucket-length compact + pull too
    log("  align: %.1f s" % (time.perf_counter() - t0))


def main() -> int:
    from ffsubsync_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()
    minutes = [float(m) for m in sys.argv[1:]] or [90.0]
    for m in minutes:
        log("warming %.0f-minute pipeline..." % m)
        warm(m)
    log("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
