#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Chunk-count sensitivity of the 90-min VAD pipeline (diagnostic).

If per-launch relay round trips dominate (not device compute), total time
scales with the number of pipeline chunks, and a monolithic single launch
(FFS_TPU_PIPELINE_SECONDS=0) wins whenever the PCM is already in memory.

Usage: python scripts/diag_chunks.py [minutes] [runs]
"""
import os
import sys
import time

import numpy as np

import jax

from ffsubsync_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()

from ffsubsync_tpu.constants import SAMPLE_RATE  # noqa: E402
from ffsubsync_tpu.models.synth_data import speech_signal_for_spans  # noqa: E402
from ffsubsync_tpu.ops.features import analysis_rate  # noqa: E402
from ffsubsync_tpu.ops.vad import make_detector  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    frame_rate = analysis_rate(48000, SAMPLE_RATE)
    duration = minutes * 60.0
    log("device:", jax.devices()[0])

    rng = np.random.RandomState(0)
    spans = []
    t = 2.0
    while t < duration - 6.0:
        length = rng.uniform(1.0, 4.0)
        spans.append((t, t + length))
        t += length + rng.uniform(0.8, 4.0)
    wav = speech_signal_for_spans(duration, spans, frame_rate, speech_level=0.35)
    pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)
    del wav

    for seconds in ("0", "2700", "1350", "600", "300"):
        os.environ["FFS_TPU_PIPELINE_SECONDS"] = seconds
        det = make_detector("fused", SAMPLE_RATE, frame_rate, 0.0)
        t0 = time.perf_counter()
        sig = det.gather([det.dispatch_async(pcm)])
        jax.block_until_ready([a for a, _ in sig._parts])
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(runs):
            det2 = make_detector("fused", SAMPLE_RATE, frame_rate, 0.0)
            t0 = time.perf_counter()
            s = det2.gather([det2.dispatch_async(pcm)])
            jax.block_until_ready([a for a, _ in s._parts])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        n_chunks = len(sig._parts)
        log(
            "pipeline_seconds=%s (%d launches): warm %.2f s, best %.3f s, all %s"
            % (seconds, n_chunks, warm, ts[0], [round(x, 3) for x in ts])
        )


if __name__ == "__main__":
    main()
