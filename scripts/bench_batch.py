#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Batch-sync throughput benchmark: N episodes sharded over the device mesh.

BASELINE.json's batch config: 10×45-minute episodes, each with its own
candidate framerate-ratio set, scored in one sharded launch
(parallel/batch.BatchAligner). Each sync is independent — no inter-chip
collectives beyond the final result gather — so throughput should scale
linearly with chips.

Prints ONE JSON line. Env knobs: BENCH_EPISODES (10), BENCH_MINUTES (45),
BENCH_PLATFORM / JAX_PLATFORMS (+ --xla_force_host_platform_device_count for
a virtual mesh).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    platform = os.environ.get("BENCH_PLATFORM")
    if platform:
        os.environ["JAX_PLATFORMS"] = platform
    import jax

    from ffsubsync_tpu.constants import FRAMERATE_RATIOS, SAMPLE_RATE
    from ffsubsync_tpu.parallel.batch import BatchAligner
    from ffsubsync_tpu.subs.raster import RasterSpec
    from ffsubsync_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()
    episodes = int(os.environ.get("BENCH_EPISODES", "10"))
    minutes = float(os.environ.get("BENCH_MINUTES", "45"))
    n = int(minutes * 60 * SAMPLE_RATE)
    ratios = [1.0] + FRAMERATE_RATIOS + [1.0 / r for r in FRAMERATE_RATIOS]
    rng = np.random.RandomState(0)
    log("devices:", jax.devices())

    refs = []
    candidates = []
    true_offsets = []
    for _ in range(episodes):
        # speech occupancy pattern + a known per-episode offset to recover
        sig = np.zeros(n, np.float32)
        t = 200
        spans = []
        while t < n - 600:
            length = rng.randint(100, 400)
            sig[t : t + length] = 1.0
            spans.append((t, t + length))
            t += length + rng.randint(80, 400)
        off = int(rng.randint(-3000, 3000))
        true_offsets.append(off)
        specs = []
        for ratio in ratios:
            starts = np.array(
                [max(0, int(round((a - off) * ratio))) for a, _ in spans],
                np.int32,
            )
            ends = np.array(
                [max(0, int(round((b - off) * ratio))) for _, b in spans],
                np.int32,
            )
            specs.append(
                RasterSpec(
                    n_samples=int(n * ratio) + 2,
                    starts=starts,
                    ends=ends,
                    weight=min(1.0 / ratio, 1.0),
                    max_time=n / float(SAMPLE_RATE),
                    sample_rate=SAMPLE_RATE,
                )
            )
        refs.append(sig)
        candidates.append(specs)

    aligner = BatchAligner()
    n_chips = aligner.mesh.devices.size

    def run_once():
        return aligner.align_batch(
            refs, candidates, max_offset_samples=60 * SAMPLE_RATE
        )

    log("warmup (compile)...")
    t0 = time.perf_counter()
    results = run_once()
    log("warmup took %.2f s" % (time.perf_counter() - t0))
    run_times = []
    for i in range(int(os.environ.get("BENCH_RUNS", "3"))):
        t0 = time.perf_counter()
        results = run_once()
        run_s = time.perf_counter() - t0
        log("run %d: %.3f s" % (i, run_s))
        run_times.append(run_s)
    run_times.sort()
    elapsed = run_times[0]

    errs = []
    for i in range(episodes):
        best = max(results[i], key=lambda a: a.score)
        errs.append(abs(best.offset - true_offsets[i]))
    log("offset errors (samples):", errs)
    ok = max(errs) <= 1
    syncs_per_sec_chip = episodes / elapsed / n_chips
    # baseline: the reference syncs serially at ~25 s/episode on one CPU
    vs_baseline = (episodes / elapsed) / (episodes / (25.0 * episodes))
    print(
        json.dumps(
            {
                "metric": "45min_batch_syncs_per_sec_per_chip",
                "value": round(syncs_per_sec_chip, 4),
                "unit": "syncs/sec/chip",
                "vs_baseline": round(vs_baseline, 2),
                "offsets_exact": bool(ok),
                "timing": "best-of-%d" % len(run_times),
                "best_s": round(run_times[0], 3),
                "median_s": round(run_times[len(run_times) // 2], 3),
                "worst_s": round(run_times[-1], 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
