#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Per-stage breakdown of the 90-min headline bench (diagnostic).

Attributes end-to-end sync time to its pipeline stages, each measured
separately on the real device:

- ``stage_host``: native host staging (decimate + mu-law + frame) per chunk
- ``xfer``: host->device transfer of the staged bytes (device_put + block)
- ``vad_device``: the one-launch VAD program on ALREADY-DEVICE-RESIDENT
  inputs, per --vad mode (webrtc = no net, silero = net only, fused = both;
  webrtc vs fused difference = the neural net's device cost)
- ``align``: the batched candidate search given a device-resident signal
- ``pull``: materializing the labels to host (the one pull)

Run on the real TPU. Timings are best-of-N per stage (relay jitter).

Usage: python scripts/diag_breakdown.py [minutes] [runs]
"""
import sys
import time

import numpy as np

import jax

from ffsubsync_tpu.utils.xla_cache import enable_persistent_cache

enable_persistent_cache()

from ffsubsync_tpu.constants import FRAMERATE_RATIOS, SAMPLE_RATE  # noqa: E402
from ffsubsync_tpu.models.synth_data import speech_signal_for_spans  # noqa: E402
from ffsubsync_tpu.ops.align import align_candidates  # noqa: E402
from ffsubsync_tpu.ops.features import analysis_rate, prepare_staged_input  # noqa: E402
from ffsubsync_tpu.ops.vad import make_detector, _pipeline_chunk_samples  # noqa: E402
from ffsubsync_tpu.subs.raster import RasterSpec  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def best_of(fn, n):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    frame_rate = analysis_rate(48000, SAMPLE_RATE)
    duration = minutes * 60.0
    log("device:", jax.devices()[0], "| analysis rate", frame_rate)

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
    log("%d spans, %d samples (%.1f MB i16)" % (len(spans), len(pcm), pcm.nbytes / 1e6))

    chunk = _pipeline_chunk_samples(frame_rate, SAMPLE_RATE)
    chunks = [pcm[p : p + chunk] for p in range(0, len(pcm), chunk)]
    log("%d pipeline chunks of %d samples" % (len(chunks), chunk))

    # --- stage 1: host staging (native pass), all chunks -------------------
    def do_stage():
        return [prepare_staged_input(c, frame_rate, SAMPLE_RATE) for c in chunks]

    staged = do_stage()  # warm
    ts = best_of(do_stage, runs)
    log("stage_host   best %.3f s  all %s" % (ts[0], [round(x, 3) for x in ts]))
    wire_mb = sum(f.nbytes for f, _, _ in staged) / 1e6
    log("wire bytes: %.1f MB" % wire_mb)

    # --- stage 2: transfer --------------------------------------------------
    def do_xfer():
        bufs = [jax.device_put(f) for f, _, _ in staged]
        jax.block_until_ready(bufs)
        return bufs

    do_xfer()
    ts = best_of(do_xfer, runs)
    log("xfer         best %.3f s  all %s  (%.0f MB/s best)"
        % (ts[0], [round(x, 3) for x in ts], wire_mb / ts[0]))

    # --- stage 3: VAD pipeline per mode (stage + xfer + device compute) ----
    # all modes pay the SAME staging + transfer, so the webrtc-vs-fused
    # difference is the neural net's device cost (XLA DCEs the net under
    # "webrtc"), and silero-vs-fused isolates the spectral kernel's
    for mode in ("webrtc", "silero", "fused"):
        det = make_detector(mode, SAMPLE_RATE, frame_rate, 0.0)
        # warm (also compiles)
        sig = det.gather([det.dispatch_async(pcm)])
        sig.materialize()

        def do_vad():
            s = det.gather([det.dispatch_async(pcm)])
            jax.block_until_ready([a for a, _ in s._parts])
            return s

        ts = best_of(do_vad, runs)
        log("vad[%s] pipeline (stage+xfer+compute) best %.3f s  all %s"
            % (mode, ts[0], [round(x, 3) for x in ts]))

    # --- stage 4: align ------------------------------------------------------
    det = make_detector("fused", SAMPLE_RATE, frame_rate, 0.0)
    signal = det.gather([det.dispatch_async(pcm)])
    true_offset = 7.34
    ratios = [1.0] + FRAMERATE_RATIOS + [1.0 / r for r in FRAMERATE_RATIOS]
    sub_spans = [(a - true_offset, b - true_offset) for a, b in spans]
    n_sub = int((max(b for _, b in sub_spans)) * SAMPLE_RATE) + 2
    candidates = []
    for ratio in ratios:
        starts = np.array([int(round(a * ratio * SAMPLE_RATE)) for a, _ in sub_spans], np.int32)
        ends = np.array([int(round(b * ratio * SAMPLE_RATE)) for _, b in sub_spans], np.int32)
        n = int(n_sub * ratio) + 2
        keep = starts >= 0
        candidates.append(RasterSpec(
            n_samples=n, starts=np.clip(starts[keep], 0, n),
            ends=np.clip(ends[keep], 0, n), weight=min(1.0 / ratio, 1.0),
            max_time=n / SAMPLE_RATE, sample_rate=SAMPLE_RATE,
        ))

    def do_align():
        return align_candidates(signal, candidates, max_offset_samples=60 * SAMPLE_RATE)

    do_align()
    ts = best_of(do_align, runs)
    log("align        best %.3f s  all %s" % (ts[0], [round(x, 3) for x in ts]))

    # --- stage 5: label pull -------------------------------------------------
    def do_pull():
        s = det.gather([det.dispatch_async(pcm)])
        jax.block_until_ready([a for a, _ in s._parts])
        t0 = time.perf_counter()
        s.materialize()
        return time.perf_counter() - t0

    pulls = sorted(do_pull() for _ in range(runs))
    log("pull         best %.3f s  all %s" % (pulls[0], [round(x, 3) for x in pulls]))


if __name__ == "__main__":
    main()
