#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Benchmark every declared BASELINE.json config that bench.py/bench_batch.py
don't already cover, through the REAL CLI entry point (``sync.run``):

  srt_srt        srt<->srt sync (host-side align, never touches the device)
  wav5_energy    5-min WAV reference + auditok-class energy VAD
  multiseg       --multi-segment-sync: 8 sampled segments across a 2-h WAV

Each config reports best/median/worst wall seconds over BENCH_RUNS runs
(default 3) plus the recovered-offset error. Prints ONE JSON line with all
configs. The 90-min headline lives in bench.py; the 10x45-min batch figure in
scripts/bench_batch.py.

Reference envelope being compared against: "usually finishes in 20 to 30
seconds" per movie, srt<->srt "typically runs in less than a second"
(reference README.md:209-214).
"""
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _spans(rng, duration, lo=1.0, hi=4.0, gap_lo=0.8, gap_hi=4.0, t0=2.0):
    spans = []
    t = t0
    while t < duration - 6.0:
        length = rng.uniform(lo, hi)
        spans.append((t, t + length))
        t += length + rng.uniform(gap_lo, gap_hi)
    return spans


def _timed_runs(n_runs, fn):
    times = []
    err_ms = None
    for i in range(n_runs):
        t0 = time.perf_counter()
        result = fn()
        times.append(time.perf_counter() - t0)
        if result.get("offset_seconds") is not None:
            err_ms = result["err_ms"]
        log("  run %d: %.3f s (err %s ms)" % (i, times[-1], err_ms))
    times.sort()
    return {
        "best_s": round(times[0], 3),
        "median_s": round(times[len(times) // 2], 3),
        "worst_s": round(times[-1], 3),
        "offset_err_ms": None if err_ms is None else round(err_ms, 1),
    }


def main() -> int:
    platform = os.environ.get("BENCH_PLATFORM")
    if platform:
        os.environ["JAX_PLATFORMS"] = platform

    from ffsubsync_tpu.cli import make_parser
    from ffsubsync_tpu.models.synth_data import speech_signal_for_spans
    from ffsubsync_tpu.sync import run as sync_run
    from ffsubsync_tpu.utils.fixtures import write_srt_spans, write_wav_i16
    from ffsubsync_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()
    n_runs = int(os.environ.get("BENCH_RUNS", "3"))
    true_offset = 4.27  # seconds the subtitles fire early
    report = {}
    tmpdir = tempfile.mkdtemp(prefix="ffs_suite_")
    try:
        rng = np.random.RandomState(0)

        def cli_case(argv):
            args = make_parser().parse_args(argv)
            result = sync_run(args)
            if result.get("offset_seconds") is not None:
                result["err_ms"] = (
                    abs(result["offset_seconds"] - true_offset) * 1000.0
                )
            return result

        # --- srt<->srt (pure host-side alignment) -------------------------
        ref_srt = os.path.join(tmpdir, "ref.srt")
        in_srt = os.path.join(tmpdir, "in.srt")
        out_srt = os.path.join(tmpdir, "out.srt")
        spans = _spans(rng, 45 * 60.0)
        write_srt_spans(ref_srt, spans)
        write_srt_spans(
            in_srt, [(a - true_offset, b - true_offset) for a, b in spans]
        )
        log("srt_srt (45-min cue list)...")
        report["srt_srt"] = _timed_runs(
            n_runs,
            lambda: cli_case([ref_srt, "-i", in_srt, "-o", out_srt]),
        )

        # --- 5-min WAV + energy VAD ---------------------------------------
        frame_rate = 12000  # native-read window-compatible analysis rate
        duration = 5 * 60.0
        spans5 = _spans(rng, duration)
        wav5 = os.path.join(tmpdir, "five.wav")
        pcm = np.clip(
            speech_signal_for_spans(duration, spans5, frame_rate, speech_level=0.35)
            * 32767,
            -32768,
            32767,
        ).astype(np.int16)
        write_wav_i16(wav5, pcm, frame_rate)
        in5 = os.path.join(tmpdir, "five.srt")
        write_srt_spans(
            in5, [(a - true_offset, b - true_offset) for a, b in spans5]
        )
        log("wav5_energy (5-min WAV, auditok-class energy VAD)...")
        report["wav5_energy"] = _timed_runs(
            n_runs,
            lambda: cli_case(
                [wav5, "-i", in5, "-o", out_srt, "--vad", "auditok"]
            ),
        )

        # --- multi-segment over 2 h ---------------------------------------
        duration2 = 2 * 3600.0
        spans2 = _spans(rng, duration2)
        wav2 = os.path.join(tmpdir, "movie2h.wav")
        pcm2 = np.clip(
            speech_signal_for_spans(duration2, spans2, frame_rate, speech_level=0.35)
            * 32767,
            -32768,
            32767,
        ).astype(np.int16)
        write_wav_i16(wav2, pcm2, frame_rate)
        del pcm2
        in2 = os.path.join(tmpdir, "movie2h.srt")
        write_srt_spans(
            in2, [(a - true_offset, b - true_offset) for a, b in spans2]
        )
        log("multiseg (8 segments across 2-h WAV)...")
        report["multiseg"] = _timed_runs(
            n_runs,
            lambda: cli_case(
                [
                    wav2,
                    "-i",
                    in2,
                    "-o",
                    out_srt,
                    "--multi-segment-sync",
                    "--segment-count",
                    "8",
                ]
            ),
        )
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)

    import jax

    print(
        json.dumps(
            {
                "metric": "config_suite_wall_seconds",
                "unit": "s",
                "timing": "best-of-%d" % n_runs,
                "platform": jax.default_backend(),
                **report,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
