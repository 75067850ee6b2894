#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Reproducible protocol for the webrtc-class music-scenario offset bias.

The first certification run (seed 7919, 2026-08-19) failed the webrtc-class
kernel's 10 ms music bars — music_bed +0.08 s, vocals_bed +0.20 s,
strings_bed +0.10 s — and this probe showed why: the 10 ms bars were a
seed-0 sampling fluke. Across tuning seeds 1-8 (the family gate constants
are tuned on) 21/24 music-scenario slots missed the 10 ms bar, ALL BUT ONE
LATE (mean +0.10 s), with onset/release latency measurements locating the
mechanism: the causal detector releases 10-51 windows late (EMA decay
through the SNR threshold + trailing-only hangover) while onsets are
essentially exact, and the one-sided late mass drags the correlation peak.

``_PRE_HANGOVER_WINDOWS`` (ops/vad.py constants block) symmetrizes the
dilation; this probe re-measures the signed errors at the shipped
constants so the EVAL.md bars stay tied to a committed, re-runnable
measurement (artifact: EVAL_webrtc_bias.json). Protocol analog of
scripts/probe_noisy_jitter.py.

Usage: python scripts/probe_webrtc_bias.py [--seeds 1,2,3,4,5,6,7,8]
       [--minutes 3,10] [--scenarios music_bed,vocals_bed,strings_bed,
       laughter_breaks] [--out EVAL_webrtc_bias.json]
"""
import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
AGREE = os.path.join(HERE, "eval_vad_agreement.py")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="1,2,3,4,5,6,7,8")
    ap.add_argument("--minutes", default="3,10")
    ap.add_argument(
        "--scenarios",
        default="music_bed,vocals_bed,strings_bed,laughter_breaks",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]
    minute_list = [float(m) for m in args.minutes.split(",")]

    report = {"metric": "webrtc_music_offset_error_s", "by_minutes": {}}
    for minutes in minute_list:
        per_seed = {}
        for seed in seeds:
            cmd = [
                sys.executable,
                AGREE,
                "--seed",
                str(seed),
                "--minutes",
                str(minutes),
                "--vads",
                "webrtc",
                "--scenarios",
                args.scenarios,
            ]
            out = subprocess.run(
                cmd, capture_output=True, text=True, check=True
            ).stdout
            d = json.loads(out.splitlines()[-1])
            errs = {
                name: round(row["webrtc"] - row["truth"], 3)
                for name, row in d["per_scenario"].items()
                if row.get("webrtc") is not None
            }
            per_seed[str(seed)] = errs
            log("minutes %g seed %d: %s" % (minutes, seed, errs))
        flat = [e for errs in per_seed.values() for e in errs.values()]
        report["by_minutes"]["%g" % minutes] = {
            "per_seed": per_seed,
            "mean_s": round(sum(flat) / max(len(flat), 1), 4),
            "max_abs_s": round(max(abs(e) for e in flat), 3) if flat else None,
        }
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
