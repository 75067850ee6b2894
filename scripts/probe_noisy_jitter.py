#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Seed-sweep protocol behind the `noisy` scenario's 30 ms bar (EVAL.md).

The claim being made reproducible: under the 4 dB pink bed, a 3-minute
clip's correlation peak jitters by 1-3 label cells with random sign and
backend — it is the harness's short-clip measurement variance, NOT detector
bias — and the jitter vanishes at 10-minute clip length. That evidence
previously lived only as docstring/EVAL.md narrative; this script IS the
protocol, and its JSON output is the artifact (commit it as
``EVAL_noisy_jitter.json`` when re-run).

Protocol: run the full end-to-end agreement harness (sync.run per backend)
on the `noisy` scenario at 3-minute and 10-minute clip lengths across
several seeds, and report each backend's offset deviation in 10 ms cells
per (seed, length). Interpretation guide:

- deviation cells vary in SIGN and strike DIFFERENT backends at different
  seeds  -> measurement variance (bias would be one-sided and systematic);
- max |cells| at 10 min << max |cells| at 3 min  -> short-clip effect;
- a weights retrain shifting WHICH seeds deviate but not the envelope
  -> weights-independent.

Usage::

    python scripts/probe_noisy_jitter.py [--seeds 0,100,200,300]
        [--lengths 3,10] [--vads fused,silero] [--frame-rate 12000]

Prints one JSON line. Runtime is ~n_seeds x n_lengths x n_vads full syncs
(each 3/10-minute movie synthesized + synced once per backend).
"""
import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _load_agreement():
    path = os.path.join(os.path.dirname(__file__), "eval_vad_agreement.py")
    spec = importlib.util.spec_from_file_location("eval_vad_agreement", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0,100,200,300")
    ap.add_argument("--lengths", default="3,10", help="clip minutes to sweep")
    ap.add_argument("--vads", default="fused,silero")
    ap.add_argument("--frame-rate", type=int, default=12000)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    agreement = _load_agreement()
    vads = args.vads.split(",")
    seeds = [int(s) for s in args.seeds.split(",")]
    lengths = [float(m) for m in args.lengths.split(",")]

    sweep = []
    for minutes in lengths:
        for seed in seeds:
            report = agreement.run_synthetic(
                vads, minutes, args.frame_rate, seed, scenarios=["noisy"]
            )
            row = report["per_scenario"]["noisy"]
            cells = {
                vad: (
                    None
                    if row[vad] is None
                    else int(round((row[vad] - row["truth"]) * 100.0))
                )
                for vad in vads
            }
            print(
                "  %4.1f min seed %-4d -> %s"
                % (
                    minutes,
                    seed,
                    " ".join("%s %+d" % (v, c) for v, c in cells.items()),
                ),
                file=sys.stderr,
                flush=True,
            )
            sweep.append({"minutes": minutes, "seed": seed, "cells": cells})

    def _env(minutes):
        vals = [
            abs(c)
            for r in sweep
            if r["minutes"] == minutes
            for c in r["cells"].values()
            if c is not None
        ]
        return max(vals) if vals else None

    print(
        json.dumps(
            {
                "metric": "noisy_offset_jitter_cells",
                "unit": "10ms cells (deviation from truth)",
                "frame_rate": args.frame_rate,
                "sweep": sweep,
                "max_abs_cells_per_length": {
                    str(m): _env(m) for m in lengths
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
