#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Adversarial VAD evaluation: per-condition accuracy for every backend.

Conditions come from models/eval_data.py — generators deliberately disjoint
from the training distribution (codec artifacts, telephone band-limiting,
whispering, clipping, music/noise beds at low SNR, applause, crowd babble,
crowd laughter, plucked music). Accuracy is window-level agreement with the
ground-truth gate, excluding windows near label transitions.

Writes/refreshes the results table in EVAL.md and prints one JSON line.
Any condition below the 0.90 bar for the ``silero`` (neural) backend means
the model needs retraining with broader augmentation.

Usage: python scripts/eval_neural_vad.py [--clips 6] [--seconds 30]
       [--backends silero,webrtc,auditok,fused] [--update-eval-md]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ACCURACY_BAR = 0.90
# Conditions whose window labels are perceptually ambiguous (negatives that
# are literally human speech) bind END-TO-END instead: eval_vad_agreement's
# --check-bars enforces the matching *_breaks scenario at ≤ 10 ms. EVAL.md
# "Bar (neural backend)" documents the exemption; window accuracy is still
# reported (and ⚠-flagged) for tracking.
END_TO_END_BOUND_CONDITIONS = ("crowd_babble",)
# The webrtc-class kernel carries no general window bar (EVAL.md), but
# capabilities its gates have WON are pinned so a constants change cannot
# silently regress them: applause rejection is the transient-train veto's
# whole job (0.004 -> 1.000 when it landed; bar at 0.5 per the round-5
# acceptance criterion, far under the measured margin).
WEBRTC_WINDOW_BARS = {"applause": 0.5}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def evaluate(
    backends,
    n_clips: int,
    clip_seconds: float,
    frame_rate: int,
    seed: int,
    conditions=None,
):
    from ffsubsync_tpu.constants import SAMPLE_RATE
    from ffsubsync_tpu.models.eval_data import CONDITIONS, condition_clips
    from ffsubsync_tpu.ops.vad import make_detector

    results = {}  # condition -> backend -> accuracy
    for name in sorted(conditions if conditions else CONDITIONS):
        clips = condition_clips(
            name, n_clips, clip_seconds, frame_rate, SAMPLE_RATE, seed=seed
        )
        results[name] = {}
        for backend in backends:
            correct = 0
            total = 0
            t0 = time.perf_counter()
            for pcm16, labels, mask in clips:
                # fresh detector per clip: clips are independent scenes
                detector = make_detector(backend, SAMPLE_RATE, frame_rate, 0.0)
                pred = np.asarray(detector(pcm16.tobytes()))
                n = min(len(pred), len(labels))
                hit = (pred[:n] > 0.5) == (labels[:n] > 0.5)
                correct += int(np.sum(hit[mask[:n]]))
                total += int(np.sum(mask[:n]))
            acc = correct / max(total, 1)
            results[name][backend] = acc
            log(
                "  %-18s %-8s acc=%.3f  (%d windows, %.1fs)"
                % (name, backend, acc, total, time.perf_counter() - t0)
            )
    return results


def render_table(results, backends):
    lines = ["| condition | " + " | ".join(backends) + " |"]
    lines.append("|---|" + "---|" * len(backends))
    for name in sorted(results):
        row = [name]
        for b in backends:
            acc = results[name][b]
            flag = " ⚠" if (b == "silero" and acc < ACCURACY_BAR) else ""
            row.append("%.3f%s" % (acc, flag))
        lines.append("| " + " | ".join(row) + " |")
    return "\n".join(lines)


def update_eval_md(table: str, args) -> None:
    path = os.path.join(os.path.dirname(__file__), "..", "EVAL.md")
    begin, end = "<!-- results:begin -->", "<!-- results:end -->"
    block = (
        "%s\n\n_%d clips x %.0f s per condition, frame rate %d, seed %d._\n\n"
        "%s\n\n%s"
        % (begin, args.clips, args.seconds, args.frame_rate, args.seed, table, end)
    )
    if os.path.exists(path):
        text = open(path).read()
        if begin in text and end in text:
            head, rest = text.split(begin, 1)
            _, tail = rest.split(end, 1)
            text = head + block + tail
        else:
            text += "\n" + block + "\n"
    else:
        text = block + "\n"
    with open(path, "w") as f:
        f.write(text)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=6)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--frame-rate", type=int, default=48000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--backends", default="silero,webrtc,auditok,fused"
    )
    ap.add_argument("--update-eval-md", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument(
        "--conditions",
        default=None,
        help="comma-separated condition subset (default: all); a subset run "
        "never updates EVAL.md (the table must stay complete)",
    )
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)
    backends = args.backends.split(",")
    conditions = args.conditions.split(",") if args.conditions else None
    if conditions:
        from ffsubsync_tpu.models.eval_data import CONDITIONS

        unknown = [c for c in conditions if c not in CONDITIONS]
        if unknown:
            ap.error(
                "unknown condition(s) %s (known: %s)"
                % (",".join(unknown), ",".join(sorted(CONDITIONS)))
            )
        if args.update_eval_md:
            ap.error("--conditions subsets cannot --update-eval-md")
    results = evaluate(
        backends,
        args.clips,
        args.seconds,
        args.frame_rate,
        args.seed,
        conditions=conditions,
    )
    table = render_table(results, backends)
    log(table)
    if args.update_eval_md:
        update_eval_md(table, args)
    worst, worst_gated, retval = gate_verdict(results)
    print(
        json.dumps(
            {
                "metric": "adversarial_vad_worst_condition_accuracy",
                "value": worst,
                "unit": "accuracy",
                "bar": ACCURACY_BAR,
                "worst_window_gated": worst_gated,
                "end_to_end_bound": list(END_TO_END_BOUND_CONDITIONS),
                "per_condition": results,
            }
        )
    )
    return retval


def gate_verdict(results):
    """(worst, worst_gated, exit_code) for a per-condition results dict.

    ``worst`` spans every condition (the reported headline number);
    ``worst_gated`` excludes the END_TO_END_BOUND_CONDITIONS, and it drives
    the exit code — the exempt conditions' binding check lives in
    ``eval_vad_agreement.py --check-bars`` (EVAL.md "Bar (neural backend)").
    The exit code also enforces WEBRTC_WINDOW_BARS when webrtc results are
    present (pinned won capabilities; see the constant).
    """
    neural = [results[c].get("silero") for c in results if "silero" in results[c]]
    worst = min(neural) if neural else None
    gated = [
        results[c]["silero"]
        for c in results
        if "silero" in results[c] and c not in END_TO_END_BOUND_CONDITIONS
    ]
    worst_gated = min(gated) if gated else None
    webrtc_ok = all(
        results[c]["webrtc"] >= bar
        for c, bar in WEBRTC_WINDOW_BARS.items()
        if c in results and "webrtc" in results[c]
    )
    neural_ok = worst_gated is None or worst_gated >= ACCURACY_BAR
    return (worst, worst_gated, 0 if (neural_ok and webrtc_ok) else 1)


if __name__ == "__main__":
    sys.exit(main())
