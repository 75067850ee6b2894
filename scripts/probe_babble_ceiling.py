#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Measure the crowd_babble window-accuracy CEILING with an in-distribution
probe.

The shipped neural VAD has plateaued at ~0.78-0.82 window accuracy on the
``crowd_babble`` eval condition across nine documented retrains (EVAL.md).
Two hypotheses:

1. **Transfer gap** — training babble (models/synth_data.py voices) differs
   from eval babble (models/eval_data.py source-filter voices), and the
   residual is distribution shift a better training set could close.
2. **Genuine ambiguity** — at the 10 ms window level, dense overlapped
   speech is intrinsically confusable with a noisy dialogue scene; no
   window classifier of this capacity can do much better.

This probe separates them: train the SAME architecture directly on
EVAL-FAMILY data (source-filter speech positives, eval-generator babble
negatives — an oracle's training set, never shipped) and score it on
held-out eval babble + speech clips. The probe's babble accuracy is an
upper bound estimate (the "oracle score") for what any same-capacity
detector could reach without overfitting eval draws:

- probe >> shipped (≥0.9): the plateau is a transfer gap — keep retraining.
- probe ≈ shipped: the plateau IS the ambiguity ceiling; EVAL.md's bar for
  crowd_babble should bind end-to-end (babble_breaks ≤ 10 ms) with the
  window number tracked against the measured ceiling, not against 0.90.

A dominance-margin analysis (one voice momentarily louder than the rest =
perceptually speech) was measured first and REJECTED as the explanation:
the shipped net's false fires concentrate at LOW dominance (fire rate 0.30
at < -6 dB margin vs 0.05 at > 0 dB), i.e. it fires on the babble texture,
not on dominant voices — so excluding "ambiguous dominant windows" from
scoring would not be honest.

Prints one JSON line with probe/shipped accuracies per condition.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _probe_batch(rng, n_clips, clip_seconds, frame_rate, sample_rate):
    """Eval-family training batch: source-filter speech vs babble/noise."""
    from ffsubsync_tpu.models import eval_data as ed

    window = frame_rate // sample_rate
    samples = int(clip_seconds * frame_rate)
    n_windows = samples // window
    pcm = np.zeros((n_clips, samples), np.float32)
    labels = np.zeros((n_clips, n_windows), np.float32)
    for i in range(n_clips):
        x = rng.randn(samples).astype(np.float32) * 0.002
        u = rng.rand()
        if u < 0.45:  # speech (sometimes over a babble bed)
            v, gate = ed._source_filter_speech(rng, samples, frame_rate)
            if rng.rand() < 0.4:
                bed = ed._crowd_babble(rng, samples, frame_rate)
                x += ed._scaled_to_snr(v, bed, rng.uniform(3.0, 12.0))
            x += v
            labels[i] = ed._window_labels(gate, window)
        elif u < 0.9:  # babble negative
            x += ed._crowd_babble(
                rng, samples, frame_rate, voices=rng.randint(8, 17)
            )
        # else: noise-floor negative
        pcm[i] = x
    pcm16 = np.clip(pcm * 32767, -32768, 32767).astype(np.int16)
    return pcm16, labels


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=900)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--clip-seconds", type=float, default=10.0)
    ap.add_argument("--frame-rate", type=int, default=12000)
    ap.add_argument("--sample-rate", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    import jax.numpy as jnp
    import optax

    from ffsubsync_tpu.models import neural_vad
    from ffsubsync_tpu.ops.features import log_mel_features, mel_filterbank

    window = args.frame_rate // args.sample_rate
    n_freqs = window // 2 + 1
    mel_fb = jnp.asarray(
        mel_filterbank(n_freqs, args.frame_rate, neural_vad.N_MELS)
    )
    params = neural_vad.init_params(jax.random.PRNGKey(args.seed))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, min(100, max(args.steps // 10, 1)),
        max(args.steps, 1), args.lr * 0.05,
    )
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    opt_state = opt.init(params)

    def loss_fn(params, pcm_batch, label_batch):
        def clip_loss(pcm, labels):
            feats = log_mel_features(pcm, mel_fb, window)
            probs = neural_vad.apply_model(params, feats)[: labels.shape[0]]
            eps = 1e-6
            return jnp.mean(
                -(labels * jnp.log(probs + eps)
                  + (1 - labels) * jnp.log(1 - probs + eps))
            )

        return jnp.mean(jax.vmap(clip_loss)(pcm_batch, label_batch))

    @jax.jit
    def step(params, opt_state, pcm_batch, label_batch):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, pcm_batch, label_batch
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(args.seed)
    for i in range(args.steps):
        pcm16, labels = _probe_batch(
            rng, args.batch, args.clip_seconds, args.frame_rate,
            args.sample_rate,
        )
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(pcm16), jnp.asarray(labels)
        )
        if i % 100 == 0 or i == args.steps - 1:
            log("step %4d  loss %.4f" % (i, float(loss)))

    # score the probe AND the shipped net on held-out eval clips. The eval
    # harness decimates 48 kHz audio to the 12 kHz analysis rate; the probe
    # was trained at 12 kHz directly, so generate at 12 kHz here and score
    # both nets on identical windows.
    from ffsubsync_tpu.models.eval_data import condition_clips
    from ffsubsync_tpu.ops.vad import make_detector

    def probe_predict(pcm16):
        feats = log_mel_features(jnp.asarray(pcm16), mel_fb, window)
        return np.asarray(neural_vad.apply_model(params, feats))

    report = {}
    for cond in ("crowd_babble", "low_snr_pink", "whisper"):
        clips = condition_clips(
            cond, 6, 30.0, args.frame_rate, args.sample_rate,
            seed=args.seed + 10_000,  # held out from probe training draws
        )
        hits_p = hits_s = total = 0
        for pcm16, labels, mask in clips:
            n = len(labels)
            pp = probe_predict(pcm16)[:n] > 0.5
            shipped = make_detector(
                "silero", args.sample_rate, args.frame_rate, 0.0
            )
            sp = np.asarray(shipped(pcm16.tobytes()))[:n] > 0.5
            want = labels[:n] > 0.5
            hits_p += int(((pp == want) & mask[:n]).sum())
            hits_s += int(((sp == want) & mask[:n]).sum())
            total += int(mask[:n].sum())
        report[cond] = {
            "probe": round(hits_p / max(total, 1), 3),
            "shipped": round(hits_s / max(total, 1), 3),
        }
        log("%s: probe %.3f shipped %.3f" % (cond, *[
            report[cond][k] for k in ("probe", "shipped")
        ]))
    print(json.dumps({"metric": "babble_ceiling_probe", **report}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
