# -*- coding: utf-8 -*-
"""Train the in-tree neural VAD on synthetic speech/non-speech audio.

The reference's "silero" backend downloads pretrained torch weights at runtime
(ffsubsync/speech_transformers.py:205-210). This framework keeps torch a
non-dependency: the silero-class model is trained here, in-repo, on
synthesized data, and its weights ship with the package.

Synthetic data design: "speech" is harmonic stacks (random f0 100-300 Hz with
jitter) shaped by formant-like band emphasis and 2-8 Hz syllabic amplitude
modulation over a noise floor; "non-speech" is silence, white/pink noise,
steady tones, and music-like sustained harmonic beds (no syllabic AM). The
discriminative cues — harmonicity + syllable-rate modulation — are the same
ones real neural VADs key on, so the model transfers to real audio reasonably,
and the energy/webrtc kernels remain available where it does not.

Usage:  python scripts/train_neural_vad.py [--steps 600] [--platform cpu]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--clip-seconds", type=float, default=10.0)
    ap.add_argument("--frame-rate", type=int, default=48000)
    ap.add_argument("--sample-rate", type=int, default=100)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--platform", default=None, help="jax platform override")
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import optax

    from ffsubsync_tpu.models import neural_vad
    from ffsubsync_tpu.models.synth_data import synth_batch
    from ffsubsync_tpu.ops.features import log_mel_features, mel_filterbank

    window = args.frame_rate // args.sample_rate
    n_freqs = window // 2 + 1
    mel_fb = jnp.asarray(mel_filterbank(n_freqs, args.frame_rate, neural_vad.N_MELS))

    params = neural_vad.init_params(jax.random.PRNGKey(args.seed))
    # warmup→cosine decay: the late-phase small steps matter for the fine
    # boundaries (babble vs dialogue) that a constant lr jitters over, and
    # the warmup + global-norm clip keep the first noisy batches (hard-SNR
    # clips produce near-saturated BCE) from blowing up the deeper net
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=args.lr,
        warmup_steps=min(100, max(args.steps // 10, 1)),
        decay_steps=max(args.steps, 1),
        end_value=args.lr * 0.05,
    )
    opt = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adam(schedule)
    )
    opt_state = opt.init(params)

    def loss_fn(params, pcm_batch, label_batch, weight_batch):
        def clip_loss(pcm, labels):
            feats = log_mel_features(pcm, mel_fb, window)
            probs = neural_vad.apply_model(params, feats)
            probs = probs[: labels.shape[0]]
            eps = 1e-6
            bce = -(labels * jnp.log(probs + eps)
                    + (1 - labels) * jnp.log(1 - probs + eps))
            return jnp.mean(bce)

        per_clip = jax.vmap(clip_loss)(pcm_batch, label_batch)
        return jnp.sum(per_clip * weight_batch) / jnp.sum(weight_batch)

    @jax.jit
    def step(params, opt_state, pcm_batch, label_batch, weight_batch):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, pcm_batch, label_batch, weight_batch
        )
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rng = np.random.RandomState(args.seed)
    for i in range(args.steps):
        pcm16, labels, weights = synth_batch(
            rng, args.batch, args.clip_seconds, args.frame_rate,
            args.sample_rate, return_weights=True,
        )
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(pcm16), jnp.asarray(labels),
            jnp.asarray(weights),
        )
        if i % 50 == 0 or i == args.steps - 1:
            print("step %4d  loss %.4f" % (i, float(loss)))

    # held-out accuracy
    pcm16, labels = synth_batch(
        np.random.RandomState(args.seed + 1), 16, args.clip_seconds,
        args.frame_rate, args.sample_rate,
    )
    import jax.numpy as jnp  # noqa: F811

    def predict(pcm):
        feats = log_mel_features(jnp.asarray(pcm), mel_fb, window)
        return neural_vad.apply_model(params, feats)

    correct = total = 0
    for i in range(len(pcm16)):
        probs = np.asarray(predict(pcm16[i]))[: labels.shape[1]]
        correct += ((probs > 0.5) == (labels[i] > 0.5)).sum()
        total += labels.shape[1]
    acc = correct / total
    print("held-out window accuracy: %.3f" % acc)

    # save rate-suffixed: the loader prefers neural_vad_weights_<rate>.npz
    # for the matching analysis rate, so a rate-less path would be shadowed
    out = args.out or os.path.join(
        os.path.dirname(neural_vad.default_weights_path()),
        "neural_vad_weights_%d.npz" % args.frame_rate,
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, **{k: np.asarray(v) for k, v in params.items()})
    print("wrote", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
