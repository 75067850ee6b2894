# -*- coding: utf-8 -*-
"""Shared test helpers: synthetic audio + WAV writing."""

import numpy as np


def synth_speechlike(duration_s, speech_spans, frame_rate=48000, seed=0,
                     speech_level=0.3, noise_level=0.002):
    """Mono float waveform: harmonic speech-like bursts inside given spans."""
    rng = np.random.RandomState(seed)
    n = int(duration_s * frame_rate)
    t = np.arange(n) / frame_rate
    x = rng.randn(n).astype(np.float32) * noise_level
    for (start, end) in speech_spans:
        i0, i1 = int(start * frame_rate), min(int(end * frame_rate), n)
        if i1 <= i0:
            continue
        seg_t = t[i0:i1]
        f0 = rng.uniform(120, 250)
        seg = np.zeros(i1 - i0, np.float32)
        for h in range(1, 10):
            seg += (1.0 / h) * np.sin(
                2 * np.pi * f0 * h * seg_t + rng.uniform(0, 6.28)
            ).astype(np.float32)
        am = 0.55 + 0.45 * np.sin(2 * np.pi * 4.0 * seg_t + rng.uniform(0, 6.28))
        x[i0:i1] += speech_level * seg * am.astype(np.float32)
    return x


def write_wav(path, waveform, frame_rate=48000, channels=1):
    """Minimal PCM16 WAV writer (shared implementation)."""
    from ffsubsync_tpu.utils.fixtures import write_wav_i16

    write_wav_i16(path, waveform, frame_rate, channels=channels)


def spans_from_srt_text(srt_text):
    """(start_s, end_s) spans of every cue in a simple srt string."""
    import re

    spans = []
    for m in re.finditer(
        r"(\d+):(\d+):(\d+),(\d+) --> (\d+):(\d+):(\d+),(\d+)", srt_text
    ):
        g = [int(x) for x in m.groups()]
        spans.append(
            (g[0] * 3600 + g[1] * 60 + g[2] + g[3] / 1000.0,
             g[4] * 3600 + g[5] * 60 + g[6] + g[7] / 1000.0)
        )
    return spans
