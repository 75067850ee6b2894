# -*- coding: utf-8 -*-
"""Shared test helpers: synthetic audio + WAV writing."""



def synth_speechlike(duration_s, speech_spans, frame_rate=48000, seed=0,
                     speech_level=0.3, noise_level=0.002):
    """Mono float waveform: speech-like bursts (moving formants) in spans."""
    from ffsubsync_tpu.models.synth_data import speech_signal_for_spans

    return speech_signal_for_spans(
        duration_s, speech_spans, frame_rate, seed=seed,
        speech_level=speech_level, noise_level=noise_level,
    )


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
