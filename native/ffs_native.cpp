// Host-side data-plane kernels for ffsubsync-tpu.
//
// The TPU owns the heavy math (FFTs, band projections, the neural VAD); this
// library owns the host byte-wrangling on the decode path, replacing Python
// loops that sit between the ffmpeg pipe and the device staging buffer:
//
//  - s16le → f32 conversion (staging)
//  - multi-channel → mono mixdown (native WAV reader)
//  - per-window energy (host fast path when a device round trip is overkill)
//  - the auditok-class stream tokenizer state machine (sequential control
//    flow the device is bad at, and the one 100 Hz pass that was a Python
//    per-element loop)
//
// Everything is extern "C" and called through ctypes; the Python wrappers
// fall back to numpy implementations when this library is absent.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Convert interleaved s16le PCM to float32, scaled by `scale`.
void ffs_pcm_s16_to_f32(const int16_t *in, float *out, int64_t n, float scale) {
  for (int64_t i = 0; i < n; ++i) {
    out[i] = static_cast<float>(in[i]) * scale;
  }
}

// Mix interleaved multi-channel s16 frames down to mono (mean of channels).
void ffs_mix_to_mono_i16(const int16_t *in, int64_t frames, int channels,
                         int16_t *out) {
  if (channels == 1) {
    std::memcpy(out, in, static_cast<size_t>(frames) * sizeof(int16_t));
    return;
  }
  for (int64_t f = 0; f < frames; ++f) {
    int32_t acc = 0;
    const int16_t *frame = in + f * channels;
    for (int c = 0; c < channels; ++c) acc += frame[c];
    out[f] = static_cast<int16_t>(acc / channels);
  }
}

// Per-window energy in dB over int16 amplitudes: 10*log10(mean(x^2)).
// Windows shorter than `window` at the tail are averaged over their true
// length. Returns the number of windows written.
int64_t ffs_window_energy_db(const int16_t *in, int64_t n, int window,
                             float *out) {
  if (window <= 0) return 0;
  int64_t n_windows = (n + window - 1) / window;
  for (int64_t w = 0; w < n_windows; ++w) {
    int64_t start = w * window;
    int64_t stop = start + window < n ? start + window : n;
    double acc = 0.0;
    for (int64_t i = start; i < stop; ++i) {
      double v = static_cast<double>(in[i]);
      acc += v * v;
    }
    double mean = acc / static_cast<double>(stop - start);
    out[w] = static_cast<float>(10.0 * std::log10(mean > 1e-10 ? mean : 1e-10));
  }
  return n_windows;
}

// auditok-class stream tokenizer over a boolean validity string.
//
// Semantics (mirrors ffsubsync_tpu.ops.vad.tokenize_validity): a token starts
// at a valid frame, tolerates up to `max_sil` consecutive invalid frames
// (kept inside the token), ends when silence exceeds that, splits at
// `max_len`, and is dropped when its voiced span is shorter than `min_len`.
// Writes inclusive (start, end) pairs; returns the token count (at most
// `cap`).
int64_t ffs_tokenize(const uint8_t *valid, int64_t n, int64_t min_len,
                     int64_t max_len, int64_t max_sil, int64_t *starts,
                     int64_t *ends, int64_t cap) {
  int64_t count = 0;
  int64_t start = -1;
  int64_t silence_run = 0;
  int64_t length = 0;
  for (int64_t i = 0; i < n && count < cap; ++i) {
    bool v = valid[i] != 0;
    if (start < 0) {
      if (v) {
        start = i;
        length = 1;
        silence_run = 0;
      }
      continue;
    }
    if (v) {
      silence_run = 0;
    } else {
      ++silence_run;
    }
    ++length;
    if (silence_run > max_sil) {
      int64_t end = i - silence_run;
      if (end - start + 1 >= min_len) {
        starts[count] = start;
        ends[count] = end + silence_run;  // keep trailing silence
        ++count;
      }
      start = -1;
      length = 0;
      silence_run = 0;
      continue;
    }
    if (length >= max_len) {
      starts[count] = start;
      ends[count] = i;
      ++count;
      start = -1;
      length = 0;
      silence_run = 0;
    }
  }
  if (start >= 0 && count < cap) {
    int64_t end = n - 1 - silence_run;
    if (end - start + 1 >= min_len) {
      int64_t capped = end + silence_run;
      starts[count] = start;
      ends[count] = capped < n - 1 ? capped : n - 1;
      ++count;
    }
  }
  return count;
}

}  // extern "C"
