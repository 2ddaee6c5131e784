// Native audio DSP for the serving host path.
//
// The reference leans on libsndfile (C) for container decode and
// librosa/scipy's compiled kernels for resampling/filtering
// (reference src/server.py:26-43, Dockerfile:18-20). This library is the
// equivalent native layer for the TPU build's host-side hot path — the
// per-450 ms WebSocket chunk conversions that the reference measured at
// 15-25% of per-chunk overhead (LEARNING_LOG.md:235).
//
// Exposed via ctypes (see qwen3_asr_tpu/audio/native.py). All functions are
// plain C ABI, operate on caller-allocated buffers, and return 0 on success.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libaudiodsp.so audio_dsp.cpp

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// s16le PCM -> float32 in [-1, 1). The WS ingest hot path.
int pcm16_to_f32(const int16_t* in, int64_t n, float* out) {
    constexpr float kScale = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * kScale;
    return 0;
}

// float32 -> s16le PCM with clamping.
int f32_to_pcm16(const float* in, int64_t n, int16_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i] * 32767.0f;
        v = std::max(-32768.0f, std::min(32767.0f, v));
        out[i] = static_cast<int16_t>(std::lrintf(v));
    }
    return 0;
}

// Stereo/multichannel interleaved -> mono mean.
int interleaved_to_mono(const float* in, int64_t frames, int channels,
                        float* out) {
    if (channels <= 0) return -1;
    const float inv = 1.0f / channels;
    for (int64_t i = 0; i < frames; ++i) {
        float acc = 0.0f;
        for (int c = 0; c < channels; ++c) acc += in[i * channels + c];
        out[i] = acc * inv;
    }
    return 0;
}

// FIR convolution with 'same' centering: out[i] = sum_k h[k]·xpad[i+k],
// where x is zero-padded by (n_taps-1)/2 on both sides. Used for the
// telephony bandpass and as the inner op of polyphase resampling.
int fir_same(const float* x, int64_t n, const float* h, int n_taps,
             float* out) {
    const int64_t pad = (n_taps - 1) / 2;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t lo = std::max<int64_t>(0, i - pad);
        const int64_t hi = std::min<int64_t>(n - 1, i - pad + n_taps - 1);
        float acc = 0.0f;
        // h index for x[j] is (j - (i - pad))
        for (int64_t j = lo; j <= hi; ++j) acc += x[j] * h[j - (i - pad)];
        out[i] = acc;
    }
    return 0;
}

// Polyphase rational resample: zero-stuff by `up`, FIR low-pass (centered),
// downsample by `down`. h must be the kaiser-windowed sinc designed at the
// high rate (same coefficients Python uses — bit-comparable numerics).
// out must hold ceil(n*up/down) samples. Computes only needed phases:
// O(n_out · taps/up) — never materializes the zero-stuffed signal.
int resample_poly(const float* x, int64_t n, int up, int down,
                  const float* h, int n_taps, float* out, int64_t n_out) {
    if (up <= 0 || down <= 0) return -1;
    const int64_t pad = (n_taps - 1) / 2;
    for (int64_t o = 0; o < n_out; ++o) {
        // Output o reads zero-stuffed position p = o*down; taps centered.
        const int64_t p = o * static_cast<int64_t>(down) - pad;
        float acc = 0.0f;
        // Only indices where (p + k) % up == 0 hit real samples.
        int64_t k0 = (p % up == 0) ? 0 : ((up - (p % up)) % up + up) % up;
        for (int64_t k = k0; k < n_taps; k += up) {
            const int64_t src = (p + k) / up;
            if (src >= 0 && src < n) acc += x[src] * h[k];
        }
        out[o] = acc;
    }
    return 0;
}

// Frame RMS energies: 10ms-hop energy track used by VAD pre-gates and
// silence-boundary segmentation.
int frame_rms(const float* x, int64_t n, int frame, int hop, float* out,
              int64_t n_frames) {
    for (int64_t f = 0; f < n_frames; ++f) {
        const int64_t start = f * hop;
        float acc = 0.0f;
        int64_t count = 0;
        for (int64_t i = start; i < std::min<int64_t>(start + frame, n); ++i) {
            acc += x[i] * x[i];
            ++count;
        }
        out[f] = count ? std::sqrt(acc / count) : 0.0f;
    }
    return 0;
}

}  // extern "C"
