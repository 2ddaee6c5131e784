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

// ── FLAC hot loops ──────────────────────────────────────────────────────────
// The container/frame parsing stays in Python (audio/flac.py); these cover
// the per-sample work: Rice/raw residual decoding and the LPC/fixed
// prediction recurrence. Bit positions are ABSOLUTE bit offsets into the
// stream (MSB-first within each byte), so Python's _BitReader can hand off
// and resume around each call.

static inline int64_t flac_read_bits(const uint8_t* d, int64_t n_bytes,
                                     int64_t& bp, int k, bool& ok) {
    int64_t v = 0;
    for (int i = 0; i < k; ++i) {
        const int64_t byte = bp >> 3;
        if (byte >= n_bytes) { ok = false; return 0; }
        v = (v << 1) | ((d[byte] >> (7 - (bp & 7))) & 1);
        ++bp;
    }
    return v;
}

static inline int64_t flac_read_unary(const uint8_t* d, int64_t n_bytes,
                                      int64_t& bp, bool& ok) {
    int64_t q = 0;
    while (true) {
        const int64_t byte = bp >> 3;
        if (byte >= n_bytes) { ok = false; return 0; }
        const int rem = 8 - (bp & 7);
        const uint8_t cur = d[byte] & ((1u << rem) - 1);
        if (cur == 0) { q += rem; bp += rem; continue; }
        const int top = 31 - __builtin_clz(static_cast<unsigned>(cur));
        const int zeros = rem - 1 - top;
        q += zeros;
        bp += zeros + 1;  // the zeros plus the terminating 1-bit
        return q;
    }
}

// n zigzag Rice codes with fixed parameter. Returns the new absolute bit
// position, or -1 on stream overrun.
int64_t flac_rice_decode(const uint8_t* data, int64_t n_bytes,
                         int64_t bit_pos, int64_t n, int param,
                         int64_t* out) {
    bool ok = true;
    for (int64_t i = 0; i < n; ++i) {
        int64_t u = flac_read_unary(data, n_bytes, bit_pos, ok);
        if (param)
            u = (u << param) | flac_read_bits(data, n_bytes, bit_pos,
                                              param, ok);
        if (!ok) return -1;
        out[i] = (u >> 1) ^ -(u & 1);
    }
    return bit_pos;
}

// n raw two's-complement values of `bits` bits (escape partitions, VERBATIM
// subframes, warmup samples). Returns the new bit position or -1.
int64_t flac_raw_decode(const uint8_t* data, int64_t n_bytes,
                        int64_t bit_pos, int64_t n, int bits,
                        int64_t* out) {
    bool ok = true;
    const int64_t sign = int64_t(1) << (bits - 1);
    const int64_t full = int64_t(1) << bits;
    for (int64_t i = 0; i < n; ++i) {
        int64_t v = flac_read_bits(data, n_bytes, bit_pos, bits, ok);
        if (!ok) return -1;
        out[i] = (v & sign) ? v - full : v;
    }
    return bit_pos;
}

// In-place prediction restore: buf holds warmup samples followed by
// residuals; buf[i] += (sum_j coeffs[j]*buf[i-1-j]) >> shift for i >= order.
// (Arithmetic >> matches Python's floor shift for negatives; shift = 0 for
// fixed predictors.)
int flac_predict(int64_t* buf, int64_t n, const int32_t* coeffs, int order,
                 int shift) {
    for (int64_t i = order; i < n; ++i) {
        int64_t pred = 0;
        for (int j = 0; j < order; ++j)
            pred += static_cast<int64_t>(coeffs[j]) * buf[i - 1 - j];
        buf[i] += pred >> shift;
    }
    return 0;
}

}  // extern "C"
