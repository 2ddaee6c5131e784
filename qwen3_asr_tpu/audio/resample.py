"""Polyphase FIR resampling (host path).

Replaces librosa.resample for the WebSocket 8 kHz → 16 kHz path and for
arbitrary upload rates (reference src/server.py:32-42). A Kaiser-windowed
sinc low-pass drives a TRUE polyphase evaluation — O(n_out · taps/up),
never materializing the zero-stuffed signal. That matters beyond style:
odd rate pairs like 11025→16000 factor to up/down = 640/441, where a dense
zero-stuff + convolve pays ~up² more work (hundreds of GFLOPs for seconds
of audio). Resampling always runs host-side BEFORE bucketing, so this is
the C++ kernel (native/audio_dsp.cpp) with a vectorized numpy fallback.
"""
from __future__ import annotations

from math import gcd

import numpy as np


def _kaiser_lowpass(up: int, down: int, ntaps_per_phase: int = 10,
                    beta: float = 5.0) -> np.ndarray:
    """Kaiser-windowed sinc low-pass, scipy.resample_poly-compatible defaults."""
    max_rate = max(up, down)
    f_c = 1.0 / max_rate           # normalized cutoff (Nyquist of lower rate)
    half_len = ntaps_per_phase * max_rate
    n = np.arange(-half_len, half_len + 1)
    h = f_c * np.sinc(f_c * n)
    h *= np.kaiser(2 * half_len + 1, beta)
    h /= np.sum(h)  # firwin-style: unity gain at DC
    h *= up
    return h.astype(np.float32)


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Resample float32 audio between sample rates with a polyphase FIR."""
    if orig_sr == target_sr:
        return np.asarray(audio, dtype=np.float32)
    g = gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    from . import native
    return native.resample_poly(np.asarray(audio, dtype=np.float32),
                                up, down, _kaiser_lowpass(up, down))


class StreamingResampler:
    """Stateful integer-factor upsampler for frame-by-frame streams.

    A stateless per-frame FIR zero-pads every frame edge, stamping seam
    artifacts into the signal at each WS message boundary. This keeps
    enough input history across calls that every emitted output sample is
    computed from REAL neighboring samples — byte-identical to resampling
    the whole stream at once (interior region).

    Supports target_sr = L × orig_sr (the serving case is 8 kHz → 16 kHz).
    """

    def __init__(self, orig_sr: int, target_sr: int):
        assert target_sr % orig_sr == 0, "integer upsampling factors only"
        self.up = target_sr // orig_sr
        self.h = _kaiser_lowpass(self.up, 1)
        self.pad = (len(self.h) - 1) // 2           # high-rate group delay
        # history needed so consecutive exact regions overlap (K ≥ 2P/L)
        self.keep = 2 * (-(-self.pad // self.up))
        self._tail = np.zeros(0, np.float32)
        self._in_count = 0                           # inputs consumed
        self._out_emitted = 0                        # outputs emitted
        self._byte_carry = b""                       # odd-length PCM frames

    def process(self, samples: np.ndarray) -> np.ndarray:
        """Feed a block of float32 samples; returns finalized output."""
        samples = np.asarray(samples, dtype=np.float32)
        if len(samples) == 0:
            return np.zeros(0, np.float32)
        x = np.concatenate([self._tail, samples])
        g0 = (self._in_count - len(self._tail)) * self.up
        from . import native
        out_full = native.resample_poly(x, self.up, 1, self.h)
        exact_end = len(x) * self.up - self.pad      # outputs final so far
        lo = self._out_emitted - g0
        out = out_full[max(lo, 0):max(exact_end, 0)]
        self._out_emitted = max(self._out_emitted, g0 + exact_end)
        self._in_count += len(samples)
        self._tail = x[-self.keep:] if len(x) >= self.keep else x
        return out

    def process_pcm(self, pcm_bytes: bytes) -> bytes:
        # Clients may frame the byte stream at arbitrary (odd) boundaries;
        # carry the dangling byte into the next frame.
        data = self._byte_carry + pcm_bytes
        usable = len(data) - (len(data) % 2)
        self._byte_carry = data[usable:]
        samples = np.frombuffer(data[:usable], dtype=np.int16).astype(
            np.float32)
        out = self.process(samples)
        return np.clip(out, -32768, 32767).astype(np.int16).tobytes()


def resample_pcm_bytes(pcm_bytes: bytes, orig_sr: int, target_sr: int = 16000) -> bytes:
    """Resample raw PCM s16le bytes (reference src/server.py:32-42 contract).

    Host hot path (per WS frame): uses the native C++ polyphase kernel when
    available, avoiding a device round-trip per frame.
    """
    if orig_sr == target_sr:
        return pcm_bytes
    from . import native
    g = gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    samples = np.frombuffer(pcm_bytes, dtype=np.int16).astype(np.float32)
    # native.resample_poly falls back to an identical numpy path when the
    # C++ library is unavailable.
    out = native.resample_poly(samples, up, down, _kaiser_lowpass(up, down))
    return np.clip(out, -32768, 32767).astype(np.int16).tobytes()
