"""Fused JAX audio frontend: PCM → (bandpass) → STFT → log-mel.

TPU-native replacement for the reference's scipy/librosa/torch preprocessing
(src/server.py:26-43 bandpass+resample; the model SDK's Whisper-style
feature extraction). Everything here is jit-compiled and static-shaped: the
engine pads audio to a length bucket and passes the true sample count, so
XLA compiles once per bucket and the 450 ms streaming re-transcription
always hits a warm executable (SURVEY.md §7.2 step 3).

Feature semantics match ``transformers.WhisperFeatureExtractor``
(n_fft=400, hop=160, periodic Hann, slaney mel, log10 + max-8 clamp +
(x+4)/4 normalization), golden-tested in tests/test_audio_frontend.py.

The telephony bandpass is an intentional TPU-first redesign: the reference
uses a 4th-order Butterworth IIR (scipy sosfilt — inherently sequential),
which maps terribly onto a vector machine. We use a 201-tap linear-phase
windowed-sinc FIR with the same 300-3400 Hz passband, which is a single
convolution (VPU/MXU friendly) with equivalent band selectivity.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mel import mel_filter_bank

N_FFT = 400
HOP_LENGTH = 160
WINDOW_SAMPLES = N_FFT


def hann_window(n: int = N_FFT) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window / np.hanning(n+1)[:-1])."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def fir_bandpass_kernel(low_hz: float = 300.0, high_hz: float = 3400.0,
                        sr: int = 16000, numtaps: int = 201) -> np.ndarray:
    """Linear-phase windowed-sinc bandpass FIR (Hamming window)."""
    assert numtaps % 2 == 1
    m = np.arange(numtaps) - (numtaps - 1) / 2.0
    def sinc_lp(fc):
        x = 2.0 * fc / sr
        return x * np.sinc(x * m)
    h = sinc_lp(high_hz) - sinc_lp(low_hz)
    h *= np.hamming(numtaps)
    # Normalize passband gain to 1.0 at the geometric center frequency.
    fc = np.sqrt(low_hz * high_hz)
    gain = np.abs(np.sum(h * np.exp(-2j * np.pi * fc / sr * np.arange(numtaps))))
    return (h / gain).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("numtaps",))
def _apply_fir(audio: jax.Array, kernel: jax.Array, numtaps: int) -> jax.Array:
    pad = numtaps // 2
    x = jnp.pad(audio, (pad, pad))
    return jnp.convolve(x, kernel, mode="valid")


class Bandpass:
    """300-3400 Hz telephony bandpass (reference src/server.py:26-29)."""

    def __init__(self, low_hz: float = 300.0, high_hz: float = 3400.0,
                 sr: int = 16000, numtaps: int = 201):
        self.numtaps = numtaps
        # host numpy (same closure-constant rule as LogMelFrontend below)
        self.kernel = fir_bandpass_kernel(low_hz, high_hz, sr, numtaps)
        self._kernel_dev = None  # device copy for the argument path

    def __call__(self, audio: jax.Array) -> jax.Array:
        if self._kernel_dev is None:
            self._kernel_dev = jnp.asarray(self.kernel)
        return _apply_fir(audio, self._kernel_dev, self.numtaps)


def num_frames(n_samples: int, hop: int = HOP_LENGTH) -> int:
    """Whisper-style TOTAL frame count of an exact-length clip: centered
    STFT, last frame dropped (480000 samples → 3000 frames, matching HF).

    NOT the valid-frame count of a clip inside a LONGER padded buffer —
    that is ceil(n_valid/hop), returned by `_log_mel_impl` as
    `valid_frames` (the two differ for non-hop-aligned lengths)."""
    return n_samples // hop


@functools.partial(jax.jit, static_argnames=("n_mels",))
def _log_mel_impl(audio: jax.Array, n_valid: jax.Array, window: jax.Array,
                  mel_fb: jax.Array, n_mels: int) -> tuple[jax.Array, jax.Array]:
    """audio: [N] float32 (N static, bucket-padded). n_valid: true sample count.

    Returns (log_mel [n_mels, T], valid_frames scalar) with T = N // hop.
    Padding frames are forced to the whisper floor value so they behave like
    silence under downstream masking.
    """
    n = audio.shape[0]
    t = n // HOP_LENGTH
    # Zero out samples beyond n_valid (bucket padding).
    sample_idx = jnp.arange(n)
    audio = jnp.where(sample_idx < n_valid, audio, 0.0)

    # Centered framing with reflect padding of n_fft//2.
    pad = N_FFT // 2
    padded = jnp.pad(audio, (pad, pad), mode="reflect")
    frame_idx = jnp.arange(t)[:, None] * HOP_LENGTH + jnp.arange(N_FFT)[None, :]
    frames = padded[frame_idx] * window[None, :]          # [T, n_fft]

    spec = jnp.fft.rfft(frames, n=N_FFT, axis=-1)          # [T, 201]
    power = (spec.real ** 2 + spec.imag ** 2)              # [T, 201]

    mel = power @ mel_fb                                   # [T, n_mels]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))

    valid_frames = jnp.minimum((n_valid + HOP_LENGTH - 1) // HOP_LENGTH, t)
    frame_mask = jnp.arange(t)[:, None] < valid_frames     # [T, 1]
    # The clamp max counts every frame whose window overlaps a real sample
    # (frame k reads [k·hop − n_fft/2, k·hop + n_fft/2)): up to one frame
    # past valid_frames still holds real clip-tail energy, and Whisper's
    # reference computes its max over ALL frames of the padded clip —
    # beyond that the windows see pure zeros (-10), never the max.
    max_frames = jnp.minimum((n_valid + pad + HOP_LENGTH - 1) // HOP_LENGTH,
                             t)
    masked = jnp.where(jnp.arange(t)[:, None] < max_frames, log_spec, -1e30)
    global_max = jnp.max(masked)
    log_spec = jnp.maximum(log_spec, global_max - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    floor = (jnp.maximum(-10.0, global_max - 8.0) + 4.0) / 4.0
    log_spec = jnp.where(frame_mask, log_spec, floor)
    return log_spec.T, valid_frames                        # [n_mels, T]


class LogMelFrontend:
    """Whisper-compatible log-mel extractor, jitted per padded length."""

    def __init__(self, n_mels: int = 128, sr: int = 16000,
                 fmin: float = 0.0, fmax: Optional[float] = None):
        self.n_mels = n_mels
        self.sr = sr
        fmax = fmax if fmax is not None else sr / 2.0
        # HOST numpy, deliberately: these are closed over by every fused
        # executable (engine._prompt_builder), and a closure constant that
        # is a DEVICE array forces a device→host fetch at MLIR-emission
        # time (jax's array constant handler blocks in Array._value). On
        # remote-attached backends that fetch is pure waste — and it was
        # where the process's one-time first-fetch cost (52–1416 s observed over
        # the tunnel; see engine.warm_d2h_path_async) landed, stalling
        # the first lower(). numpy constants lower straight from host
        # memory.
        self.window = hann_window().astype(np.float32)
        self.mel_fb = mel_filter_bank(
            N_FFT // 2 + 1, n_mels, fmin, fmax, sr).astype(np.float32)
        # Device copies for the ARGUMENT path (__call__): numpy jit args
        # would re-upload ~100 KB per call (a full RTT on remote links).
        # Lazy: created on first standalone use, so merely constructing a
        # frontend (the engine does, for its closures) touches no device.
        self._window_dev = None
        self._mel_fb_dev = None

    def _dev_consts(self):
        if self._mel_fb_dev is None:
            self._window_dev = jnp.asarray(self.window)
            self._mel_fb_dev = jnp.asarray(self.mel_fb)
        return self._window_dev, self._mel_fb_dev

    def __call__(self, audio, n_valid: Optional[int] = None):
        """audio: float32 [N] (numpy or jax). Returns (log_mel [n_mels, N//hop],
        valid_frame_count)."""
        audio = jnp.asarray(audio, dtype=jnp.float32)
        if n_valid is None:
            n_valid = audio.shape[0]
        window, mel_fb = self._dev_consts()
        return _log_mel_impl(audio, jnp.asarray(n_valid, jnp.int32),
                             window, mel_fb, self.n_mels)
