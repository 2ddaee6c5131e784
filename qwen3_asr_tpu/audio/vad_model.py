"""Learned voice-activity model: tiny dilated-conv net over absolute log-mel.

Replaces the analytic spectral VAD's judgment with ~7k trained weights
(tools/train_vad.py trains them on the vendored real-speech fixtures plus
synthetic negatives — the Silero-class "small learned model on host"
design, reference src/server.py:206-233, without downloaded weights).

Architecture: absolute (NOT max-normalized) 32-bin log-mel at 25 ms/10 ms
framing → 3 dilated 1-D convs → per-frame speech logit → masked max-pool.
Max-pooling gives the serving semantic directly — "does ANY frame carry
speech" — and makes the score length-independent, so the same weights
judge a 450 ms streaming tail and a 6.6 s flush window.

The weights ship in-package (vad_weights.npz, committed); audio/vad.py
routes to this model when they are present (ASR_VAD=spectral opts out).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

N_MELS = 32
FRAME = 400      # 25 ms @ 16 kHz
HOP = 160        # 10 ms
SR = 16000

_LAYERS = (      # (kernel, c_in, c_out, dilation)
    (5, N_MELS, 24, 1),
    (5, 24, 16, 2),
    (3, 16, 8, 1),
)

WEIGHTS_PATH = os.path.join(os.path.dirname(__file__), "vad_weights.npz")


def init_params(key: jax.Array) -> dict:
    params = {}
    for i, (k, cin, cout, _) in enumerate(_LAYERS):
        key, sub = jax.random.split(key)
        scale = (2.0 / (k * cin)) ** 0.5
        params[f"w{i}"] = jax.random.normal(sub, (k, cin, cout)) * scale
        params[f"b{i}"] = jnp.zeros((cout,))
    key, sub = jax.random.split(key)
    params["w_head"] = jax.random.normal(sub, (_LAYERS[-1][2],)) * 0.1
    params["b_head"] = jnp.zeros(())
    return params


def _conv1d(x: jax.Array, w: jax.Array, dilation: int) -> jax.Array:
    """x: [T, C_in], w: [K, C_in, C_out] → [T, C_out] (SAME padding)."""
    return jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1,), padding="SAME",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))[0]


def frame_logits(params: dict, feats: jax.Array) -> jax.Array:
    """feats: [T, N_MELS] → per-frame speech logits [T]."""
    x = feats
    for i, (_, _, _, dil) in enumerate(_LAYERS):
        x = jax.nn.relu(_conv1d(x, params[f"w{i}"], dil) + params[f"b{i}"])
    return x @ params["w_head"] + params["b_head"]


def window_logit(params: dict, feats: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked max over frame logits — 'any speech frame ⇒ speech'."""
    lg = frame_logits(params, feats)
    return jnp.max(jnp.where(mask, lg, -1e9))


# -- featurization ----------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def _mel_fb() -> np.ndarray:
    from .mel import mel_filter_bank
    return mel_filter_bank(FRAME // 2 + 1, N_MELS, 0.0, SR / 2.0, SR)


@functools.lru_cache(maxsize=1)
def _window() -> np.ndarray:
    from .frontend import hann_window
    return hann_window(FRAME)


@functools.lru_cache(maxsize=1)
def _consts() -> tuple:
    """Device-resident window/filterbank, materialized lazily (first VAD
    call, after entrypoints ran honor_platform_env — never at import)."""
    return jnp.asarray(_window()), jnp.asarray(_mel_fb())


def frames_to_feats(frames: jax.Array, mel_fb: jax.Array) -> jax.Array:
    """Hann-windowed frames [..., FRAME] → absolute log-mel [..., N_MELS]
    (the training tool featurizes pre-framed 1 s windows in batches)."""
    spec = jnp.fft.rfft(frames, axis=-1)
    power = spec.real ** 2 + spec.imag ** 2
    mel = power @ mel_fb
    return (jnp.log10(mel + 1e-10) + 5.0) / 3.0


@functools.partial(jax.jit, static_argnums=(3,))
def _featurize_jit(x: jax.Array, window: jax.Array, mel_fb: jax.Array,
                   n_frames_padded: int, n_frames: jax.Array) -> tuple:
    """Raw padded audio [need] → (absolute log-mel [Tb, N_MELS], mask [Tb]).

    Everything — framing, hann multiply, mask — lives inside the jit: the
    streaming flush tick calls this per 450 ms window, and on a
    tunnel-attached chip each eager op costs a full RTT; shipping raw
    audio instead of pre-framed [T, 400] windows also cuts the
    host→device transfer 2.5× (FRAME/HOP overlap).

    Absolute (no per-window max normalization): the model needs LEVEL to
    tell silence from speech; gain augmentation in training provides the
    level robustness instead."""
    idx = (jax.lax.broadcasted_iota(jnp.int32, (n_frames_padded, FRAME), 0)
           * HOP
           + jax.lax.broadcasted_iota(jnp.int32, (n_frames_padded, FRAME), 1))
    frames = x[idx] * window[None, :]
    feats = frames_to_feats(frames, mel_fb)
    mask = jnp.arange(n_frames_padded) < n_frames
    return feats, mask


def _pad_for(audio: np.ndarray, n_frames_padded: int) -> tuple:
    """Host-side prep: pad to the bucket's sample count, count real frames."""
    x = np.asarray(audio, dtype=np.float32)
    if len(x) < FRAME:
        x = np.pad(x, (0, FRAME - len(x)))
    n_frames = min(1 + (len(x) - FRAME) // HOP, n_frames_padded)
    need = FRAME + (n_frames_padded - 1) * HOP
    if len(x) < need:
        x = np.pad(x, (0, need - len(x)))
    return x[:need], n_frames


def featurize(audio: np.ndarray, n_frames_padded: int) -> tuple:
    """Mono f32 audio → (feats [Tb, N_MELS] jax, mask [Tb] jax)."""
    x, n_frames = _pad_for(audio, n_frames_padded)
    window, mel_fb = _consts()
    return _featurize_jit(jnp.asarray(x), window, mel_fb, n_frames_padded,
                          jnp.int32(n_frames))


# -- packaged-weights inference --------------------------------------------------

_params: Optional[dict] = None
_loaded_from: Optional[str] = None

from .vad import _BUCKETS  # one compiled-bucket ladder for both VAD backends


def load_params(path: str = None) -> Optional[dict]:
    """Load (and cache) the packaged weights; None when absent.

    Kept as NUMPY arrays: this is called from module-import paths (the
    serving flush-ticks default) and materializing jax arrays here would
    initialize the backend before entrypoints run honor_platform_env().
    jit converts them at first use."""
    global _params, _loaded_from
    path = path or os.getenv("ASR_VAD_WEIGHTS", WEIGHTS_PATH)
    if _params is not None and _loaded_from == path:
        return _params
    if not os.path.isfile(path):
        return None
    blob = np.load(path)
    _params = {k: np.asarray(blob[k]) for k in blob.files}
    _loaded_from = path
    return _params


@functools.partial(jax.jit, static_argnums=(4,))
def _prob_jit(params: dict, x: jax.Array, window: jax.Array,
              mel_fb: jax.Array, n_frames_padded: int,
              n_frames: jax.Array) -> jax.Array:
    """Raw audio → speech probability, ONE fused dispatch per bucket."""
    feats, mask = _featurize_jit(x, window, mel_fb, n_frames_padded,
                                 n_frames)
    return jax.nn.sigmoid(window_logit(params, feats, mask))


def speech_probability(audio_float32: np.ndarray) -> Optional[float]:
    """Learned speech probability; None when no weights are available."""
    params = load_params()
    if params is None:
        return None
    x = np.asarray(audio_float32, dtype=np.float32)
    n_frames = max(1, 1 + (max(len(x), FRAME) - FRAME) // HOP)
    bucket = next((b for b in _BUCKETS if n_frames <= b), _BUCKETS[-1])
    padded, n_frames = _pad_for(x, bucket)
    window, mel_fb = _consts()
    return float(_prob_jit(params, jnp.asarray(padded), window, mel_fb,
                           bucket, jnp.int32(n_frames)))
