"""ctypes bindings to the native C++ audio DSP library.

Builds qwen3_asr_tpu/native/audio_dsp.cpp on first use (cached .so under
~/.cache) and falls back to the numpy implementations transparently if no
compiler is available. The numpy paths remain the reference implementations;
tests assert numerical agreement.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

from ..utils.logging import log

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")
_SRC = os.path.join(_NATIVE_DIR, "audio_dsp.cpp")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_lib() -> Optional[str]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(os.path.expanduser("~/.cache/qwen3_asr_tpu"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"libaudiodsp-{digest}.so")
    if os.path.exists(so_path):
        return so_path
    # Per-process tmp name: gateway/worker splits build concurrently on a
    # cold cache, and a shared tmp would interleave g++ outputs and publish
    # a corrupt ELF under the digest-keyed name forever.
    tmp = f"{so_path}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)  # atomic last-writer-wins, both identical
        return so_path
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        log.warning("native audio DSP build failed ({}); using numpy paths", e)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.getenv("ASR_DISABLE_NATIVE", "").lower() == "true":
        return None
    so_path = _build_lib()
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as e:
        # A corrupt cached .so must degrade to the numpy paths (and clear
        # itself for the next run), not 500 the first audio decode.
        log.warning("native audio DSP load failed ({}); rebuilding next "
                    "run, numpy paths for now", e)
        try:
            os.unlink(so_path)
        except OSError:
            pass
        return None
    i64, i32 = ctypes.c_int64, ctypes.c_int
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    lib.pcm16_to_f32.argtypes = [i16p, i64, f32p]
    lib.f32_to_pcm16.argtypes = [f32p, i64, i16p]
    lib.interleaved_to_mono.argtypes = [f32p, i64, i32, f32p]
    lib.fir_same.argtypes = [f32p, i64, f32p, i32, f32p]
    lib.resample_poly.argtypes = [f32p, i64, i32, i32, f32p, i32, f32p, i64]
    lib.frame_rms.argtypes = [f32p, i64, i32, i32, f32p, i64]
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.flac_rice_decode.argtypes = [u8p, i64, i64, i64, i32, i64p]
    lib.flac_rice_decode.restype = i64
    lib.flac_raw_decode.argtypes = [u8p, i64, i64, i64, i32, i64p]
    lib.flac_raw_decode.restype = i64
    lib.flac_predict.argtypes = [i64p, i64, i32p, i32, i32]
    _lib = lib
    log.info("native audio DSP loaded: {}", so_path)
    return _lib


def native_available() -> bool:
    return get_lib() is not None


# --- typed wrappers (numpy in/out, fallback to pure numpy) --------------------

def pcm16_to_f32(pcm: bytes | np.ndarray) -> np.ndarray:
    x = np.frombuffer(pcm, dtype=np.int16) if isinstance(pcm, (bytes, bytearray)) \
        else np.ascontiguousarray(pcm, dtype=np.int16)
    lib = get_lib()
    if lib is None:
        return x.astype(np.float32) / 32768.0
    out = np.empty(len(x), np.float32)
    lib.pcm16_to_f32(x, len(x), out)
    return out


def f32_to_pcm16(audio: np.ndarray) -> bytes:
    x = np.ascontiguousarray(audio, dtype=np.float32)
    lib = get_lib()
    if lib is None:
        return np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes()
    out = np.empty(len(x), np.int16)
    lib.f32_to_pcm16(x, len(x), out)
    return out.tobytes()


def fir_same(x: np.ndarray, h: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.float32)
    h = np.ascontiguousarray(h, dtype=np.float32)
    lib = get_lib()
    if lib is None:
        pad = (len(h) - 1) // 2
        return np.convolve(np.pad(x, (pad, pad)), h, mode="valid").astype(
            np.float32)
    out = np.empty(len(x), np.float32)
    lib.fir_same(x, len(x), h, len(h), out)
    return out


def resample_poly(x: np.ndarray, up: int, down: int,
                  h: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.float32)
    h = np.ascontiguousarray(h, dtype=np.float32)
    n_out = int(np.ceil(len(x) * up / down))
    lib = get_lib()
    if lib is None:
        # Vectorized true polyphase — O(n_out · taps/up), same arithmetic
        # as the C++ kernel (only live taps touch real samples). A dense
        # zero-stuff + convolve would pay ~up² more work, which for odd
        # rate pairs (11025→16000 ⇒ up=640) is catastrophic. Output is
        # computed in blocks: the [block, taps_pp] index/product temporaries
        # would otherwise reach gigabytes for minutes-long audio.
        pad = (len(h) - 1) // 2
        taps_pp = -(-len(h) // up)
        out = np.empty(n_out, np.float32)
        block = max(1, (1 << 22) // max(taps_pp, 1))  # ~4M temp elements
        j = np.arange(taps_pp, dtype=np.int64) * up
        for lo in range(0, n_out, block):
            hi = min(lo + block, n_out)
            p = np.arange(lo, hi, dtype=np.int64) * down - pad
            k = ((-p) % up)[:, None] + j
            src = (p[:, None] + k) // up
            valid = (k < len(h)) & (src >= 0) & (src < len(x))
            prod = np.where(valid,
                            x[np.clip(src, 0, len(x) - 1)]
                            * h[np.minimum(k, len(h) - 1)], np.float32(0))
            out[lo:hi] = prod.sum(axis=1)
        return out
    out = np.empty(n_out, np.float32)
    lib.resample_poly(x, len(x), up, down, h, len(h), out, n_out)
    return out


def frame_rms(x: np.ndarray, frame: int = 400, hop: int = 160) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.float32)
    n_frames = max(0, 1 + (len(x) - frame) // hop) if len(x) >= frame else 0
    if n_frames == 0:
        return np.zeros(0, np.float32)
    lib = get_lib()
    if lib is None:
        idx = np.arange(n_frames)[:, None] * hop + np.arange(frame)[None, :]
        return np.sqrt(np.mean(x[idx] ** 2, axis=1)).astype(np.float32)
    out = np.empty(n_frames, np.float32)
    lib.frame_rms(x, len(x), frame, hop, out, n_frames)
    return out
