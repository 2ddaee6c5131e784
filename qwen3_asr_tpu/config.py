"""Environment configuration: tuning constants + fail-fast startup validation.

Env-var surface parity with the reference (src/config.py:7-97 and
.env.example), with CUDA-specific flags accepted and mapped to their TPU
equivalents (SURVEY.md §7.1):

* ``USE_CUDA_GRAPHS=true``  -> warmup sweep over all jit length buckets
* ``QUANTIZE=int8|fp8``     -> native JAX int8 weight-only / fp8 paths
* ``ONNX_ENCODER_PATH`` / ``TRT_ENCODER_PATH`` -> accepted, logged as no-ops
  (the jitted XLA encoder is already a compiled engine; a pluggable
  encoder-fn seam exists on the model for alternative backends)

Three config tiers, as in the reference:
1. validated-fatal at startup (``validate_env``),
2. safe-parsed tuning constants with default fallback,
3. read-at-point-of-use feature flags via ``os.getenv``.
"""
from __future__ import annotations

import os
import sys

from .utils.logging import log

DEFAULT_MODEL_ID = "Qwen/Qwen3-ASR-1.7B"
DEFAULT_FAST_MODEL_ID = "Qwen/Qwen3-ASR-0.6B"

# Target sample rate expected by the model (reference: src/server.py:129)
TARGET_SR = 16000


def _safe_float(name: str, default: str) -> float:
    raw = os.getenv(name, default)
    try:
        return float(raw)
    except ValueError:
        log.error("Config error: {} must be a float, got '{}' — using default {}",
                  name, raw, default)
        return float(default)


def _safe_int(name: str, default: str) -> int:
    raw = os.getenv(name, default)
    try:
        return int(raw)
    except ValueError:
        log.error("Config error: {} must be an integer, got '{}' — using default {}",
                  name, raw, default)
        return int(default)


def _safe_bool(name: str, default: str = "false") -> bool:
    return os.getenv(name, default).lower() in ("true", "1", "yes")


# --- Tuning constants (tier 2; reference src/config.py:23-30) ---------------
TRANSLATE_TEMPERATURE = _safe_float("TRANSLATE_TEMPERATURE", "0.3")
TRANSLATE_SRT_TEMPERATURE = _safe_float("TRANSLATE_SRT_TEMPERATURE", "0.1")
SSE_CHUNK_SECONDS = _safe_int("SSE_CHUNK_SECONDS", "5")
SSE_OVERLAP_SECONDS = _safe_int("SSE_OVERLAP_SECONDS", "1")
SUBTITLE_MAX_DURATION = _safe_float("SUBTITLE_MAX_DURATION", "7.0")
SUBTITLE_PAUSE_THRESHOLD = _safe_float("SUBTITLE_PAUSE_THRESHOLD", "0.5")
SUBTITLE_MIN_DURATION = _safe_float("SUBTITLE_MIN_DURATION", "0.833")
SUBTITLE_MIN_GAP = _safe_float("SUBTITLE_MIN_GAP", "0.083")

_VALID_LOG_LEVELS = {"TRACE", "DEBUG", "INFO", "WARNING", "WARN", "ERROR",
                     "CRITICAL", "FATAL"}
_VALID_QUANTIZE = {"", "int8", "fp8"}
_LOG_LEVEL_ALIASES = {"WARN": "WARNING", "FATAL": "CRITICAL"}


def validate_env() -> None:
    """Validate critical env vars at startup. Collects ALL errors, then exits.

    Mirrors reference behavior exactly (src/config.py:39-97).
    """
    errors = []

    model_id = os.getenv("MODEL_ID", "")
    if not model_id:
        errors.append("MODEL_ID is required but empty or unset")

    try:
        rt = int(os.getenv("REQUEST_TIMEOUT", "300"))
        if rt <= 0:
            errors.append(f"REQUEST_TIMEOUT must be positive, got {rt}")
    except ValueError as e:
        errors.append(f"REQUEST_TIMEOUT must be an integer: {e}")

    try:
        it = int(os.getenv("IDLE_TIMEOUT", "120"))
        if it < 0:
            errors.append(f"IDLE_TIMEOUT must be non-negative, got {it}")
    except ValueError as e:
        errors.append(f"IDLE_TIMEOUT must be an integer: {e}")

    log_level = os.getenv("LOG_LEVEL", "info").upper()
    log_level = _LOG_LEVEL_ALIASES.get(log_level, log_level)
    if log_level not in _VALID_LOG_LEVELS:
        errors.append(f"LOG_LEVEL must be one of {_VALID_LOG_LEVELS}, got '{log_level}'")

    quantize = os.getenv("QUANTIZE", "")
    if quantize not in _VALID_QUANTIZE:
        errors.append(f"QUANTIZE must be one of {_VALID_QUANTIZE}, got '{quantize}'")

    if os.getenv("GATEWAY_MODE", "false").lower() == "true":
        try:
            wp = int(os.getenv("WORKER_PORT", "8001"))
            if not (1 <= wp <= 65535):
                errors.append(f"WORKER_PORT must be 1-65535, got {wp}")
        except ValueError as e:
            errors.append(f"WORKER_PORT must be an integer: {e}")

    try:
        ws = float(os.getenv("WS_WINDOW_MAX_S", "6.0"))
        if ws <= 0:
            errors.append(f"WS_WINDOW_MAX_S must be positive, got {ws}")
    except ValueError as e:
        errors.append(f"WS_WINDOW_MAX_S must be a float: {e}")

    if errors:
        for err in errors:
            log.error("Config validation failed: {}", err)
        sys.exit(1)

    # CUDA-era flags: accepted and mapped to TPU equivalents, with a log line
    # so operators can see the translation.
    if os.getenv("USE_CUDA_GRAPHS", "").lower() == "true":
        log.info("USE_CUDA_GRAPHS=true mapped to TPU warmup sweep over jit buckets")
    for flag in ("ONNX_ENCODER_PATH", "TRT_ENCODER_PATH"):
        if os.getenv(flag, ""):
            log.info("{} set: ignored on TPU — the jitted XLA encoder is already "
                     "a compiled engine (pluggable encoder seam available)", flag)
    if os.getenv("USE_GRANIAN", "").lower() == "true":
        log.info("USE_GRANIAN=true: n/a — this build serves HTTP/WS/SSE on "
                 "aiohttp in-process (no ASGI server layer)")

    log.info("Config validation passed")
