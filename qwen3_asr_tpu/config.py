"""Environment configuration: tuning constants + fail-fast startup validation.

Env-var surface parity with the reference deployment (src/config.py,
.env.example there), with CUDA-specific flags accepted and mapped to TPU
equivalents (SURVEY.md §7.1):

* ``USE_CUDA_GRAPHS=true``  -> warmup sweep over all jit length buckets
* ``QUANTIZE=int8|fp8|int4`` -> native JAX weight-only quantization
* ``ONNX_ENCODER_PATH`` / ``TRT_ENCODER_PATH`` -> accepted, logged no-ops
  (the jitted XLA encoder is already a compiled engine)
* ``USE_GRANIAN``           -> n/a (aiohttp serves in-process)

Three config tiers, as in the reference: (1) validated-fatal at startup,
(2) safe-parsed tuning constants with default fallback, (3) point-of-use
feature flags.
"""
from __future__ import annotations

import os
import sys
from typing import NamedTuple

from .utils.logging import log

DEFAULT_MODEL_ID = "Qwen/Qwen3-ASR-1.7B"
DEFAULT_FAST_MODEL_ID = "Qwen/Qwen3-ASR-0.6B"

# Model input sample rate.
TARGET_SR = 16000


def _safe_parse(name: str, default: str, cast):
    raw = os.getenv(name, default)
    try:
        return cast(raw)
    except ValueError:
        kind = "a float" if cast is float else "an integer"
        log.error("Config error: {} must be {}, got '{}' — using default {}",
                  name, kind, raw, default)
        return cast(default)


def _safe_float(name: str, default: str) -> float:
    return _safe_parse(name, default, float)


def _safe_int(name: str, default: str) -> int:
    return _safe_parse(name, default, int)


def _safe_bool(name: str, default: str = "false") -> bool:
    return os.getenv(name, default).lower() in ("true", "1", "yes")


# --- Tier-2 tuning constants (same names/defaults as the reference) ---------
TRANSLATE_TEMPERATURE = _safe_float("TRANSLATE_TEMPERATURE", "0.3")
TRANSLATE_SRT_TEMPERATURE = _safe_float("TRANSLATE_SRT_TEMPERATURE", "0.1")
SSE_CHUNK_SECONDS = _safe_int("SSE_CHUNK_SECONDS", "5")
SSE_OVERLAP_SECONDS = _safe_int("SSE_OVERLAP_SECONDS", "1")
SUBTITLE_MAX_DURATION = _safe_float("SUBTITLE_MAX_DURATION", "7.0")
SUBTITLE_PAUSE_THRESHOLD = _safe_float("SUBTITLE_PAUSE_THRESHOLD", "0.5")
SUBTITLE_MIN_DURATION = _safe_float("SUBTITLE_MIN_DURATION", "0.833")
SUBTITLE_MIN_GAP = _safe_float("SUBTITLE_MIN_GAP", "0.083")

_LOG_LEVELS = {"TRACE", "DEBUG", "INFO", "WARNING", "WARN", "ERROR",
               "CRITICAL", "FATAL"}
_LOG_ALIASES = {"WARN": "WARNING", "FATAL": "CRITICAL"}
_QUANTIZE_MODES = {"", "int8", "fp8", "int4"}


# --- Tier-1 fail-fast validation ---------------------------------------------
# Each rule returns an error string or None; ALL errors are collected before
# exit (operators see every problem at once, matching reference semantics).

def _check_model_id():
    if not os.getenv("MODEL_ID", ""):
        return "MODEL_ID is required but empty or unset"


def _check_request_timeout():
    try:
        value = int(os.getenv("REQUEST_TIMEOUT", "300"))
    except ValueError as e:
        return f"REQUEST_TIMEOUT must be an integer: {e}"
    if value <= 0:
        return f"REQUEST_TIMEOUT must be positive, got {value}"


def _check_idle_timeout():
    try:
        value = int(os.getenv("IDLE_TIMEOUT", "120"))
    except ValueError as e:
        return f"IDLE_TIMEOUT must be an integer: {e}"
    if value < 0:
        return f"IDLE_TIMEOUT must be non-negative, got {value}"


def _check_log_level():
    level = os.getenv("LOG_LEVEL", "info").upper()
    level = _LOG_ALIASES.get(level, level)
    if level not in _LOG_LEVELS:
        return f"LOG_LEVEL must be one of {_LOG_LEVELS}, got '{level}'"


def _check_quantize():
    mode = os.getenv("QUANTIZE", "")
    if mode not in _QUANTIZE_MODES:
        return f"QUANTIZE must be one of {_QUANTIZE_MODES}, got '{mode}'"


def _check_worker_port():
    if os.getenv("GATEWAY_MODE", "false").lower() != "true":
        return None
    try:
        port = int(os.getenv("WORKER_PORT", "8001"))
    except ValueError as e:
        return f"WORKER_PORT must be an integer: {e}"
    if not 1 <= port <= 65535:
        return f"WORKER_PORT must be 1-65535, got {port}"


def _check_worker_fleet():
    """WORKER_PORTS / WORKER_HOSTS (gateway fleet, docs/MULTIHOST.md):
    malformed entries must fail startup, not the first routed request.
    Unlike WORKER_PORT this is NOT gated on GATEWAY_MODE — the gateway
    entrypoint can run without the flag, and these vars only exist for
    the fleet, so validating them whenever set is always right."""
    for p in os.getenv("WORKER_PORTS", "").split(","):
        p = p.strip()
        if not p:
            continue
        if not p.isdigit() or not 1 <= int(p) <= 65535:
            return f"WORKER_PORTS entries must be ports 1-65535, got {p!r}"
    for spec in os.getenv("WORKER_HOSTS", "").split(","):
        spec = spec.strip()
        if not spec:
            continue
        host, _, port = spec.partition(":")
        if not host:
            return f"WORKER_HOSTS entries must be host[:port], got {spec!r}"
        if port and (not port.isdigit() or not 1 <= int(port) <= 65535):
            return (f"WORKER_HOSTS port must be 1-65535, got {port!r} "
                    f"in {spec!r}")


def _check_ws_window():
    try:
        value = float(os.getenv("WS_WINDOW_MAX_S", "6.0"))
    except ValueError as e:
        return f"WS_WINDOW_MAX_S must be a float: {e}"
    if value <= 0:
        return f"WS_WINDOW_MAX_S must be positive, got {value}"


def _check_max_sessions():
    raw = os.getenv("ASR_MAX_SESSIONS", "0") or "0"
    try:
        value = int(raw)
    except ValueError as e:
        return f"ASR_MAX_SESSIONS must be an integer: {e}"
    if value < 0:
        return f"ASR_MAX_SESSIONS must be >= 0 (0 = unlimited), got {value}"


_WS_STREAM_MODES = {"", "auto", "solo", "tick", "prefix", "grouped"}


def _check_ws_stream_mode():
    mode = os.getenv("ASR_WS_STREAM_MODE", "").lower()
    if mode not in _WS_STREAM_MODES:
        return (f"ASR_WS_STREAM_MODE must be one of "
                f"{sorted(_WS_STREAM_MODES - {''})}, got {mode!r}")


_VALIDATORS = (_check_model_id, _check_request_timeout, _check_idle_timeout,
               _check_log_level, _check_quantize, _check_worker_port,
               _check_worker_fleet, _check_ws_window, _check_max_sessions,
               _check_ws_stream_mode)


# ── WS streaming-mode policy ─────────────────────────────────────────────────
#
# Four streaming modes exist (docs/SCALING.md has the measured tables):
#   solo     — per-session fused resume decode.  Best single-session latency.
#   tick     — cross-session tick batching (one batched dispatch per cadence).
#              ~2-2.5x device win at >=8 sessions; a lone session pays the
#              collection window for nothing.
#   prefix   — per-session encoder-block cache + persistent KV.  Flat ticks
#              as the window cap grows (29-36 ms at 30 s vs 63 ms re-encode);
#              a 0.79x REGRESSION at 6 s caps (cache bookkeeping > re-encode).
#   grouped  — prefix + tick combined (pooled-cache StreamGroup).  3-5.5x at
#              >=16 s caps; same short-cap regression as prefix.
#
# The measured crossover where cached-encoder modes start winning is ~10 s
# (SCALING.md "crossover" section).  resolve_ws_mode turns those numbers into
# a server-side policy so operators are not doing flag homework; the legacy
# env flags and ASR_WS_STREAM_MODE remain explicit overrides.

class WsMode(NamedTuple):
    prefix: bool     # bind a StreamSession (cached encoder blocks + KV)
    tick: bool       # coalesce concurrent sessions' ticks into one dispatch
    name: str        # solo | tick | prefix | grouped

    @classmethod
    def named(cls, name: str) -> "WsMode":
        return cls(prefix=name in ("prefix", "grouped"),
                   tick=name in ("tick", "grouped"), name=name)


def resolve_ws_mode(cap_s: float, sessions: int) -> WsMode:
    """Pick the WS streaming mode for a new connection.

    Replaces the reference's one-mode-fits-all per-tick recompute
    (reference src/server.py:1295-1375) AND the round-4 raw-env-flag
    selection.  Priority:

    1. ``ASR_WS_STREAM_MODE`` names a mode explicitly (auto = policy).
    2. Legacy flags ``ASR_WS_PREFIX_CACHE`` / ``ASR_WS_TICK_BATCH``, if
       either is set (non-empty), reproduce the round-4 behavior exactly —
       existing deployments and e2e scripts keep meaning what they said.
    3. Auto policy from the measured crossovers:
       cap >= ASR_WS_GROUP_MIN_CAP_S (default 10 s)  → prefix-cached modes
       (grouped when concurrency warrants batching, prefix-solo otherwise);
       below the crossover → tick batching at >= ASR_WS_TICK_MIN_SESSIONS
       concurrent sessions (default 3), solo resume for lone sessions.

    ``sessions`` is the concurrent-session count INCLUDING the new one.
    The mode is fixed per connection (cache state binds to it); later
    connections see the grown count, so a fleet ramping past the threshold
    converges to batched modes connection by connection.
    """
    explicit = os.getenv("ASR_WS_STREAM_MODE", "").lower()
    if explicit and explicit != "auto":
        return WsMode.named(explicit)
    legacy_prefix = os.getenv("ASR_WS_PREFIX_CACHE")
    legacy_tick = os.getenv("ASR_WS_TICK_BATCH")
    if not explicit and (legacy_prefix is not None
                         or legacy_tick is not None):
        prefix = (legacy_prefix or "").lower() == "true"
        tick = (legacy_tick or "").lower() == "true"
        return WsMode(prefix, tick,
                      {(False, False): "solo", (False, True): "tick",
                       (True, False): "prefix", (True, True): "grouped"}
                      [(prefix, tick)])
    min_cap = _safe_float("ASR_WS_GROUP_MIN_CAP_S", "10.0")
    min_sessions = _safe_int("ASR_WS_TICK_MIN_SESSIONS", "3")
    batch = sessions >= min_sessions
    if cap_s >= min_cap:
        return WsMode.named("grouped" if batch else "prefix")
    return WsMode.named("tick" if batch else "solo")


def ws_warmup_profile() -> list:
    """Modes the warmup sweep should precompile executables for.

    At load time the concurrent-session count is unknown, so under the
    auto policy warmup paces the UNION of modes resolve_ws_mode can pick
    at the configured window cap (both branches of the session-count
    threshold).  Explicit/legacy configurations warm exactly their one
    mode, as in round 4.
    """
    cap = _safe_float("WS_WINDOW_MAX_S", "6.0")
    lone = resolve_ws_mode(cap, 1)            # explicit/legacy configs
    busy = resolve_ws_mode(cap, 10 ** 9)      # resolve identically here
    return [lone] if lone == busy else [lone, busy]


def validate_env() -> None:
    """Validate critical env vars at startup; exit(1) listing ALL problems."""
    errors = [err for err in (rule() for rule in _VALIDATORS) if err]
    if errors:
        for err in errors:
            log.error("Config validation failed: {}", err)
        sys.exit(1)

    # CUDA-era flags: accepted, mapped, and logged so operators see the
    # translation to TPU behavior.
    if _safe_bool("USE_CUDA_GRAPHS"):
        log.info("USE_CUDA_GRAPHS=true mapped to TPU warmup sweep over jit buckets")
    for flag in ("ONNX_ENCODER_PATH", "TRT_ENCODER_PATH"):
        if os.getenv(flag, ""):
            log.info("{} set: ignored on TPU — the jitted XLA encoder is already "
                     "a compiled engine (pluggable encoder seam available)", flag)
    if _safe_bool("USE_GRANIAN"):
        log.info("USE_GRANIAN=true: n/a — this build serves HTTP/WS/SSE on "
                 "aiohttp in-process (no ASGI server layer)")

    log.info("Config validation passed")
