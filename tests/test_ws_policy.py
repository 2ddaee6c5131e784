"""WS streaming-mode policy (config.resolve_ws_mode).

Round-4 verdict #3: mode selection was operator homework (raw env flags
+ a doc table) even though the server knows the window cap and session
count and the crossovers are measured (docs/SCALING.md). Contract under
test: the auto policy picks the measured-best mode, the legacy flags
(ASR_WS_PREFIX_CACHE / ASR_WS_TICK_BATCH) keep meaning exactly what they
meant, ASR_WS_STREAM_MODE names a mode explicitly, and warmup covers
every mode the policy can pick at the configured cap.
"""
import pytest

from qwen3_asr_tpu.config import (WsMode, resolve_ws_mode,
                                  ws_warmup_profile, _check_ws_stream_mode)

LEGACY = ("ASR_WS_PREFIX_CACHE", "ASR_WS_TICK_BATCH", "ASR_WS_STREAM_MODE",
          "ASR_WS_GROUP_MIN_CAP_S", "ASR_WS_TICK_MIN_SESSIONS",
          "WS_WINDOW_MAX_S")


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    for var in LEGACY:
        monkeypatch.delenv(var, raising=False)


# ── auto policy: the measured crossovers ────────────────────────────────────

@pytest.mark.parametrize("cap,sessions,expected", [
    (6.0, 1, "solo"),      # short cap, lone session: best latency
    (6.0, 2, "solo"),      # below the >2-sessions tick recommendation
    (6.0, 3, "tick"),      # tick batching: ~2-2.5x device at concurrency
    (6.0, 16, "tick"),
    (16.0, 1, "prefix"),   # long cap: flat cached-encoder ticks
    (16.0, 3, "grouped"),  # long cap + concurrency: 3-5.5x measured
    (30.0, 8, "grouped"),
    (10.0, 1, "prefix"),   # crossover boundary is inclusive
    (9.9, 1, "solo"),
])
def test_auto_policy(cap, sessions, expected):
    mode = resolve_ws_mode(cap, sessions)
    assert mode.name == expected
    assert mode == WsMode.named(expected)


def test_auto_thresholds_tunable(monkeypatch):
    monkeypatch.setenv("ASR_WS_GROUP_MIN_CAP_S", "5")
    assert resolve_ws_mode(6.0, 1).name == "prefix"
    monkeypatch.setenv("ASR_WS_TICK_MIN_SESSIONS", "2")
    assert resolve_ws_mode(6.0, 2).name == "grouped"


# ── explicit mode wins over everything ──────────────────────────────────────

@pytest.mark.parametrize("name,prefix,tick", [
    ("solo", False, False), ("tick", False, True),
    ("prefix", True, False), ("grouped", True, True),
])
def test_explicit_mode(monkeypatch, name, prefix, tick):
    monkeypatch.setenv("ASR_WS_STREAM_MODE", name)
    # Legacy flags present too: the named mode still wins.
    monkeypatch.setenv("ASR_WS_PREFIX_CACHE", "true")
    for cap, sessions in [(6.0, 1), (30.0, 16)]:
        mode = resolve_ws_mode(cap, sessions)
        assert (mode.prefix, mode.tick, mode.name) == (prefix, tick, name)


def test_explicit_auto_is_policy(monkeypatch):
    monkeypatch.setenv("ASR_WS_STREAM_MODE", "auto")
    assert resolve_ws_mode(6.0, 1).name == "solo"
    assert resolve_ws_mode(30.0, 8).name == "grouped"


# ── legacy flags reproduce round-4 behavior exactly ─────────────────────────

@pytest.mark.parametrize("pc,tb,expected", [
    ("true", None, "prefix"),
    (None, "true", "tick"),
    ("true", "true", "grouped"),
    ("false", "false", "solo"),
    ("false", None, "solo"),   # set-but-false is an explicit opt-out
])
def test_legacy_flags(monkeypatch, pc, tb, expected):
    if pc is not None:
        monkeypatch.setenv("ASR_WS_PREFIX_CACHE", pc)
    if tb is not None:
        monkeypatch.setenv("ASR_WS_TICK_BATCH", tb)
    # Session count / cap must NOT matter: the operator said what they meant.
    for cap, sessions in [(6.0, 1), (30.0, 16)]:
        assert resolve_ws_mode(cap, sessions).name == expected


# ── warmup profile: the union of reachable modes ────────────────────────────

def test_warmup_profile_auto_short_cap(monkeypatch):
    monkeypatch.setenv("WS_WINDOW_MAX_S", "6.0")
    assert {m.name for m in ws_warmup_profile()} == {"solo", "tick"}


def test_warmup_profile_auto_long_cap(monkeypatch):
    monkeypatch.setenv("WS_WINDOW_MAX_S", "16.0")
    assert {m.name for m in ws_warmup_profile()} == {"prefix", "grouped"}


def test_warmup_profile_explicit_collapses(monkeypatch):
    monkeypatch.setenv("ASR_WS_STREAM_MODE", "grouped")
    assert [m.name for m in ws_warmup_profile()] == ["grouped"]
    monkeypatch.setenv("ASR_WS_STREAM_MODE", "solo")
    assert [m.name for m in ws_warmup_profile()] == ["solo"]


def test_warmup_profile_legacy_collapses(monkeypatch):
    monkeypatch.setenv("ASR_WS_TICK_BATCH", "true")
    assert [m.name for m in ws_warmup_profile()] == ["tick"]


# ── validation ───────────────────────────────────────────────────────────────

def test_stream_mode_validator(monkeypatch):
    monkeypatch.setenv("ASR_WS_STREAM_MODE", "warp9")
    assert "ASR_WS_STREAM_MODE" in _check_ws_stream_mode()
    for ok in ("", "auto", "solo", "tick", "prefix", "grouped", "GROUPED"):
        monkeypatch.setenv("ASR_WS_STREAM_MODE", ok)
        assert _check_ws_stream_mode() is None
