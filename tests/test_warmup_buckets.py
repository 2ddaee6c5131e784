"""Warmup bucket policy (lifecycle._warmup_buckets).

Regression for the 2026-08-21 live finding: the old default warmed only
the smallest two buckets, so a paced WS session at the default 6 s cap
paid live executable loads (13-24 s over the tunnel) on its first
4 s / 6 s / flush-window ticks and the 450 ms cadence never recovered.
The default must cover every bucket a streaming session at
WS_WINDOW_MAX_S can touch — including the flush window's bucket
(cap + WS_FLUSH_SILENCE_MS of padded silence rounds UP the ladder).
Reference analogue: USE_CUDA_GRAPHS warmup, src/server.py:437-458.
"""
import pytest

from qwen3_asr_tpu.runtime.lifecycle import _warmup_buckets


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    for var in ("USE_CUDA_GRAPHS", "ASR_WARMUP_BUCKETS",
                "WS_WINDOW_MAX_S", "WS_FLUSH_SILENCE_MS"):
        monkeypatch.delenv(var, raising=False)


def test_default_covers_ws_ladder_at_6s_cap():
    # 6 s cap + 600 ms flush pad = 6.6 s -> the 10 s bucket.
    assert _warmup_buckets() == (1, 2, 4, 6, 10)


def test_default_follows_configured_cap(monkeypatch):
    monkeypatch.setenv("WS_WINDOW_MAX_S", "2.0")
    # 2 s cap + 0.6 s pad -> 4 s bucket.
    assert _warmup_buckets() == (1, 2, 4)


def test_flush_pad_growth_rounds_up(monkeypatch):
    monkeypatch.setenv("WS_WINDOW_MAX_S", "10.0")
    monkeypatch.setenv("WS_FLUSH_SILENCE_MS", "0")
    # No pad: the cap bucket itself closes the ladder.
    assert _warmup_buckets() == (1, 2, 4, 6, 10)
    monkeypatch.setenv("WS_FLUSH_SILENCE_MS", "600")
    assert _warmup_buckets() == (1, 2, 4, 6, 10, 15)


def test_use_cuda_graphs_sweeps_all(monkeypatch):
    from qwen3_asr_tpu.runtime.engine import AUDIO_BUCKETS_S
    monkeypatch.setenv("USE_CUDA_GRAPHS", "true")
    assert _warmup_buckets() == AUDIO_BUCKETS_S


def test_explicit_list_override(monkeypatch):
    monkeypatch.setenv("ASR_WARMUP_BUCKETS", "1,2")
    assert _warmup_buckets() == (1, 2)
    # Unknown entries are dropped; an all-unknown list falls back small.
    monkeypatch.setenv("ASR_WARMUP_BUCKETS", "3,7")
    assert _warmup_buckets() == (1, 2)


def test_cap_beyond_ladder_clamps(monkeypatch):
    monkeypatch.setenv("WS_WINDOW_MAX_S", "60.0")
    assert _warmup_buckets() == (1, 2, 4, 6, 10, 15, 20, 30)
