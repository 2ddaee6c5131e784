"""Learned-VAD quality gates (VERDICT r2 item 8).

The packaged weights (audio/vad_weights.npz, tools/train_vad.py) must hold
a <1% mid-speech false-silence rate on sliding 1 s windows over the real
FLEURS clips — the regime whose 6.4% spectral-VAD flap rate forced the
2-tick flush debounce — with zero speech-positives on the synthetic
negative families. With that met, the WS flush debounce default returns
to the reference's 1-chunk trigger (src/server.py:1216-1243).

Measured at training time (2026-08): 0.0% flap on all 12 clips (two held
out from training), 0.0% train FP/FN after margin calibration.
"""
import os
import wave
from pathlib import Path

import numpy as np
import pytest

from qwen3_asr_tpu.audio import vad, vad_model

REAL_DIR = Path(os.getenv(
    "ASR_REAL_SPEECH_DIR",
    str(Path(__file__).parent.parent / "e2e" / "data" / "real")))

pytestmark = pytest.mark.skipif(
    vad_model.load_params() is None, reason="no packaged VAD weights")


def _load_wav(path: Path) -> np.ndarray:
    with wave.open(str(path), "rb") as w:
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        return pcm.astype(np.float32) / 32768.0


def test_learned_backend_active():
    assert vad.active_backend() == "learned"
    assert vad.default_flush_ticks() == 1


def test_spectral_opt_out(monkeypatch):
    monkeypatch.setenv("ASR_VAD", "spectral")
    assert vad.active_backend() == "spectral"
    assert vad.default_flush_ticks() == 2


@pytest.mark.skipif(not REAL_DIR.is_dir(), reason="fixtures absent")
def test_mid_speech_flap_rate_below_one_percent():
    """Sliding 1 s windows (0.1 s hop) over the loudest 6 s of every real
    clip: ≥99% must gate speech — the bar that lets the flush debounce
    default back to the reference's single silent tick."""
    sr = 16000
    total = flapped = 0
    for wav in sorted(REAL_DIR.glob("*.wav")):
        audio = _load_wav(wav)
        win6 = 6 * sr
        if len(audio) > win6:
            rms = np.convolve(audio ** 2, np.ones(1600) / 1600, "same")
            centers = np.arange(0, len(audio) - win6, 1600)
            best = centers[int(np.argmax(
                [rms[c:c + win6].mean() for c in centers]))]
            audio = audio[best:best + win6]
        clip_flaps = 0
        for start in range(0, len(audio) - sr, 1600):
            total += 1
            if not vad.is_speech(audio[start:start + sr]):
                flapped += 1
                clip_flaps += 1
        assert clip_flaps <= 1, f"{wav.name}: {clip_flaps} flapped windows"
    assert total >= 500
    assert flapped / total < 0.01, f"flap rate {flapped}/{total}"


def test_negative_families_stay_silent():
    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    from util_audio import silence, tone, white_noise
    rng = np.random.default_rng(7)
    negatives = [
        silence(1.0), silence(0.45),
        white_noise(1.0, amplitude=0.01, seed=3),
        white_noise(1.0, amplitude=0.3, seed=4),
        tone(1.0, 440.0), tone(1.0, 1000.0, amplitude=0.8),
        (0.3 * np.sin(2 * np.pi * 50 *
                      np.linspace(0, 1, 16000))).astype(np.float32),
        (0.05 * rng.standard_normal(7200)).astype(np.float32),
    ]
    for i, neg in enumerate(negatives):
        assert not vad.is_speech(neg), f"negative family {i} gated as speech"


def test_short_streaming_tail_shapes():
    """The 450 ms tail and 1 s window shapes the WS engine feeds."""
    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    from util_audio import silence, speech_like
    for dur in (0.45, 1.0):
        assert vad.is_speech(speech_like(dur, seed=11))
        assert not vad.is_speech(silence(dur))
