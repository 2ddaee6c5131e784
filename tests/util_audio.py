"""Synthetic audio fixtures mirroring the reference E2E generators
(E2Etest/utils/audio.py:10-58)."""
import numpy as np


def tone(duration_s=1.0, freq=440.0, sr=16000, amplitude=0.5):
    t = np.linspace(0, duration_s, int(sr * duration_s), endpoint=False)
    return (amplitude * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def silence(duration_s=1.0, sr=16000):
    return np.zeros(int(sr * duration_s), dtype=np.float32)


def white_noise(duration_s=1.0, sr=16000, amplitude=0.1, seed=0):
    rng = np.random.default_rng(seed)
    return (amplitude * rng.standard_normal(int(sr * duration_s))).astype(np.float32)


def speech_like(duration_s=2.0, sr=16000, seed=0):
    """Modulated formant-like signal (matches E2Etest/utils/audio.py:38-58)."""
    rng = np.random.default_rng(seed)
    n = int(sr * duration_s)
    t = np.linspace(0, duration_s, n, endpoint=False)
    signal = 0.05 * rng.standard_normal(n)
    for f in [150, 300, 600, 1200]:
        signal = signal + 0.1 * np.sin(2 * np.pi * f * t) * (
            0.5 + 0.5 * np.sin(2 * np.pi * 5 * t))
    signal = signal * (0.3 + 0.7 * np.abs(np.sin(2 * np.pi * 4 * t)))
    peak = np.abs(signal).max()
    return (signal / peak * 0.9).astype(np.float32)
