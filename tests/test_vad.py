"""VAD behavior on the reference fixture families (E2Etest/utils/audio.py)."""
import numpy as np

from qwen3_asr_tpu.audio.vad import is_speech, speech_probability
from tests.util_audio import silence, speech_like, tone, white_noise


def test_silence_is_not_speech():
    assert not is_speech(silence(1.0))


def test_speech_like_is_speech():
    for seed in range(3):
        clip = speech_like(2.0, seed=seed)
        assert is_speech(clip), f"seed={seed} p={speech_probability(clip)}"


def test_white_noise_is_not_speech():
    assert not is_speech(white_noise(1.0, amplitude=0.3, seed=1))


def test_pure_tone_is_not_speech():
    # Unmodulated sine has no syllable rhythm.
    assert speech_probability(tone(1.0, 440.0)) < 0.6


def test_quiet_noise_is_not_speech():
    # The warmup-style 0.01-amplitude noise (reference src/server.py:351)
    assert not is_speech(white_noise(1.0, amplitude=0.01, seed=2))


def test_short_clip_no_crash():
    assert isinstance(is_speech(np.zeros(100, dtype=np.float32)), bool)


def test_speech_prob_monotone_vs_level():
    clip = speech_like(2.0, seed=0)
    loud = speech_probability(clip)
    assert loud > 0.5


def test_window_sized_input():
    """450ms buffer + 6s window shapes used by the WS engine."""
    for dur in (0.45, 6.0):
        clip = speech_like(dur, seed=4)
        assert is_speech(clip)
        assert not is_speech(silence(dur))
