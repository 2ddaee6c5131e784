"""FLAC codec tests: encoder↔decoder round trips + malformed input.

The decoder is the public-contract piece (reference accepts FLAC uploads
via libsndfile, src/server.py:200-203); the in-repo encoder generates
conforming streams that exercise every decoder path (fixed orders, rice
partitions, stereo decorrelation modes, 24-bit).
"""
import numpy as np
import pytest

from qwen3_asr_tpu.audio.codec import decode_audio
from qwen3_asr_tpu.audio.flac import FlacError, decode_flac, encode_flac


def _sine(n=8000, sr=16000, f=440.0):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def _speechish(n=12000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    x = np.zeros(n)
    for f, a in ((220, .3), (440, .2), (880, .1), (1760, .05)):
        x += a * np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
    x *= 0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t)  # syllable envelope
    x += rng.standard_normal(n) * 0.01
    return (x / np.abs(x).max() * 0.8).astype(np.float32)


def _assert_close(a, b, tol):
    assert len(a) == len(b)
    assert float(np.abs(a - b).max()) <= tol


TOL16 = 2.0 / 32768  # one quantization step of slack


def test_roundtrip_mono_sine():
    x = _sine()
    out, sr = decode_flac(encode_flac(x, 16000))
    assert sr == 16000
    _assert_close(out, np.clip(x, -1, 1), TOL16)


def test_roundtrip_mono_speechish():
    x = _speechish()
    out, sr = decode_flac(encode_flac(x, 16000))
    _assert_close(out, x, TOL16)


def test_roundtrip_silence_constant_subframe():
    x = np.zeros(5000, np.float32)
    out, _ = decode_flac(encode_flac(x, 16000))
    assert np.all(out == 0)


def test_roundtrip_noise():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(9000) * 0.3).astype(np.float32)
    out, _ = decode_flac(encode_flac(x, 16000))
    _assert_close(out, np.clip(x, -1, 1), TOL16)


def test_roundtrip_odd_length_and_blocksize():
    x = _speechish(4097 + 333, seed=2)
    out, _ = decode_flac(encode_flac(x, 8000, blocksize=1024))
    _assert_close(out, x, TOL16)


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side",
                                  "mid_side"])
def test_roundtrip_stereo_modes(mode):
    left = _speechish(8000, seed=3)
    right = _speechish(8000, seed=4) * 0.7
    stereo = np.stack([left, right], axis=1)
    data = encode_flac(None, 16000, stereo_mode=mode, channels=stereo)
    out, sr = decode_flac(data)
    expected = stereo.mean(axis=1)
    _assert_close(out, expected, TOL16 * 2)


def test_roundtrip_24bit():
    x = _speechish(6000, seed=5)
    out, _ = decode_flac(encode_flac(x, 16000, bps=24))
    _assert_close(out, x, 2.0 / (1 << 23))


def test_decode_audio_dispatches_flac():
    x = _sine(4000)
    out, sr = decode_audio(encode_flac(x, 16000))
    assert sr == 16000
    assert len(out) == 4000


def test_sample_rate_preserved():
    x = _sine(4410, sr=44100)
    _, sr = decode_flac(encode_flac(x, 44100))
    assert sr == 44100


def test_truncated_stream_raises():
    data = encode_flac(_sine(4000), 16000)
    with pytest.raises(FlacError):
        decode_flac(data[:30])


def test_garbage_after_magic_raises():
    with pytest.raises(FlacError):
        decode_flac(b"fLaC" + b"\x12" * 64)


def test_not_flac_raises():
    with pytest.raises(Exception):
        decode_flac(b"RIFFxxxxWAVE")
