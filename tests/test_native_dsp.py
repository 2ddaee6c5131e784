"""Native C++ DSP vs numpy reference implementations."""
import numpy as np
import pytest

from qwen3_asr_tpu.audio import native
from tests.util_audio import speech_like, tone


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.native_available():
        pytest.skip("no C++ toolchain available")


def test_pcm16_roundtrip():
    audio = speech_like(0.5, seed=0)
    pcm = native.f32_to_pcm16(audio)
    back = native.pcm16_to_f32(pcm)
    assert back.dtype == np.float32
    assert np.max(np.abs(back - audio)) < 1e-3


def test_pcm16_to_f32_matches_numpy():
    pcm = (np.random.default_rng(0).integers(-32768, 32767, 5000)
           .astype(np.int16))
    ours = native.pcm16_to_f32(pcm.tobytes())
    ref = pcm.astype(np.float32) / 32768.0
    np.testing.assert_array_equal(ours, ref)


def test_fir_same_matches_numpy():
    x = speech_like(0.3, seed=1)
    h = np.hamming(101).astype(np.float32)
    h /= h.sum()
    ours = native.fir_same(x, h)
    pad = 50
    ref = np.convolve(np.pad(x, (pad, pad)), h, mode="valid")
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resample_poly_matches_python():
    from qwen3_asr_tpu.audio.resample import _kaiser_lowpass
    x = speech_like(0.5, sr=8000, seed=2)
    h = _kaiser_lowpass(2, 1)
    ours = native.resample_poly(x, 2, 1, h)
    # numpy reference (zero-stuff + convolve)
    up_x = np.zeros(len(x) * 2, np.float32)
    up_x[::2] = x
    pad = (len(h) - 1) // 2
    ref = np.convolve(np.pad(up_x, (pad, pad)), h, mode="valid")[::1][
        :len(ours)]
    np.testing.assert_allclose(ours, ref[:len(ours)], atol=1e-4)


def test_resample_matches_jax_path():
    """Native polyphase must agree with the JAX resampler used on device."""
    from qwen3_asr_tpu.audio.resample import resample, _kaiser_lowpass
    x = speech_like(0.5, sr=8000, seed=3)
    jax_out = resample(x, 8000, 16000)
    native_out = native.resample_poly(x, 2, 1, _kaiser_lowpass(2, 1))
    assert len(jax_out) == len(native_out)
    np.testing.assert_allclose(native_out, jax_out, atol=1e-3)


def test_frame_rms():
    x = np.concatenate([np.zeros(400, np.float32),
                        0.5 * np.ones(400, np.float32)])
    rms = native.frame_rms(x, frame=400, hop=400)
    assert rms.shape == (2,)
    assert rms[0] == pytest.approx(0.0, abs=1e-6)
    assert rms[1] == pytest.approx(0.5, abs=1e-3)


def test_mono_mix():
    lib = native.get_lib()
    stereo = np.stack([np.ones(100), -np.ones(100)], axis=1).astype(
        np.float32).reshape(-1)
    out = np.empty(100, np.float32)
    lib.interleaved_to_mono(np.ascontiguousarray(stereo), 100, 2, out)
    np.testing.assert_allclose(out, np.zeros(100), atol=1e-7)
