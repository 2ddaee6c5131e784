"""Golden tests: JAX log-mel vs transformers WhisperFeatureExtractor;
resampler vs scipy.resample_poly; FIR bandpass frequency response."""
import numpy as np
import pytest

from qwen3_asr_tpu.audio.frontend import Bandpass, LogMelFrontend, num_frames
from qwen3_asr_tpu.audio.mel import mel_filter_bank
from qwen3_asr_tpu.audio.resample import resample, resample_pcm_bytes
from tests.util_audio import speech_like, tone, white_noise


def test_mel_filterbank_matches_hf():
    from transformers.audio_utils import mel_filter_bank as hf_mel
    ours = mel_filter_bank(201, 128, 0.0, 8000.0, 16000)
    theirs = hf_mel(
        num_frequency_bins=201, num_mel_filters=128, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney",
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("dur", [0.5, 2.0])
def test_log_mel_matches_whisper_extractor(dur):
    from transformers import WhisperFeatureExtractor
    fe = WhisperFeatureExtractor(feature_size=128)
    audio = speech_like(dur, seed=3)

    frontend = LogMelFrontend(n_mels=128)
    ours, valid = frontend(audio)
    ours = np.asarray(ours)

    out = fe(audio, sampling_rate=16000, padding=False,
             return_tensors="np")
    theirs = out["input_features"][0]  # [128, T]

    t = min(ours.shape[1], theirs.shape[1])
    assert abs(ours.shape[1] - theirs.shape[1]) <= 1
    # fp32 pipeline vs HF's fp64 numpy path: ~1e-3 agreement is bit-for-bit
    # modulo precision.
    np.testing.assert_allclose(ours[:, :t], theirs[:, :t], atol=3e-3)


def test_log_mel_bucket_padding_invariant():
    """Padding audio to a larger bucket must not change the valid frames."""
    audio = speech_like(1.0, seed=1)
    frontend = LogMelFrontend(n_mels=128)
    exact, v1 = frontend(audio)
    padded = np.pad(audio, (0, 16000))  # pad 1s of zeros
    padded_mel, v2 = frontend(padded, n_valid=len(audio))
    assert int(v1) == int(v2)
    # Tail frames differ by design: the unpadded call reflect-pads the clip
    # end (whisper semantics for a full clip) while the bucketed call sees
    # following zeros (whisper semantics for audio inside a padded clip).
    t = int(v1) - 3
    np.testing.assert_allclose(np.asarray(exact)[:, :t],
                               np.asarray(padded_mel)[:, :t], atol=3e-3)


def test_num_frames():
    assert num_frames(16000) == 100
    assert num_frames(480000) == 3000


def test_resample_matches_scipy():
    from scipy.signal import resample_poly
    audio = speech_like(1.0, sr=8000, seed=2)
    ours = resample(audio, 8000, 16000)
    theirs = resample_poly(audio.astype(np.float64), 2, 1)
    assert len(ours) == len(theirs)
    # Interior agreement (edges differ by padding mode)
    err = np.abs(ours[100:-100] - theirs[100:-100])
    assert err.max() < 5e-3  # fp32 filter vs scipy's fp64
    assert err.mean() < 5e-4


def test_resample_pcm_bytes_roundtrip():
    audio = tone(0.5, 440.0, sr=8000)
    pcm8k = np.clip(audio * 32767, -32768, 32767).astype(np.int16).tobytes()
    pcm16k = resample_pcm_bytes(pcm8k, 8000, 16000)
    assert len(pcm16k) == 2 * len(pcm8k)
    out = np.frombuffer(pcm16k, dtype=np.int16).astype(np.float32) / 32768.0
    # A 440 Hz tone must survive resampling with its RMS roughly intact
    assert abs(np.sqrt(np.mean(out[200:-200] ** 2)) -
               np.sqrt(np.mean(audio ** 2))) < 0.02


def test_resample_identity():
    audio = tone(0.1)
    assert np.array_equal(resample(audio, 16000, 16000), audio)


def _tone_gain(bp, freq):
    x = tone(0.5, freq, amplitude=0.5)
    y = np.asarray(bp(x))
    return np.sqrt(np.mean(y[2000:-2000] ** 2)) / np.sqrt(np.mean(x[2000:-2000] ** 2))


def test_bandpass_response():
    bp = Bandpass()
    assert 0.7 < _tone_gain(bp, 1000.0) < 1.3      # passband ~unity
    assert _tone_gain(bp, 100.0) < 0.1             # stopband low
    assert _tone_gain(bp, 5000.0) < 0.1            # stopband high


def test_bandpass_removes_dc():
    bp = Bandpass()
    x = np.ones(8000, dtype=np.float32) * 0.5
    y = np.asarray(bp(x))
    assert np.abs(y[1000:-1000]).max() < 0.01


def test_streaming_resampler_matches_oneshot():
    """Frame-by-frame streaming resample must equal whole-stream resample
    in the interior (no per-frame seam artifacts)."""
    from qwen3_asr_tpu.audio.resample import StreamingResampler, resample
    audio = speech_like(1.2, sr=8000, seed=9)
    oneshot = resample(audio, 8000, 16000)

    sr = StreamingResampler(8000, 16000)
    out = []
    rng = np.random.default_rng(0)
    pos = 0
    while pos < len(audio):
        n = int(rng.integers(160, 800))  # 20-100ms frames
        out.append(sr.process(audio[pos:pos + n]))
        pos += n
    streamed = np.concatenate(out)

    n = len(streamed)
    assert n >= len(oneshot) - 200  # only the tail group delay is held back
    np.testing.assert_allclose(streamed[200:n - 200],
                               oneshot[200:n - 200], atol=2e-4)
