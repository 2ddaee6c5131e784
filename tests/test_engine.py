"""End-to-end engine tests on the tiny CPU checkpoint."""
import numpy as np
import pytest

from tests.fixtures import load_tiny_model, write_tiny_checkpoint
from tests.util_audio import speech_like, tone
from qwen3_asr_tpu.runtime.engine import (
    AUDIO_BUCKETS_S,
    TranscriptionEngine,
    max_new_tokens_for,
)


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "tiny"
    write_tiny_checkpoint(str(path))
    model = load_tiny_model(str(path))
    return TranscriptionEngine(model)


def test_transcribe_returns_result(engine):
    results = engine.transcribe(speech_like(1.0, seed=0), 16000, language="en")
    assert len(results) == 1
    r = results[0]
    assert isinstance(r.text, str)
    assert r.language == "en"
    assert r.start_time == 0.0
    assert abs(r.end_time - 1.0) < 0.01


def test_transcribe_deterministic(engine):
    a = engine.transcribe(speech_like(1.0, seed=1), 16000, language="en")
    b = engine.transcribe(speech_like(1.0, seed=1), 16000, language="en")
    assert a[0].text == b[0].text


def test_bucket_reuse_no_recompile(engine):
    """Different clips in the same bucket reuse one executable."""
    engine.transcribe(speech_like(0.8, seed=2), 16000)
    n = len(engine._generate_fns)
    engine.transcribe(speech_like(0.9, seed=3), 16000)
    engine.transcribe(tone(0.5), 16000)
    assert len(engine._generate_fns) == n


def test_language_change_no_recompile(engine):
    engine.transcribe(speech_like(0.5, seed=4), 16000, language="en")
    n = len(engine._generate_fns)
    engine.transcribe(speech_like(0.5, seed=4), 16000, language="zh")
    engine.transcribe(speech_like(0.5, seed=4), 16000, language=None)
    assert len(engine._generate_fns) == n


def test_empty_audio(engine):
    assert engine.transcribe(np.zeros(0, dtype=np.float32), 16000) == []


def test_resampled_input(engine):
    audio8k = speech_like(1.0, sr=8000, seed=5)
    results = engine.transcribe(audio8k, 8000, language="en")
    assert len(results) == 1


def test_long_audio_segmentation(engine):
    """Audio beyond 30s is split at low-energy boundaries."""
    clip = speech_like(2.0, seed=6)
    gap = np.zeros(8000, dtype=np.float32)
    long_audio = np.concatenate([clip, gap] * 14)  # 35s
    results = engine.transcribe(long_audio, 16000, language="en")
    assert len(results) >= 2
    assert results[0].start_time == 0.0
    assert results[-1].end_time == pytest.approx(len(long_audio) / 16000, abs=0.01)
    # segments are contiguous
    for a, b in zip(results, results[1:]):
        assert a.end_time == pytest.approx(b.start_time, abs=0.01)


def test_long_audio_batched_matches_serial(engine, monkeypatch):
    """The long-form path batches same-bucket segments into shared
    dispatches (engine._run_segments_batched); per segment the output
    must match the serial batch-1 path (ASR_LONG_FORM_BATCH=1) exactly —
    rows are independent in the fused executable."""
    clip = speech_like(2.0, seed=11)
    gap = np.zeros(8000, dtype=np.float32)
    long_audio = np.concatenate([clip, gap] * 26)  # 65s -> 3 segments
    monkeypatch.setenv("ASR_LONG_FORM_BATCH", "1")
    serial = engine.transcribe(long_audio, 16000, language="en")
    monkeypatch.setenv("ASR_LONG_FORM_BATCH", "8")
    batched = engine.transcribe(long_audio, 16000, language="en")
    assert len(serial) == len(batched) >= 2
    for s, b in zip(serial, batched):
        assert s.text == b.text
        assert s.token_ids == b.token_ids
        assert s.start_time == b.start_time and s.end_time == b.end_time


def test_split_cuts_land_in_silence():
    """The segmenter must cut inside a silence valley, not mid-speech
    (VERDICT r1: boundary cuts could bisect words with no test)."""
    from qwen3_asr_tpu.runtime.engine import TranscriptionEngine
    sr = 16000
    # 34 s: speech everywhere except a 1 s silence at t=27.5 s — the only
    # quiet region inside the split's 5 s search window before the 30 s cap.
    speech = speech_like(34.0, seed=20)
    silence_lo, silence_hi = int(27.5 * sr), int(28.5 * sr)
    speech[silence_lo:silence_hi] = 0.0
    segments = TranscriptionEngine._split_long_audio(speech, 30 * sr)
    assert len(segments) == 2
    cut = segments[1][0]
    assert silence_lo <= cut <= silence_hi, f"cut at {cut/sr:.2f}s"
    # segments tile the input exactly — no samples lost or duplicated
    rebuilt = np.concatenate([seg for _, seg in segments])
    np.testing.assert_array_equal(rebuilt, speech)


def test_split_no_silence_uses_min_energy_frame():
    """With no true silence, the cut still lands on the lowest-energy
    frame of the search window."""
    from qwen3_asr_tpu.runtime.engine import TranscriptionEngine
    sr = 16000
    audio = speech_like(33.0, seed=21)
    # quietest region: scale a 200 ms patch at t=26 s way down
    lo, hi = int(26.0 * sr), int(26.2 * sr)
    audio[lo:hi] *= 0.01
    segments = TranscriptionEngine._split_long_audio(audio, 30 * sr)
    assert len(segments) == 2
    assert lo <= segments[1][0] <= hi


def test_int16_input_matches_float(engine):
    """s16 PCM rides through in wire format (converted on device) and must
    transcribe identically to the pre-scaled float input."""
    pcm = (speech_like(1.0, seed=30) * 32767).astype(np.int16)
    as_float = pcm.astype(np.float32) / 32768.0
    ri = engine.transcribe(pcm, 16000, language="en")
    rf = engine.transcribe(as_float, 16000, language="en")
    assert ri[0].text == rf[0].text

    bi = engine.transcribe_batch([(pcm, 16000)] * 2, language="en")
    assert [r.text for r in bi] == [ri[0].text] * 2


def test_mixed_dtype_batch_rescales(engine):
    """int16 clips in a float batch must be rescaled, not blown up."""
    pcm = (speech_like(0.7, seed=31) * 32767).astype(np.int16)
    flt = pcm.astype(np.float32) / 32768.0
    mixed = engine.transcribe_batch([(pcm, 16000), (flt, 16000)],
                                    language="en")
    assert mixed[0].text == mixed[1].text


def test_timestamps(engine):
    results = engine.transcribe(speech_like(1.0, seed=7), 16000,
                                language="en", return_timestamps=True)
    r = results[0]
    if r.text:
        assert r.timestamps
        for ts in r.timestamps:
            assert r.start_time <= ts["start"] <= ts["end"] <= r.end_time + 1e-6


def test_batch_same_results(engine):
    clips = [(speech_like(0.7, seed=s), 16000) for s in (10, 11, 12)]
    batch = engine.transcribe_batch(clips, language="en")
    solo = [engine.transcribe(c, sr, language="en")[0] for c, sr in clips]
    assert [r.text for r in batch] == [r.text for r in solo]


def test_bucket_frames_chunk_aligned(engine):
    chunk = engine._chunk_frames
    for sec in AUDIO_BUCKETS_S:
        frames, _ = engine.bucket_frames(int(sec * 16000))
        assert frames % chunk == 0


def test_max_new_tokens_budget():
    assert max_new_tokens_for(6) == 64
    assert max_new_tokens_for(30) == 256


def test_warmup_covers_resume_and_batches(engine, monkeypatch):
    monkeypatch.setenv("ASR_WARMUP_BATCH_SHAPES", "2")
    engine._generate_fns.clear()
    engine.warmup(buckets=[1.0])
    keys = set(engine._generate_fns)
    assert any(isinstance(k[0], int) for k in keys)        # plain fn
    assert any(k[0] == "resume" for k in keys)             # resume fn


def test_warmup_covers_tick_batch_shapes(engine, monkeypatch):
    """ASR_WS_TICK_BATCH=true warms the cross-session batched resume
    executables so a live tick group never pays a first compile."""
    monkeypatch.setenv("ASR_WS_TICK_BATCH", "true")
    monkeypatch.setenv("ASR_WS_TICK_MAX_BATCH", "4")
    monkeypatch.setenv("WS_WINDOW_MAX_S", "1.0")
    engine._generate_fns.clear()
    engine.warmup(buckets=[1.0])
    assert any(k[0] == "resume_batch" for k in engine._generate_fns)


def test_bucket_budget_matches_rounded_coverage(engine):
    """Chunk-rounding can make a bucket physically larger than its nominal
    label; the returned seconds (and thus the decode token budget) must
    reflect the ROUNDED coverage, or clips near the boundary get silently
    truncated mid-transcript."""
    for dur in (0.5, 1.0, 2.0, 4.0, 9.5, 31.0):
        frames, eff_s = engine.bucket_frames(int(dur * 16000))
        assert eff_s == frames / 100.0
        assert frames * 160 >= min(int(dur * 16000),
                                   frames * 160)  # covers the clip
        if dur <= 30.0:
            assert int(dur * 100) <= frames


def test_transcribe_batch_rejects_oversize_clips(engine):
    """transcribe_batch must refuse clips past MAX_SEGMENT_S rather than
    silently truncating to the largest bucket while reporting an end_time
    that claims full coverage (transcribe() handles long audio by
    silence-boundary segmentation)."""
    import pytest as _pytest

    from qwen3_asr_tpu.runtime.engine import MAX_SEGMENT_S
    long_audio = np.zeros(int((MAX_SEGMENT_S + 2) * 16000), np.float32)
    with _pytest.raises(ValueError, match="MAX_SEGMENT_S"):
        engine.transcribe_batch([(long_audio, 16000)], language="en")
