"""Forced-aligner engine tests (DTW alignment on the tiny checkpoint)."""
import numpy as np
import pytest

from tests.fixtures import write_tiny_checkpoint
from tests.util_audio import speech_like


@pytest.fixture(scope="module")
def aligner(tmp_path_factory):
    from qwen3_asr_tpu.sidecars.aligner import AlignerEngine
    path = str(tmp_path_factory.mktemp("ckpt") / "tiny")
    write_tiny_checkpoint(path)
    return AlignerEngine.load(path)


def test_align_monotonic_nonoverlapping(aligner):
    audio = speech_like(2.0, seed=0)
    words = aligner.align(audio, 16000, "hello world this is a test", "en")
    assert len(words) == 6
    for w in words:
        assert 0.0 <= w.start <= w.end <= 2.0 + 1e-6
    for a, b in zip(words, words[1:]):
        assert b.start >= a.end - 1e-6  # monotonic, non-overlapping


def test_align_empty_inputs(aligner):
    assert aligner.align(np.zeros(0, np.float32), 16000, "text", "en") == []
    assert aligner.align(speech_like(1.0), 16000, "", "en") == []


def test_align_resamples(aligner):
    audio8k = speech_like(1.0, sr=8000, seed=1)
    words = aligner.align(audio8k, 8000, "one two three", "en")
    assert len(words) == 3
    assert words[-1].end <= 1.0 + 0.1


def test_align_cjk_tokens(aligner):
    words = aligner.align(speech_like(1.0, seed=2), 16000, "你好世界", "zh")
    assert len(words) == 4  # char-level CJK tokens


def test_monotonic_align_dp():
    from qwen3_asr_tpu.sidecars.aligner import _monotonic_align
    # diagonal similarity → identity-ish path
    sim = np.eye(4, 8, dtype=np.float32)
    path = _monotonic_align(sim)
    assert list(path) == [0, 1, 2, 3]
    # non-decreasing always
    rng = np.random.default_rng(0)
    sim = rng.standard_normal((6, 20)).astype(np.float32)
    path = _monotonic_align(sim)
    assert all(b >= a for a, b in zip(path, path[1:]))


def test_subtitle_accurate_mode_with_aligner(tmp_path, monkeypatch):
    """accurate-mode SRT works end-to-end when FORCED_ALIGNER_ID resolves."""
    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    from qwen3_asr_tpu.sidecars import subtitle as sub
    monkeypatch.setattr(sub, "FORCED_ALIGNER_ID", ckpt)
    sub.unload_aligner()
    sub.load_aligner()
    try:
        audio = speech_like(3.0, seed=3)

        class R:
            text = "hello world. this is a longer test sentence."
            language = "en"

        srt = sub.generate_srt_from_results([R()], audio, 16000,
                                            mode="accurate")
        assert "-->" in srt
        assert "hello" in srt
    finally:
        sub.unload_aligner()
