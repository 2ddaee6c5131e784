"""Subtitle engine unit tests (coverage model: reference src/subtitle_test.py)."""
import numpy as np
import pytest

from qwen3_asr_tpu.sidecars.subtitle import (
    SubtitleEvent,
    WordTimestamp,
    _format_timestamp,
    _is_cjk,
    _tokenize,
    _two_line_layout,
    enforce_timing,
    estimate_word_timestamps,
    format_srt,
    generate_srt_from_results,
    segment_subtitles,
)


# ── timestamp formatting ─────────────────────────────────────────────────────

def test_format_timestamp_basic():
    assert _format_timestamp(0.0) == "00:00:00,000"
    assert _format_timestamp(1.5) == "00:00:01,500"
    assert _format_timestamp(61.25) == "00:01:01,250"
    assert _format_timestamp(3661.001) == "01:01:01,001"


def test_format_timestamp_ms_rounding_carry():
    # 0.9996 must carry into the seconds field, never print ",1000"
    assert _format_timestamp(0.9996) == "00:00:01,000"
    assert _format_timestamp(59.9996) == "00:01:00,000"


def test_format_srt_structure():
    events = [SubtitleEvent(1, 0.0, 1.0, "hello"),
              SubtitleEvent(2, 1.5, 3.0, "world\ntwo lines")]
    srt = format_srt(events)
    blocks = srt.strip().split("\n\n")
    assert len(blocks) == 2
    assert blocks[0].splitlines() == ["1", "00:00:00,000 --> 00:00:01,000",
                                      "hello"]
    assert blocks[1].splitlines()[0] == "2"


# ── tokenization ─────────────────────────────────────────────────────────────

def test_tokenize_english():
    assert _tokenize("hello big world") == ["hello", "big", "world"]


def test_tokenize_cjk_char_level():
    assert _tokenize("你好世界") == ["你", "好", "世", "界"]


def test_tokenize_mixed_cjk_latin():
    toks = _tokenize("我用 python 写代码")
    assert "python" in toks
    assert "我" in toks and "码" in toks


def test_tokenize_empty():
    assert _tokenize("") == []
    assert _tokenize("   ") == []


def test_is_cjk():
    assert _is_cjk("中文")
    assert _is_cjk("mixed 中 text")
    assert not _is_cjk("pure english")


# ── segmentation ─────────────────────────────────────────────────────────────

def _words(specs):
    return [WordTimestamp(t, s, e) for t, s, e in specs]


def test_segment_sentence_break():
    words = _words([("hello", 0.0, 0.4), ("world.", 0.5, 0.9),
                    ("next", 1.0, 1.4), ("bit", 1.5, 1.9)])
    events = segment_subtitles(words)
    assert len(events) == 2
    assert events[0].text == "hello world."
    assert events[1].text == "next bit"


def test_segment_pause_break():
    words = _words([("one", 0.0, 0.4), ("two", 1.2, 1.6)])  # 0.8s gap > 0.5
    events = segment_subtitles(words)
    assert len(events) == 2


def test_segment_char_limit():
    long_words = _words([(f"word{i:02d}xxxx", i * 0.3, i * 0.3 + 0.2)
                         for i in range(12)])  # 10 chars each > 84 total
    events = segment_subtitles(long_words, max_line_chars=42)
    assert len(events) >= 2
    for e in events:
        # each caption holds at most 2×42 chars (+1 joiner tolerance)
        assert len(e.text.replace("\n", " ")) <= 42 * 2 + 1


def test_segment_duration_limit():
    words = _words([(f"w{i}", i * 1.0, i * 1.0 + 0.9) for i in range(10)])
    events = segment_subtitles(words, max_duration=3.0, pause_threshold=1.5)
    assert len(events) >= 2


def test_segment_empty():
    assert segment_subtitles([]) == []


def test_segment_indices_sequential():
    words = _words([("a.", 0, 0.5), ("b.", 1, 1.4), ("c.", 2, 2.4)])
    events = segment_subtitles(words)
    assert [e.index for e in events] == [1, 2, 3]


def test_cjk_join_without_spaces():
    words = _words([("你", 0.0, 0.2), ("好", 0.2, 0.4)])
    events = segment_subtitles(words)
    assert events[0].text == "你好"


# ── two-line layout ──────────────────────────────────────────────────────────

def test_two_line_short_unchanged():
    assert _two_line_layout("short text", 42) == "short text"


def test_two_line_break_at_clause():
    text = "first clause here, second clause follows after"
    out = _two_line_layout(text, 30)
    lines = out.split("\n")
    assert len(lines) == 2
    assert lines[0].endswith(",")


def test_two_line_break_before_conjunction():
    text = "the quick brown fox runs and the dog sleeps here"
    out = _two_line_layout(text, 30)
    lines = out.split("\n")
    assert len(lines) == 2
    assert lines[1].startswith("and ")


def test_two_line_single_word_unchanged():
    w = "x" * 60
    assert _two_line_layout(w, 42) == w


# ── timing enforcement ───────────────────────────────────────────────────────

def test_enforce_min_duration():
    events = [SubtitleEvent(1, 0.0, 0.2, "quick")]
    out = enforce_timing(events)
    assert out[0].end - out[0].start >= 0.833


def test_enforce_gap_and_overlap():
    events = [SubtitleEvent(1, 0.0, 2.5, "a"), SubtitleEvent(2, 2.0, 4.0, "b")]
    out = enforce_timing(events)
    assert out[0].end <= out[1].start - 0.083 + 1e-9 or \
        out[0].end - out[0].start == pytest.approx(0.833, abs=1e-6)


def test_enforce_negative_duration_fixed():
    events = [SubtitleEvent(1, 1.0, 0.5, "backwards")]
    out = enforce_timing(events)
    assert out[0].end > out[0].start


def test_enforce_tightly_packed():
    events = [SubtitleEvent(i + 1, i * 0.3, i * 0.3 + 0.25, f"w{i}")
              for i in range(4)]
    out = enforce_timing(events)
    for e in out:
        assert e.end - e.start >= 0.833 - 1e-9


def test_enforce_preserves_input():
    events = [SubtitleEvent(1, 0.0, 0.1, "x")]
    enforce_timing(events)
    assert events[0].end == 0.1  # input not mutated


# ── fast estimates ───────────────────────────────────────────────────────────

def test_estimate_proportional():
    words = estimate_word_timestamps("hi there friend", 0.0, 3.0)
    assert len(words) == 3
    assert words[0].start == 0.0
    assert words[-1].end == pytest.approx(3.0)
    # longer word → longer span
    assert (words[1].end - words[1].start) > (words[0].end - words[0].start)


def test_estimate_empty():
    assert estimate_word_timestamps("", 0, 1) == []
    assert estimate_word_timestamps("   ", 0, 1) == []


# ── orchestrator ─────────────────────────────────────────────────────────────

class _Result:
    def __init__(self, text, language="en"):
        self.text = text
        self.language = language


def test_generate_srt_fast_mode():
    audio = np.zeros(16000 * 4, dtype=np.float32)
    results = [_Result("hello world. this is a test.")]
    srt = generate_srt_from_results(results, audio, 16000, mode="fast")
    assert "-->" in srt
    assert "hello world." in srt


def test_generate_srt_empty_results():
    audio = np.zeros(16000, dtype=np.float32)
    assert generate_srt_from_results([], audio, 16000, mode="fast") == ""
    assert generate_srt_from_results([_Result("")], audio, 16000,
                                     mode="fast") == ""


def test_generate_srt_accurate_requires_aligner():
    audio = np.zeros(16000, dtype=np.float32)
    with pytest.raises(RuntimeError, match="ForcedAligner not loaded"):
        generate_srt_from_results([_Result("text")], audio, 16000,
                                  mode="accurate")


def test_generate_srt_multiple_results_joined():
    audio = np.zeros(16000 * 6, dtype=np.float32)
    results = [_Result("first segment."), _Result("second segment.")]
    srt = generate_srt_from_results(results, audio, 16000, mode="fast")
    assert "first segment." in srt and "second segment." in srt
