"""WER/CER metric tests (reference E2Etest/test_accuracy.py:19-81 semantics)."""
from qwen3_asr_tpu.utils.metrics import cer, wer


def test_wer_perfect():
    assert wer("hello world", "hello world") == 0.0


def test_wer_case_and_punct_insensitive():
    assert wer("Hello, world!", "hello world") == 0.0


def test_wer_substitution():
    assert wer("the cat sat", "the dog sat") == 1 / 3


def test_wer_insertion_deletion():
    assert wer("a b c", "a b") == 1 / 3
    assert wer("a b", "a b c") == 1 / 2


def test_wer_empty_reference():
    assert wer("", "") == 0.0
    assert wer("", "something") == 1.0


def test_cer_chinese():
    assert cer("你好世界", "你好世界") == 0.0
    assert cer("你好世界", "你好地球") == 0.5


def test_cer_nfkc_normalization():
    # full-width vs half-width must normalize equal
    assert cer("ＡＢＣ", "abc") == 0.0


def test_cer_ignores_spaces():
    assert cer("a b c", "abc") == 0.0
